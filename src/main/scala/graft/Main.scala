package graft

import graft.extract.Extract
import graft.manifest.ResumablePipeline
import graft.sources.GraphTables
import org.apache.spark.sql.SparkSession

/** spark-submit entry point (north-star: "launched via spark-submit on
  * a multi-executor cluster"):
  *
  * {{{
  * spark-submit --class graft.Main \
  *   --conf spark.sql.adaptive.enabled=true \
  *   --conf spark.sql.adaptive.skewJoin.enabled=true \
  *   target/scala-2.13/triaffinenestednerspark_2.13-0.1.0.jar \
  *   <corpusParquet> <workDir> [nBuckets] [snapshotId]
  * }}}
  *
  * Runs the resumable KG pipeline over the source-code table at
  * `corpusParquet` (exactly the input_hint shape): extraction is
  * committed per-bucket with lineage rows under `workDir/manifest`
  * (a killed job restarts at bucket granularity), and the final triple
  * set is published as partitioned+bucketed graph tables under
  * `workDir/graph`. Master/executor topology comes from spark-submit;
  * nothing here assumes local mode.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Main <corpusParquet> <workDir> [nBuckets] [snapshotId]")
    val corpus = args(0)
    val work = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val snapshotId = if (args.length > 3) args(3) else "snap-0"
    val spark = SparkSession.builder()
      .appName("graft-kg-construct")
      .getOrCreate()
    // stage 1 of the advertised contract: the per-row sha256 content
    // invariant is verified against the source table (throws on the
    // first tampered/corrupted row) BEFORE anything is extracted
    import spark.implicits._
    Extract.verifyIntegrity(
      spark.read.parquet(corpus).as[graft.core.SourceFileHashed])
    val computed = ResumablePipeline.run(spark, corpus,
      s"$work/triples", s"$work/manifest", nBuckets, snapshotId)
    val triples = ResumablePipeline.readTriples(spark, s"$work/triples")
    // write returns the published (rowCount, hash) — no third scan of
    // the triple table just to print the count
    val (nTriples, _) =
      GraphTables.write(triples, s"$work/graph", snapshotId)
    // the one intentional driver-side line: the job's summary
    println(s"""{"snapshotId":"$snapshotId","bucketsComputed":$computed,""" +
      s""""triples":$nTriples}""")
  }
}
