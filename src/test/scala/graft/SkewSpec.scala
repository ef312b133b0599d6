package graft

import org.apache.spark.sql.functions._

/** Skew handling (north rule: "partitioning / shuffle / skew handled
  * explicitly"): repo000 owns ~30% of files (CorpusGen.repoOf), but the
  * extract repartition keys on hash(repo, path) — per-FILE, not
  * per-repo — so no partition inherits the hot repo's bulk. */
class SkewSpec extends SparkSpec {

  test("hot repo (~30% of files) does not skew extract partitions") {
    import spark.implicits._
    val n = 10000
    val files = graft.extract.Extract.corpus(spark, n)
    // verify the skew exists in the data
    val hot = files.filter($"repo" === "repo000").count()
    assert(hot > n * 0.25 && hot < n * 0.35, s"hot repo has $hot files")
    // partition sizes after the extract stage's repartition
    val parts = 16
    val sizes = files.toDF()
      .repartition(parts, xxhash64($"repo", $"path"))
      .mapPartitions(it => Iterator(it.size))
      .collect().sorted
    val max = sizes.last.toDouble
    val median = sizes(sizes.length / 2).toDouble
    assert(max / median < 1.5,
      s"partition skew: max=$max median=$median sizes=${sizes.mkString(",")}")
  }
}
