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

  test("AQE skew-join splits the hot key's partition at runtime") {
    // the north-star's runtime skew tool ("AQE for skewed shuffles"):
    // when a repo-level hot key DOES reach a shuffle join, AQE must
    // split its oversized partition instead of pinning one task.
    // Evidence: run a join where one key owns ~30% of the big side
    // under test-sized skew thresholds and assert the finalized plan
    // marks the join skew-handled.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import s2.implicits._
    val big = s2.range(0, 300000).select(
      when($"id" % 3 === 0, lit(0L)).otherwise($"id").as("k"),
      $"id".as("payload"))
    val dim = s2.range(0, 2000).select($"id".as("k"), $"id".as("attr"))
    val j = big.join(dim, "k")
    // execute THIS DataFrame's own QueryExecution (a count() would build
    // a separate aggregate plan and leave j's AQE plan un-finalized)
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true") || p.contains("skewed"),
      s"AQE did not mark the skewed join:\n${p.take(3000)}")
  }
}
