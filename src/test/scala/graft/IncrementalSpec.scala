package graft

import graft.core.{CorpusGen, SourceFileHashed}
import graft.incremental.IncrementalPipeline
import org.apache.spark.sql.functions.col

/** Same (repo, path, commit, lang) as file `id`, content swapped with
  * file `contentId` — a deterministic "modification". Standalone object
  * so executor lambdas don't capture the (non-serializable) spec. */
object ModifiedFile {
  def apply(id: Long, contentId: Long): SourceFileHashed = {
    val base = CorpusGen.file(id).source
    val donor = CorpusGen.file(contentId).source
    base.copy(content = donor.content,
      sha256 = CorpusGen.sha256Hex(donor.content))
  }
}

/** Incremental snapshot processing must be EXACTLY a full recompute of
  * the new snapshot — under all three change kinds at once. */
class IncrementalSpec extends SparkSpec {

  test("incremental == full recompute under adds, modifications, removals") {
    import spark.implicits._
    // prev snapshot: files 0..199
    val prev = spark.range(0, 200).map(i => CorpusGen.file(i).source)
    // cur: remove 0..9, modify 10..29 (content of 10000+id), keep the
    // rest, add 200..249
    val cur = spark.range(30, 200).map(i => CorpusGen.file(i).source)
      .union(spark.range(10, 30).map(i => ModifiedFile(i, 10000 + i)))
      .union(spark.range(200, 250).map(i => CorpusGen.file(i).source))

    // change detection finds exactly the modified + added slice
    val changed = IncrementalPipeline.changedFiles(cur, prev)
    assert(changed.count() == 20 + 50)
    val stale = IncrementalPipeline.staleDocIds(cur, prev)
    assert(stale.count() == 10 + 20) // removed + modified

    val prevTriples = Pipeline.triplesFor(prev).localCheckpoint()
    val incr = IncrementalPipeline
      .incrementalTriples(prevTriples, prev, cur).localCheckpoint()
    val full = Pipeline.triplesFor(cur).localCheckpoint()
    assert(incr.count() == full.count())
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental result diverges from the full recompute")
  }

  test("change detection prunes scans to keys; small delta broadcasts back") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incr-plan").toString
    spark.range(0, 300).map(i => CorpusGen.file(i).source)
      .write.parquet(s"$tmp/prev")
    spark.range(0, 310).map(i => CorpusGen.file(i).source)
      .write.parquet(s"$tmp/cur")
    val prev = spark.read.parquet(s"$tmp/prev").as[SourceFileHashed]
    val cur = spark.read.parquet(s"$tmp/cur").as[SourceFileHashed]
    // the change-detection join reads ONLY the key columns: column
    // pruning must reach both parquet scans — content never enters it
    val keys = IncrementalPipeline.changedKeys(cur, prev)
    keys.collect()
    val kp = keys.queryExecution.executedPlan.toString
    assert(!kp.contains("content"),
      s"content inside the change-detection plan:\n${kp.take(2000)}")
    // fetching the changed files: AQE broadcasts the small delta, so
    // cur's wide content rows are never exchanged at all
    val changed = IncrementalPipeline.changedFiles(cur, prev)
    assert(changed.count() == 10)
    val cp = changed.queryExecution.executedPlan.toString
    assert(cp.contains("BroadcastHashJoin"), cp.take(2000))
    assert(!cp.contains("Exchange hashpartitioning"),
      s"content rows shuffled in the small-delta case:\n${cp.take(2000)}")
  }

  test("snapshot N -> N+1: incremental result publishes as the next graph snapshot") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incr-pub").toString
    val prev = spark.range(0, 80).map(i => CorpusGen.file(i).source)
    val cur = spark.range(0, 120).map(i => CorpusGen.file(i).source)
    val prevTriples = Pipeline.triplesFor(prev).localCheckpoint()
    graft.sources.GraphTables.write(prevTriples, s"$tmp/graph", "snapA")
    val incr = IncrementalPipeline
      .incrementalTriples(prevTriples, prev, cur).localCheckpoint()
    val (n, _) = graft.sources.GraphTables.write(incr, s"$tmp/graph", "snapB")
    assert(graft.sources.GraphTables.latestSnapshot(spark, s"$tmp/graph")
      .contains("snapB"))
    val published = graft.sources.GraphTables.read(spark, s"$tmp/graph")
      .drop("bucket")
    val full = Pipeline.triplesFor(cur)
    assert(n == full.count())
    assert(published.exceptAll(full.select(published.columns.map(col): _*))
      .isEmpty, "published snapshot diverges from full recompute")
  }

  test("an unchanged snapshot re-extracts nothing") {
    import spark.implicits._
    val files = spark.range(0, 50).map(i => CorpusGen.file(i).source)
    assert(IncrementalPipeline.changedFiles(files, files).isEmpty)
    assert(IncrementalPipeline.staleDocIds(files, files).isEmpty)
  }
}
