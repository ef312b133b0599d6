package graft

/** The spark-submit entry point end-to-end (master comes from the
  * session already running in tests, exactly as spark-submit would
  * provide it): corpus parquet -> resumable pipeline -> graph tables. */
class MainSpec extends SparkSpec {
  test("graft.Main runs corpus -> resumable triples -> graph tables") {
    val tmp = java.nio.file.Files.createTempDirectory("main").toString
    graft.extract.Extract.corpus(spark, 80)
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    Main.main(Array(s"$tmp/corpus", s"$tmp/work", "8", "snapA"))
    val triples = graft.sources.GraphTables.read(spark, s"$tmp/work/graph")
    val before = triples.count()
    assert(before > 0)
    // idempotent restart: nothing recomputes, output unchanged
    Main.main(Array(s"$tmp/corpus", s"$tmp/work", "8", "snapA"))
    assert(graft.sources.GraphTables.read(spark, s"$tmp/work/graph")
      .count() == before)
    assert(graft.sources.GraphTables.latestSnapshot(spark, s"$tmp/work/graph")
      .contains("snapA"))
  }
}

import graft.manifest.ResumablePipeline
import graft.sources.GraphTables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg-layout graph sink + resumable end-to-end pipeline. */
class GraphSinkSpec extends SparkSpec {

  test("graph tables: partition pruning on pred, bucket co-location") {
    val tmp = Files.createTempDirectory("graph").toString
    val st = Pipeline.run(spark, 100)
    GraphTables.write(st.triples, tmp, "snap-1")
    val calls = GraphTables.read(spark, tmp).filter(col("pred") === "calls")
    // partition pruning: the pred filter must appear as a partition
    // filter, not a data filter
    calls.collect()
    val p = calls.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(pred"), p.take(1200))
    // round trip + snapshot manifest
    assert(GraphTables.read(spark, tmp).drop("bucket").count() ==
      st.triples.count())
    assert(GraphTables.latestSnapshot(spark, tmp).contains("snap-1"))
    // bucket column co-locates subjects
    val bad = GraphTables.read(spark, tmp)
      .filter(col("bucket") =!= GraphTables.bucketCol(col("subj"))).count()
    assert(bad == 0)
  }

  test("publish is snapshot-isolated: no stale partitions, old snapshot intact") {
    val tmp = Files.createTempDirectory("graphow").toString
    val st = Pipeline.run(spark, 100)
    GraphTables.write(st.triples, tmp, "snap-1")
    val imports1 = GraphTables.read(spark, tmp)
      .filter(col("pred") === "imports").count()
    assert(imports1 > 0)
    // leak the conf the way a buggy caller would, then publish a new
    // snapshot with a whole predicate missing
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      GraphTables.write(st.triples.filter(col("pred") =!= "imports"),
        tmp, "snap-2")
      val left = GraphTables.read(spark, tmp)
        .filter(col("pred") === "imports").count()
      assert(left == 0,
        s"stale imports partition leaked into the new snapshot: $left rows")
      // the PREVIOUS snapshot is untouched (time travel) — the publish
      // never destroys committed data before the new commit lands
      assert(GraphTables.readSnapshot(spark, tmp, "snap-1")
        .filter(col("pred") === "imports").count() == imports1)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("publishing an EMPTY triple set commits rowCount=0 and stays readable") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graphempty").toString
    val none = Seq.empty[(String, String, String, String, Double)]
      .toDF("subj", "pred", "obj", "docId", "score")
    // round-2 crash mode: 0-row partitioned write -> no data files ->
    // read-back schema inference failed inside write()
    val (n, h) = GraphTables.write(none, tmp, "snap-empty")
    assert(n == 0L && h.nonEmpty)
    assert(GraphTables.latestSnapshot(spark, tmp).contains("snap-empty"))
    assert(GraphTables.read(spark, tmp).count() == 0)
    // a later non-empty publish proceeds normally on the same table
    val st = Pipeline.run(spark, 20)
    val (n2, _) = GraphTables.write(st.triples, tmp, "snap-1")
    assert(n2 > 0 && GraphTables.read(spark, tmp).count() == n2)
  }

  test("entity point-lookup prunes to a single pred+bucket partition") {
    val tmp = Files.createTempDirectory("graphlk").toString
    val st = Pipeline.run(spark, 100)
    GraphTables.write(st.triples, tmp, "snap-1")
    val subj = st.triples.filter(col("pred") === "calls")
      .select("subj").head().getString(0)
    val edges = GraphTables.entityEdges(spark, tmp, "calls", subj)
    edges.collect()
    val p = edges.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(pred"), p.take(1200))
    assert(p.contains("(bucket"), "bucket must be a partition filter:\n" +
      p.take(1200))
    // pruned lookup == unpruned filter
    val want = GraphTables.read(spark, tmp)
      .filter(col("pred") === "calls" && col("subj") === subj).count()
    assert(edges.count() == want && want > 0)
  }

  test("expireSnapshots: orphans + superseded go, keepLast time travel intact") {
    val tmp = Files.createTempDirectory("graphgc").toString
    // a consumer polling a FRESH table (no manifest yet) gets the
    // contract's "not committed" failure, not a parquet PATH_NOT_FOUND
    intercept[IllegalStateException] {
      GraphTables.readSnapshot(spark, tmp, "snap-1")
    }
    val st = Pipeline.run(spark, 60)
    GraphTables.write(st.triples.filter(col("pred") === "calls"), tmp, "snap-1")
    GraphTables.write(st.triples, tmp, "snap-2")
    GraphTables.write(st.triples.filter(col("pred") =!= "imports"), tmp, "snap-3")
    val n2 = GraphTables.readSnapshot(spark, tmp, "snap-2").count()
    val n3 = GraphTables.readSnapshot(spark, tmp, "snap-3").count()
    // a crashed publish: data written, manifest append never happened
    val orphanDir = new java.io.File(s"$tmp/data/snap=crashed")
    st.triples.limit(5).write.parquet(orphanDir.toString)
    // age it past the orphan safety window
    assert(orphanDir.setLastModified(
      System.currentTimeMillis() - 7L * 3600 * 1000))
    // and a FRESH orphan (possibly an in-flight publish): must survive
    st.triples.limit(5).write.parquet(s"$tmp/data/snap=inflight")
    val removed = GraphTables.expireSnapshots(spark, tmp, keepLast = 2)
    assert(removed.toSet == Set("snap-1", "crashed"), s"removed $removed")
    assert(new java.io.File(s"$tmp/data/snap=inflight").exists)
    // latest + within-keepLast time travel intact
    assert(GraphTables.latestSnapshot(spark, tmp).contains("snap-3"))
    assert(GraphTables.read(spark, tmp).count() == n3)
    assert(GraphTables.readSnapshot(spark, tmp, "snap-2").count() == n2)
    // an EXPIRED committed snapshot fails loudly — never a silent
    // empty frame for data that existed (the round-3 ADVICE mode)
    intercept[IllegalStateException] {
      GraphTables.readSnapshot(spark, tmp, "snap-1")
    }
    // an id with no manifest row at all fails too
    intercept[IllegalStateException] {
      GraphTables.readSnapshot(spark, tmp, "no-such-snap")
    }
    // keepLast clamps to 1: the latest committed snapshot never goes
    val removed2 = GraphTables.expireSnapshots(spark, tmp, keepLast = 0)
    assert(removed2 == Seq("snap-2"))
    assert(GraphTables.read(spark, tmp).count() == n3)
  }

  test("pruneManifest: lineage window matches expireSnapshots, latest intact") {
    val tmp = Files.createTempDirectory("graphprune").toString
    // no manifest yet: a no-op, not a crash
    assert(GraphTables.pruneManifest(spark, tmp, 2).isEmpty)
    val st = Pipeline.run(spark, 40)
    GraphTables.write(st.triples.filter(col("pred") === "calls"), tmp, "pr-1")
    GraphTables.write(st.triples, tmp, "pr-2")
    GraphTables.write(st.triples.limit(10), tmp, "pr-3")
    GraphTables.write(st.triples.limit(3), tmp, "pr-4")
    val n3 = GraphTables.readSnapshot(spark, tmp, "pr-3").count()
    val n4 = GraphTables.readSnapshot(spark, tmp, "pr-4").count()
    // expire first, then prune the manifest to the SAME window — the
    // documented pairing (prune alone leaves readable-but-invisible
    // data dirs behind for the next GC's orphan sweep)
    GraphTables.expireSnapshots(spark, tmp, keepLast = 2)
    val pruned = GraphTables.pruneManifest(spark, tmp, 2)
    assert(pruned.toSet == Set("pr-1", "pr-2"), s"pruned $pruned")
    // the kept window resolves exactly as before
    assert(GraphTables.latestSnapshot(spark, tmp).contains("pr-4"))
    assert(GraphTables.read(spark, tmp).count() == n4)
    assert(GraphTables.readSnapshot(spark, tmp, "pr-3").count() == n3)
    // a pruned id (data expired, manifest row gone) now fails as
    // "not committed" — loudly, never an empty frame
    intercept[IllegalStateException] {
      GraphTables.readSnapshot(spark, tmp, "pr-1")
    }
    // nothing to prune on a second pass; publish-after-prune works
    assert(GraphTables.pruneManifest(spark, tmp, 2).isEmpty)
    GraphTables.write(st.triples.limit(1), tmp, "pr-5")
    assert(GraphTables.latestSnapshot(spark, tmp).contains("pr-5"))
    assert(GraphTables.read(spark, tmp).count() == 1L)
  }

  test("overlay snapshots: delta-only write, chain-resolved read, exact derived hash, chain-safe GC") {
    import spark.implicits._
    import graft.sources.ContentHash
    val tmp = Files.createTempDirectory("graphovl").toString
    val HashCols = Seq("subj", "pred", "obj", "docId")
    def rows(ts: (String, String, String)*) =
      ts.map { case (s, o, d) => (s, "calls", o, d, 1.0) }
        .toDF("subj", "pred", "obj", "docId", "score")
    def tset(id: String) = GraphTables.readSnapshot(spark, tmp, id)
      .select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    def manifestRow(id: String) = spark.read.parquet(s"$tmp/manifest")
      .filter(col("snapshotId") === id)
      .orderBy(col("committedAt").desc).select("rowCount", "contentHash")
      .head() match { case r => (r.getLong(0), r.getString(1)) }
    // the invariant every overlay must preserve: the manifest row
    // DERIVED by xor algebra equals a from-scratch fingerprint of the
    // chain-resolved content
    def assertExactManifest(id: String): Unit = {
      val want = ContentHash.hex(
        GraphTables.readSnapshot(spark, tmp, id), HashCols)
      assert(manifestRow(id) == want, s"derived manifest of $id drifted")
    }

    // full base A: d1 (2 rows), d2 (1), d3 (1)
    val base = rows(("a", "x", "d1"), ("a", "y", "d1"), ("b", "x", "d2"),
      ("c", "z", "d3"))
    val (nA, _) = GraphTables.write(base, tmp, "ov-A")
    assert(nA == 4)

    // overlay B: re-emit d2 with new content, add doc d4 — writes ONLY
    // those docs' rows; removal stats describe d2's base rows (what the
    // publish state supplies from per-doc fingerprints)
    val (remN, remH) = ContentHash.xorLong(
      base.filter(col("docId").isin("d2", "d4")), HashCols)
    val (nB, hB) = GraphTables.writeDelta(spark, tmp, "ov-B", "ov-A",
      rows(("b", "w", "d2"), ("e", "q", "d4"), ("e", "r", "d4")),
      Seq("d2", "d4").toDF("docId"), remN, remH)
    assert(nB == 6)
    assert(GraphTables.baseOf(spark, tmp, "ov-B").contains("ov-A"))
    assert(GraphTables.chainDepth(spark, tmp, "ov-B") == 1)
    assert(GraphTables.readOwnData(spark, tmp, "ov-B").count() == 3,
      "an overlay must hold only the re-emitted docs' rows")
    assert(tset("ov-B") == rows(("a", "x", "d1"), ("a", "y", "d1"),
      ("b", "w", "d2"), ("c", "z", "d3"), ("e", "q", "d4"),
      ("e", "r", "d4")).select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet)
    assertExactManifest("ov-B")
    assert((nB, hB) == manifestRow("ov-B"))
    // the latest-resolving read sees the overlay transparently
    assert(GraphTables.read(spark, tmp).count() == nB)
    // entity point-lookup through a chain still answers exactly
    assert(GraphTables.entityEdges(spark, tmp, "calls", "e").count() == 2)

    // pointer overlay C (empty delta): zero rows written, identical row
    val (nC, hC) = GraphTables.writeDelta(spark, tmp, "ov-C", "ov-B",
      base.limit(0), base.select(col("docId")).limit(0), 0L, 0L)
    assert((nC, hC) == ((nB, hB)))
    assert(GraphTables.readOwnData(spark, tmp, "ov-C").count() == 0)
    assert(GraphTables.chainDepth(spark, tmp, "ov-C") == 2)
    assert(tset("ov-C") == tset("ov-B"))

    // removal-only overlay D: d3's content now yields no triples
    val (r3n, r3h) = ContentHash.xorLong(
      base.filter(col("docId") === "d3"), HashCols)
    val (nD, _) = GraphTables.writeDelta(spark, tmp, "ov-D", "ov-C",
      base.limit(0), Seq("d3").toDF("docId"), r3n, r3h)
    assert(nD == 5 && GraphTables.chainDepth(spark, tmp, "ov-D") == 3)
    assert(!tset("ov-D").exists(_.contains("d3")))
    assertExactManifest("ov-D")

    // chain-safe GC: keepLast=1 keeps D plus its WHOLE base chain
    assert(GraphTables.expireSnapshots(spark, tmp, keepLast = 1).isEmpty)
    assert(GraphTables.pruneManifest(spark, tmp, 1).isEmpty)
    assert(tset("ov-D").size == 5)

    // an overlay on an uncommitted base fails loudly
    intercept[IllegalStateException] {
      GraphTables.writeDelta(spark, tmp, "ov-X", "no-such-base",
        base.limit(0), base.select(col("docId")).limit(0), 0L, 0L)
    }

    // compaction flattens D in place: same content, same manifest row,
    // no more base — and the chain becomes collectible
    val before = tset("ov-D"); val row = manifestRow("ov-D")
    assert(GraphTables.compactSnapshot(spark, tmp, "ov-D"))
    assert(GraphTables.baseOf(spark, tmp, "ov-D").isEmpty)
    assert(tset("ov-D") == before && manifestRow("ov-D") == row)
    assertExactManifest("ov-D")
    assert(!GraphTables.compactSnapshot(spark, tmp, "ov-D"),
      "compacting a full snapshot must be a no-op")
    assert(GraphTables.expireSnapshots(spark, tmp, keepLast = 1).toSet ==
      Set("ov-A", "ov-B", "ov-C"))
    assert(GraphTables.pruneManifest(spark, tmp, 1).toSet ==
      Set("ov-A", "ov-B", "ov-C"))
    assert(tset("ov-D").size == 5)
    assert(GraphTables.read(spark, tmp).count() == 5)
  }

  test("overlay publish retry is idempotent; impossible removal stats fail loudly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graphovlretry").toString
    def rows(ts: (String, String, String)*) =
      ts.map { case (s, o, d) => (s, "calls", o, d, 1.0) }
        .toDF("subj", "pred", "obj", "docId", "score")
    GraphTables.write(rows(("a", "x", "d1"), ("b", "y", "d2")), tmp, "r-A")
    val (rN, rH) = graft.sources.ContentHash.xorLong(
      rows(("b", "y", "d2")), Seq("subj", "pred", "obj", "docId"))
    def pub() = GraphTables.writeDelta(spark, tmp, "r-B", "r-A",
      rows(("b", "z", "d2")), Seq("d2").toDF("docId"), rN, rH)
    val first = pub()
    // a crash-retry republish of the SAME overlay id replaces the
    // overlay wholesale and derives the identical manifest row
    val second = pub()
    assert(first == second)
    assert(GraphTables.readSnapshot(spark, tmp, "r-B").count() == 2)
    assert(graft.sources.ContentHash.hex(
      GraphTables.readSnapshot(spark, tmp, "r-B"),
      Seq("subj", "pred", "obj", "docId"))._2 == first._2)
    // removal stats that cannot describe the base (more rows removed
    // than it has) must fail the publish, not commit a negative count
    intercept[IllegalArgumentException] {
      GraphTables.writeDelta(spark, tmp, "r-X", "r-A",
        rows(), Seq("d1").toDF("docId"), 999L, 0L)
    }
    // the failed publish left no manifest row
    assert(!spark.read.parquet(s"$tmp/manifest")
      .filter(col("snapshotId") === "r-X").collect().nonEmpty)
  }

  test("maintainGraph: flatten + chain GC + state expiry + manifest prune, one pass") {
    import spark.implicits._
    import graft.sources.ContentHash
    val tmp = Files.createTempDirectory("graphmaint").toString
    val table = s"$tmp/graph"; val state = s"$tmp/state"
    def rows(ts: (String, String, String)*) =
      ts.map { case (s, o, d) => (s, "calls", o, d, 1.0) }
        .toDF("subj", "pred", "obj", "docId", "score")
    val base = rows(("a", "x", "d1"), ("b", "y", "d2"))
    GraphTables.write(base, table, "m-A")
    val (rN, rH) = ContentHash.xorLong(
      base.filter(col("docId") === "d2"), Seq("subj", "pred", "obj", "docId"))
    GraphTables.writeDelta(spark, table, "m-B", "m-A",
      rows(("b", "z", "d2")), Seq("d2").toDF("docId"), rN, rH)
    GraphTables.writeDelta(spark, table, "m-C", "m-B",
      rows(("c", "w", "d3")), Seq("d3").toDF("docId"), 0L, 0L)
    // per-snapshot state dirs as the publishes would leave them
    Seq("m-A", "m-B", "m-C").foreach { id =>
      Seq(0L).toDF("lastBatchId").write.parquet(s"$state/snap=$id/meta")
    }
    val want = GraphTables.readSnapshot(spark, table, "m-C")
      .select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    // without flatten, chain-safe GC rightly keeps the whole chain
    val m0 = graft.streaming.StreamingPipeline
      .maintainGraph(spark, table, state, keepLast = 1)
    assert(!m0.flattened && m0.expiredSnapshots.isEmpty &&
      m0.prunedManifest.isEmpty)
    assert(m0.expiredState.toSet == Set("m-A", "m-B"),
      s"state ${m0.expiredState}")
    // flattening frees the chain: one pass leaves exactly the latest,
    // full, exact, and alone — in data, manifest, and state
    val m1 = graft.streaming.StreamingPipeline
      .maintainGraph(spark, table, state, keepLast = 1, flatten = true)
    assert(m1.flattened)
    assert(m1.expiredSnapshots.toSet == Set("m-A", "m-B"))
    assert(m1.prunedManifest.toSet == Set("m-A", "m-B"))
    assert(GraphTables.baseOf(spark, table, "m-C").isEmpty)
    assert(GraphTables.latestSnapshot(spark, table).contains("m-C"))
    assert(GraphTables.readSnapshot(spark, table, "m-C")
      .select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
      == want)
    assert(new java.io.File(s"$state/snap=m-C").exists)
  }

  test("resumable pipeline: restart computes only missing buckets") {
    val tmp = Files.createTempDirectory("respipe").toString
    val corpus = s"$tmp/corpus"; val out = s"$tmp/out"; val man = s"$tmp/man"
    graft.extract.Extract.corpus(spark, 200)
      .write.mode("overwrite").parquet(corpus)
    val n1 = ResumablePipeline.run(spark, corpus, out, man, nBuckets = 8)
    assert(n1 == 8)
    val full = ResumablePipeline.readTriples(spark, out)
      .orderBy("subj", "pred", "obj", "docId").collect()
    // wipe half the buckets (data + manifest rows). localCheckpoint,
    // not cache: an evicted cached partition would recompute from the
    // directory deleted below
    val manDf = spark.read.parquet(man).filter(col("bucket") < 4)
      .localCheckpoint()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(man))
    manDf.write.parquet(man)
    (4 until 8).foreach { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$out/bucket=$b"))
    }
    val n2 = ResumablePipeline.run(spark, corpus, out, man, nBuckets = 8)
    assert(n2 == 4, s"recomputed $n2")
    // the resumable write must use a per-write option, never leak a
    // session-wide dynamic-overwrite conf to later writers
    assert(spark.conf
      .get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
    val resumed = ResumablePipeline.readTriples(spark, out)
      .orderBy("subj", "pred", "obj", "docId").collect()
    assert(resumed.sameElements(full))
    // equality with the non-resumable pipeline
    val direct = Pipeline.runFromTable(spark, corpus).triples
      .orderBy("subj", "pred", "obj", "docId").collect()
    assert(resumed.sameElements(direct))
    // fully committed -> no-op
    assert(ResumablePipeline.run(spark, corpus, out, man, nBuckets = 8) == 0)
  }
}
