package graft

import graft.extract.Extract
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming parity + stateful ops, driven synchronously via the
  * memory sink (spark_guide local-smoke pattern). */
class StreamingSpec extends SparkSpec {

  test("streaming extract == batch extract on the same files") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-src").toString
    Extract.corpus(spark, 40).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema).parquet(tmp)
      .as[graft.core.SourceFileHashed]
    val q = StreamingPipeline.extractStream(stream).writeStream
      .outputMode("append").format("memory").queryName("ment")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ment")
      .select("docId", "sentId", "start", "end", "entType")
      .collect().map(_.toSeq).toSet
    val batch = Extract.mentions(Extract.sentences(Extract.corpus(spark, 40)))
      .select("docId", "sentId", "start", "end", "entType")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("two versions of one doc in a SINGLE micro-batch: exactly one survives") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-1batch").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
    Extract.corpus(spark, 10).write.mode("overwrite").parquet(src)
    // two NEW versions of file 0's doc; no maxFilesPerTrigger, so the
    // whole source (original + both re-ingests) lands in ONE batch and
    // the cross-batch (docId, batchId) last-writer-wins cannot help —
    // the ingest itself must keep a single version per doc
    val f0 = graft.core.CorpusGen.file(0).source
    def ver(commit: String, contentFrom: Long) = {
      val c = graft.core.CorpusGen.file(contentFrom).source.content
      graft.core.SourceFileHashed(f0.repo, f0.path, commit, f0.lang, c,
        graft.core.CorpusGen.sha256Hex(c))
    }
    val vA = ver("zzz-a", 91); val vB = ver("zzz-b", 92)
    Seq(vA, vB).toDS().write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingPipeline.triplesStream(
      spark.readStream.schema(schema).parquet(src)
        .as[graft.core.SourceFileHashed],
      out, man, s"$tmp/ckpt")
    q.processAllAvailable(); q.stop()
    val table = s"$tmp/graph"
    StreamingPipeline.publishSnapshot(spark, out, table, "s0")
    val pub = graft.sources.GraphTables.read(spark, table)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    // the deterministic survivor is max (commit, sha256) = "zzz-b"
    def batchOver(survivor: graft.core.SourceFileHashed) =
      Pipeline.triplesFor(
        Extract.corpus(spark, 10)
          .filter(f => !(f.repo == f0.repo && f.path == f0.path))
          .union(Seq(survivor).toDS()))
        .select("subj", "pred", "obj", "docId")
        .collect().map(_.toSeq).toSet
    val want = batchOver(vB)
    val loser = batchOver(vA)
    assert(pub == want,
      s"stale/missing: +${(pub -- want).take(3)} -${(want -- pub).take(3)}")
    // and the published set is NOT the union with the losing version
    val loserOnly = loser -- want
    assert(loserOnly.nonEmpty,
      "degenerate fixture: both versions yield identical facts")
    assert(pub.intersect(loserOnly).isEmpty,
      s"losing version's facts leaked into the publish: ${loserOnly.take(3)}")
  }

  test("a monotone ingestTs column overrides the lexicographic survivor") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-ts").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
    Extract.corpus(spark, 10).write.mode("overwrite").parquet(src)
    val f0 = graft.core.CorpusGen.file(0).source
    def ver(commit: String, contentFrom: Long) = {
      val c = graft.core.CorpusGen.file(contentFrom).source.content
      graft.core.SourceFileHashed(f0.repo, f0.path, commit, f0.lang, c,
        graft.core.CorpusGen.sha256Hex(c))
    }
    // the chronologically NEWER version has the lexicographically
    // SMALLER commit — exactly the case the bare (commit, sha256)
    // fallback gets wrong (the sibling test above pins that fallback)
    val older = ver("zzz-b", 92); val newer = ver("zzz-a", 91)
    Seq((older, 1000L), (newer, 2000L))
      .map { case (f, ts) =>
        (f.repo, f.path, f.commit, f.lang, f.content, f.sha256, ts) }
      .toDF("repo", "path", "commit", "lang", "content", "sha256",
        "ingestTs")
      .write.mode("append").parquet(src)
    // user-specified schema: the original corpus rows read ingestTs as
    // null and fall back to the lexicographic order among themselves
    val schema = org.apache.spark.sql.types.StructType(
      spark.read.parquet(src).schema.filterNot(_.name == "ingestTs")
        :+ org.apache.spark.sql.types.StructField("ingestTs",
          org.apache.spark.sql.types.LongType))
    val stream = spark.readStream.schema(schema).parquet(src)
      .as[graft.core.SourceFileHashed]
    // the opt-in validates loudly BEFORE any query starts: a typo'd
    // name and a lexicographically-ordering string epoch both fail
    val miss = intercept[IllegalArgumentException] {
      StreamingPipeline.triplesStream(stream, out, man, s"$tmp/ckptX",
        ingestTsCol = Some("ingest_time"))
    }
    assert(miss.getMessage.contains("not found"), miss.getMessage)
    val str = intercept[IllegalArgumentException] {
      StreamingPipeline.triplesStream(
        spark.readStream.schema(schema).parquet(src)
          .withColumn("tsStr", col("commit"))
          .as[graft.core.SourceFileHashed],
        out, man, s"$tmp/ckptY", ingestTsCol = Some("tsStr"))
    }
    assert(str.getMessage.contains("timestamp or numeric"), str.getMessage)
    val q = StreamingPipeline.triplesStream(
      stream, out, man, s"$tmp/ckpt", ingestTsCol = Some("ingestTs"))
    q.processAllAvailable(); q.stop()
    val table = s"$tmp/graph"
    StreamingPipeline.publishSnapshot(spark, out, table, "s0")
    val pub = graft.sources.GraphTables.read(spark, table)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    def batchOver(survivor: graft.core.SourceFileHashed) =
      Pipeline.triplesFor(
        Extract.corpus(spark, 10)
          .filter(f => !(f.repo == f0.repo && f.path == f0.path))
          .union(Seq(survivor).toDS()))
        .select("subj", "pred", "obj", "docId")
        .collect().map(_.toSeq).toSet
    val want = batchOver(newer)
    val stale = batchOver(older) -- want
    assert(stale.nonEmpty, "degenerate fixture: versions yield identical facts")
    assert(pub == want,
      s"ingestTs ignored: +${(pub -- want).take(3)} -${(want -- pub).take(3)}")
    assert(pub.intersect(stale).isEmpty,
      s"stale version's facts leaked past the ingestTs order: ${stale.take(3)}")
  }

  test("watermarked windowed aggregation over the events table") {
    val tmp = Files.createTempDirectory("stream-ev").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
    val q = StreamingPipeline.windowedEventCounts(stream).writeStream
      .outputMode("append").format("memory").queryName("winagg")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows. Two-sided check
    // (an inner join would silently ignore windows the streaming path
    // DROPPED): every streamed row must equal its batch counterpart
    // exactly, and every definitely-closed batch window must have been
    // emitted.
    val got = spark.table("winagg")
    val batch = StreamingPipeline.windowedEventCounts(ev)
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty,
      "streamed rows must be a subset of the batch result")
    // definitely closed = window end strictly below the final watermark
    // (max ts - 10 min delay); end = w_start + 5 min width
    val maxTs = ev.agg(max(col("ts").cast("timestamp"))).head()
      .getTimestamp(0)
    val closedBefore = new java.sql.Timestamp(maxTs.getTime - 15 * 60000)
    assert(batch.filter(col("w_start") < closedBefore).exceptAll(got)
      .isEmpty, "closed windows dropped by the streaming path")
  }

  test("streaming triples via foreachBatch == batch pipeline + manifest rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-kg").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
    // two chunks arriving as separate files
    Extract.corpus(spark, 40).write.mode("overwrite").parquet(src)
    spark.range(40, 80).map(id => graft.core.CorpusGen.file(id).source)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.option("maxFilesPerTrigger", "3")
      .schema(schema).parquet(src).as[graft.core.SourceFileHashed]
    val q = StreamingPipeline.triplesStream(stream, out, man, s"$tmp/ckpt")
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(out)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    val batch = Pipeline.run(spark, 80).triples
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // one manifest row per micro-batch; counts add up
    val m = spark.read.parquet(man)
    assert(m.count() >= 2)
    assert(m.agg(org.apache.spark.sql.functions.sum("rowCount"))
      .head().getLong(0) == spark.read.parquet(out).count())
    // publish the streamed backfill as a graph-table snapshot: the
    // LATEST COMMITTED snapshot must read back equal to the batch
    // pipeline's triple set (round 2 committed batches but never
    // published a consumable snapshot)
    val table = s"$tmp/graph"
    val (nPub, _) = StreamingPipeline.publishSnapshot(spark, out, table,
      "snap-000")
    val published = graft.sources.GraphTables.read(spark, table)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    assert(published == batch)
    assert(nPub == published.size.toLong)
    // RE-INGEST file 0 under the same docId with DIFFERENT content
    // (file 97's source text): the next publish must carry only the
    // latest batch's triples for that doc — a bare cross-batch union
    // would keep file 0's stale facts alive
    val f0 = graft.core.CorpusGen.file(0).source
    val altContent = graft.core.CorpusGen.file(97).source.content
    val re = graft.core.SourceFileHashed(f0.repo, f0.path, "c1", f0.lang,
      altContent, graft.core.CorpusGen.sha256Hex(altContent))
    Seq(re).toDS().write.mode("append").parquet(src)
    val q2 = StreamingPipeline.triplesStream(
      spark.readStream.option("maxFilesPerTrigger", "3")
        .schema(schema).parquet(src).as[graft.core.SourceFileHashed],
      out, man, s"$tmp/ckpt")
    q2.processAllAvailable(); q2.stop()
    StreamingPipeline.publishSnapshot(spark, out, table, "snap-001")
    val pub2 = graft.sources.GraphTables.read(spark, table)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    val curFiles = Extract.corpus(spark, 80)
      .filter(f => !(f.repo == f0.repo && f.path == f0.path))
      .union(Seq(re).toDS())
    val batch2 = Pipeline.triplesFor(curFiles)
      .select("subj", "pred", "obj", "docId")
      .collect().map(_.toSeq).toSet
    assert(pub2 == batch2 && pub2 != batch,
      s"stale/missing: +${(pub2 -- batch2).take(3)} -${(batch2 -- pub2).take(3)}")
  }

  test("dynamic-canon publish of a streamed backfill == batch dynamic pipeline") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-dyncanon").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
    val ments = s"$tmp/ments"; val table = s"$tmp/graph"
    // a NOVEL camel/snake alias pair, absent from the static
    // dictionary: only corpus-wide alias mining merges the two forms —
    // the per-batch static canon keeps the snake call-site
    // self-canonical, so this corpus makes the static/dynamic
    // divergence (and the publish path that closes it) observable
    val novelContent = Seq(
      "def runNovel(a: Row): Txn = {",
      "val depotMatrixZz = 1",
      "y = depot_matrix_zz(x)").mkString("\n")
    val novel = graft.core.SourceFileHashed("novelrepo", "N.scala", "c0",
      "scala", novelContent, graft.core.CorpusGen.sha256Hex(novelContent))
    def files = Extract.corpus(spark, 30).union(Seq(novel).toDS())
    files.write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.option("maxFilesPerTrigger", "2")
      .schema(schema).parquet(src).as[graft.core.SourceFileHashed]
    val q = StreamingPipeline.triplesStream(stream, out, man, s"$tmp/ckpt",
      mentionsPath = Some(ments))
    q.processAllAvailable(); q.stop()
    def tset(df: org.apache.spark.sql.DataFrame) =
      df.select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    val batchDyn = tset(Pipeline.dynamicStagesFor(files).triples)
    val (nPub, _) = StreamingPipeline.publishSnapshotDynamic(spark, ments,
      table, "snap-dyn")
    val published = tset(graft.sources.GraphTables.read(spark, table))
    // EXACT parity with the batch dynamic pipeline — shared code path
    assert(published == batchDyn && batchDyn.nonEmpty,
      s"+${(published -- batchDyn).take(3)} -${(batchDyn -- published).take(3)}")
    assert(nPub == published.size.toLong)
    // and the divergence this path exists to close is real: per-batch
    // static triples keep the novel snake alias; the dynamic publish
    // canonicalizes it onto its camel twin
    val streamedStatic = tset(spark.read.parquet(out))
    assert(streamedStatic.exists(_.contains("depot_matrix_zz")),
      "static per-batch canon should keep the novel alias self-canonical")
    assert(published.exists(_.contains("depotMatrixZz")) &&
      !published.exists(_.contains("depot_matrix_zz")),
      "dynamic publish must canonicalize the novel alias")
    // RE-INGEST with zero-mention content: the doc ROSTER (not the
    // mention rows) must resolve last-writer-wins, or the stale batch's
    // mentions survive the publish. Same checkpoint -> the resumed
    // stream processes only the appended file.
    val emptied = "zzz qqq\nzzz qqq"
    val novel2 = graft.core.SourceFileHashed("novelrepo", "N.scala", "c1",
      "scala", emptied, graft.core.CorpusGen.sha256Hex(emptied))
    Seq(novel2).toDS().write.mode("append").parquet(src)
    val q2 = StreamingPipeline.triplesStream(
      spark.readStream.option("maxFilesPerTrigger", "2")
        .schema(schema).parquet(src).as[graft.core.SourceFileHashed],
      out, man, s"$tmp/ckpt", mentionsPath = Some(ments))
    q2.processAllAvailable(); q2.stop()
    StreamingPipeline.publishSnapshotDynamic(spark, ments, table, "snap-dyn2")
    val published2 = tset(graft.sources.GraphTables.read(spark, table))
    assert(!published2.exists(_.contains("novelrepo/N.scala")),
      "stale mentions of a re-ingested zero-mention doc leaked into the publish")
    // and it equals a batch dynamic run over the CURRENT corpus state
    val batchDyn2 = tset(Pipeline.dynamicStagesFor(
      Extract.corpus(spark, 30).union(Seq(novel2).toDS())).triples)
    assert(published2 == batchDyn2)
  }

  test("incremental dynamic publish == full recompute (adds, merges, retraction fallback)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-inccanon").toString
    val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
    val ments = s"$tmp/ments"; val table = s"$tmp/graph"
    val state = s"$tmp/state"
    def tset(df: org.apache.spark.sql.DataFrame) =
      df.select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    def pub(id: String) = StreamingPipeline
      .publishSnapshotDynamicIncremental(spark, ments, table, id, state)
    def published() = tset(graft.sources.GraphTables.read(spark, table))
    def doc(path: String, commit: String, lines: String*) = {
      val c = lines.mkString("\n")
      graft.core.SourceFileHashed("increpo", path, commit, "scala", c,
        graft.core.CorpusGen.sha256Hex(c))
    }
    // phase-1 plant: the SNAKE form only — a later batch's camel twin
    // must relabel it, forcing a re-emit of this doc OUTSIDE the delta
    val a0 = doc("A.scala", "c0",
      "def runBase(a: Row): Txn = {", "y = valve_gamma_qq(x)")
    Extract.corpus(spark, 30).union(Seq(a0).toDS())
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runStream(): Unit = {
      val q = StreamingPipeline.triplesStream(
        spark.readStream.option("maxFilesPerTrigger", "2").schema(schema)
          .parquet(src).as[graft.core.SourceFileHashed],
        out, man, s"$tmp/ckpt", mentionsPath = Some(ments))
      q.processAllAvailable(); q.stop()
    }
    runStream()
    val p1 = pub("inc-1")
    assert(!p1.incremental && p1.note.contains("first publish"))
    val files1 = Extract.corpus(spark, 30).union(Seq(a0).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files1).triples))

    // phase 2 (adds + a net-zero re-ingest): a NEW doc with the CAMEL
    // twin (novel cross-batch alias merge), a NEW plain corpus doc,
    // and a re-ingest of A.scala keeping its alias pair intact
    val b = doc("B.scala", "c0",
      "def runNovel(a: Row): Txn = {", "val valveGammaQq = 1")
    val a1 = doc("A.scala", "c1",
      "def runBase(a: Row): Txn = {", "y = valve_gamma_qq(x)",
      "z = other_call(x)")
    val extra = spark.range(30, 31)
      .map(id => graft.core.CorpusGen.file(id).source)
    Seq(b, a1).toDS().union(extra)
      .write.mode("append").parquet(src)
    runStream()
    val p2 = pub("inc-2")
    assert(p2.incremental, s"expected incremental, got: ${p2.note}")
    // the cross-batch relabeling below went through the entity→doc
    // INDEX (p1's full publish rebuilt it with the completeness marker)
    assert(graft.sources.Fs.exists(spark, s"$state/entidx/_complete"))
    val files2 = Extract.corpus(spark, 31).union(Seq(a1, b).toDS())
    val full2 = tset(Pipeline.dynamicStagesFor(files2).triples)
    assert(published() == full2,
      s"+${(published() -- full2).take(3)} -${(full2 -- published()).take(3)}")
    // the cross-batch merge really happened: the phase-1 snake
    // call-site now rides the camel canonical — i.e. the relabeling
    // re-emitted a doc the delta never touched
    assert(published().exists(r =>
      r.contains("valveGammaQq") && r.contains("increpo/A.scala")))
    assert(!published().exists(_.contains("valve_gamma_qq")))
    // and the incremental output == the full publish over the SAME
    // accumulation (not just the batch pipeline twin)
    StreamingPipeline.publishSnapshotDynamic(spark, ments,
      s"$tmp/graphFull", "full-2")
    assert(tset(graft.sources.GraphTables.read(spark, s"$tmp/graphFull"))
      == published())

    // phase 3 (retraction): re-ingest A.scala WITHOUT its alias pair —
    // the refcount hits zero, the publish must fall back to the full
    // recompute and still be exact
    val a2 = doc("A.scala", "c2",
      "def runBase(a: Row): Txn = {", "z = other_call(x)")
    Seq(a2).toDS().write.mode("append").parquet(src)
    runStream()
    val p3 = pub("inc-3")
    assert(!p3.incremental && p3.note.contains("retracted"), p3.note)
    val files3 = Extract.corpus(spark, 31).union(Seq(a2, b).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files3).triples))

    // phase 4: the fallback rewrote fresh state — the next adds-only
    // delta is incremental again
    val c = doc("C.scala", "c0",
      "def runMore(a: Row): Txn = {", "val valve_gamma_qq = 2")
    Seq(c).toDS().write.mode("append").parquet(src)
    runStream()
    val p4 = pub("inc-4")
    assert(p4.incremental, s"expected incremental, got: ${p4.note}")
    val files4 = files3.union(Seq(c).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files4).triples))

    // phase 5: empty delta — publish is a pure copy-forward
    val p5 = pub("inc-5")
    assert(p5.incremental && p5.note.contains("empty delta"))
    assert(published() == tset(Pipeline.dynamicStagesFor(files4).triples))

    // phase 6: compaction folds the re-ingested doc's superseded rows
    // away (strictly fewer accumulated rows), and publishes — both the
    // full and the incremental path — read the compacted layout to the
    // SAME result; a post-compaction delta stays incremental
    val rowsBefore = spark.read.parquet(ments).count()
    StreamingPipeline.compactAccumulation(spark, ments)
    val rowsAfter = spark.read.parquet(ments).count()
    assert(rowsAfter < rowsBefore,
      s"compaction dropped nothing ($rowsBefore -> $rowsAfter)")
    val p6 = pub("inc-6")
    assert(p6.incremental && p6.note.contains("empty delta"))
    assert(published() == tset(Pipeline.dynamicStagesFor(files4).triples))
    val d = doc("D.scala", "c0",
      "def runLast(a: Row): Txn = {", "val valveGammaQq = 3")
    Seq(d).toDS().write.mode("append").parquet(src)
    runStream()
    val p7 = pub("inc-7")
    assert(p7.incremental && p7.note.contains("adds-only"), p7.note)
    val files5 = files4.union(Seq(d).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files5).triples))

    // ---- overlay I/O: the incremental publishes above wrote DELTAS,
    // not corpus rewrites, and their derived manifest rows are exact
    import graft.sources.{ContentHash, GraphTables}
    val HashCols = Seq("subj", "pred", "obj", "docId")
    // inc-3 was the retraction FALLBACK (full); inc-4/6/7 chain off it
    assert(GraphTables.baseOf(spark, table, "inc-3").isEmpty)
    assert(GraphTables.baseOf(spark, table, "inc-4").contains("inc-3"))
    assert(GraphTables.baseOf(spark, table, "inc-5").contains("inc-4"))
    assert(GraphTables.baseOf(spark, table, "inc-6").contains("inc-5"))
    assert(GraphTables.baseOf(spark, table, "inc-7").contains("inc-6"))
    // the empty-delta snapshot is a pure pointer (zero rows written);
    // the adds-only one wrote strictly less than the corpus
    assert(GraphTables.readOwnData(spark, table, "inc-6").count() == 0)
    val own7 = GraphTables.readOwnData(spark, table, "inc-7").count()
    val all7 = GraphTables.readSnapshot(spark, table, "inc-7").count()
    assert(own7 > 0 && own7 < all7 / 2,
      s"overlay wrote $own7 of $all7 resolved rows — not a delta")
    // derived (rowCount, contentHash) == from-scratch fingerprint of
    // the resolved content, for every overlay in the chain
    Seq("inc-4", "inc-6", "inc-7").foreach { id =>
      val want = ContentHash.hex(
        GraphTables.readSnapshot(spark, table, id), HashCols)
      val got = spark.read.parquet(s"$table/manifest")
        .filter(col("snapshotId") === id)
        .orderBy(col("committedAt").desc)
        .select("rowCount", "contentHash").head() match {
        case r => (r.getLong(0), r.getString(1))
      }
      assert(got == want, s"derived manifest of $id drifted")
    }

    // ---- chained STATE I/O: the incremental publishes above wrote
    // state DELTAS (changed rows + a base pointer), not corpus-sized
    // rewrites of canon map / pair refcounts / per-doc fingerprints
    def stRows(id: String, sub: String) =
      spark.read.parquet(s"$state/snap=$id/$sub").count()
    def baseSt(id: String) = {
      val df = spark.read.parquet(s"$state/snap=$id/meta")
      Option(df.head().getString(df.columns.indexOf("baseState")))
    }
    assert(baseSt("inc-3").isEmpty) // retraction fallback → flat state
    assert(baseSt("inc-4").contains("inc-3") &&
      baseSt("inc-5").contains("inc-4") &&
      baseSt("inc-7").contains("inc-6"))
    // the empty-delta snapshot's state is a pure pointer (zero rows)
    assert(stRows("inc-5", "canon") == 0 && stRows("inc-5", "pairs") == 0 &&
      stRows("inc-5", "docs") == 0)
    // the adds-only one wrote strictly less than the corpus state
    assert(stRows("inc-7", "docs") > 0 &&
      stRows("inc-7", "docs") < stRows("inc-3", "docs") / 2,
      s"state docs delta ${stRows("inc-7", "docs")} of " +
        s"${stRows("inc-3", "docs")} — not a delta")

    // phase 8: the depth gate MATERIALIZES — same content, full dir
    val e = doc("E.scala", "c0",
      "def runFinal(a: Row): Txn = {", "val valveGammaQq = 4")
    Seq(e).toDS().write.mode("append").parquet(src)
    runStream()
    val p8 = StreamingPipeline.publishSnapshotDynamicIncremental(
      spark, ments, table, "inc-8", state, maxChain = 1)
    assert(p8.incremental && p8.note.contains("materialized"), p8.note)
    assert(GraphTables.baseOf(spark, table, "inc-8").isEmpty)
    // the gate flattens the STATE chain together with the data chain
    assert(baseSt("inc-8").isEmpty)
    val files6 = files5.union(Seq(e).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files6).triples))

    // phase 9: canon-state GC keeps the latest state — the next
    // publish is STILL incremental after expiry
    val expired = StreamingPipeline.expireCanonState(
      spark, state, table, keepLast = 1)
    assert(expired.nonEmpty && !expired.contains("inc-8"),
      s"state GC expired $expired")
    val f = doc("F.scala", "c0",
      "def runPost(a: Row): Txn = {", "val valveGammaQq = 5")
    Seq(f).toDS().write.mode("append").parquet(src)
    runStream()
    val p9 = pub("inc-9")
    assert(p9.incremental && p9.note.contains("overlay"), p9.note)
    val files7 = files6.union(Seq(f).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files7).triples))

    // phase 10: graph GC across a live chain — keepLast=1 keeps inc-9
    // plus its base inc-8; everything older (and the long inc-3 chain)
    // goes, and the kept overlay still resolves
    val removed = GraphTables.expireSnapshots(spark, table, keepLast = 1)
    assert(removed.toSet ==
      Set("inc-1", "inc-2", "inc-3", "inc-4", "inc-5", "inc-6", "inc-7"),
      s"removed $removed")
    assert(published() == tset(Pipeline.dynamicStagesFor(files7).triples))

    // phase 11: index FALLBACK — plant a fresh snake form, delete the
    // completeness marker, then land its camel twin: the relabeling of
    // the phase-11a doc (outside the delta) must come out exact through
    // the corpus-scan fallback
    val g = doc("G.scala", "c0",
      "def runExtraA(a: Row): Txn = {", "y = tail_omega_rr(x)")
    Seq(g).toDS().write.mode("append").parquet(src)
    runStream()
    val p11a = pub("inc-11a")
    assert(p11a.incremental, p11a.note)
    assert(new java.io.File(s"$state/entidx/_complete").delete())
    val hh = doc("H.scala", "c0",
      "def runExtraB(a: Row): Txn = {", "val tailOmegaRr = 7")
    Seq(hh).toDS().write.mode("append").parquet(src)
    runStream()
    val p11b = pub("inc-11b")
    assert(p11b.incremental, p11b.note)
    val files9 = files7.union(Seq(g, hh).toDS())
    val full9 = tset(Pipeline.dynamicStagesFor(files9).triples)
    assert(published() == full9,
      s"+${(published() -- full9).take(3)} -${(full9 -- published()).take(3)}")
    assert(published().exists(r =>
      r.contains("tailOmegaRr") && r.contains("increpo/G.scala")),
      "fallback path must still re-emit the relabeled out-of-delta doc")
    // state GC is chain-safe: keepLast=1 keeps inc-11b AND its delta-
    // chain bases (inc-11a, inc-9, inc-8) — nothing here is expirable
    assert(StreamingPipeline.expireCanonState(
      spark, state, table, keepLast = 1).isEmpty,
      "state GC must keep the live delta chain's bases")
    // in-place state compaction: same semantics, flat layout — the
    // retraction detection in phase 12 below reads the COMPACTED
    // refcounts, so a corrupt compaction could not stay green
    assert(StreamingPipeline.compactState(spark, state, "inc-11b"))
    assert(baseSt("inc-11b").isEmpty)
    assert(!StreamingPipeline.compactState(spark, state, "inc-11b"),
      "an already-flat state must not re-compact")
    // a retraction-triggered FULL publish rebuilds the index + marker
    val g2 = doc("G.scala", "c1",
      "def runExtraA(a: Row): Txn = {", "z = unrelated_call(x)")
    Seq(g2).toDS().write.mode("append").parquet(src)
    runStream()
    val p12 = pub("inc-12")
    assert(!p12.incremental && p12.note.contains("retracted"), p12.note)
    assert(graft.sources.Fs.exists(spark, s"$state/entidx/_complete"),
      "full publish must rebuild the index with its marker")
    val files10 = files7.union(Seq(g2, hh).toDS())
    assert(published() == tset(Pipeline.dynamicStagesFor(files10).triples))
  }

  test("compaction under UNPUBLISHED re-ingests cannot mask a retraction") {
    import spark.implicits._
    import graft.sources.GraphTables
    def tset(df: org.apache.spark.sql.DataFrame) =
      df.select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    def doc(path: String, commit: String, lines: String*) = {
      val c = lines.mkString("\n")
      graft.core.SourceFileHashed("cmprepo", path, commit, "scala", c,
        graft.core.CorpusGen.sha256Hex(c))
    }
    def scenario(name: String, keepPublished: Boolean): Unit = {
      val tmp = Files.createTempDirectory(s"stream-compact-$name").toString
      val src = s"$tmp/src"; val out = s"$tmp/out"; val man = s"$tmp/man"
      val ments = s"$tmp/ments"; val table = s"$tmp/graph"
      val state = s"$tmp/state"
      def pub(id: String) = StreamingPipeline
        .publishSnapshotDynamicIncremental(spark, ments, table, id, state)
      def runStream(schema: org.apache.spark.sql.types.StructType): Unit = {
        val q = StreamingPipeline.triplesStream(
          spark.readStream.option("maxFilesPerTrigger", "2").schema(schema)
            .parquet(src).as[graft.core.SourceFileHashed],
          out, man, s"$tmp/ckpt", mentionsPath = Some(ments))
        q.processAllAvailable(); q.stop()
      }
      // A carries the snake form, B its camel twin — one merged
      // component whose ONLY snake evidence is A
      val a0 = doc("A.scala", "c0",
        "def runA(a: Row): Txn = {", "y = valve_gamma_qq(x)")
      val b0 = doc("B.scala", "c0",
        "def runB(a: Row): Txn = {", "val valveGammaQq = 1")
      Extract.corpus(spark, 10).union(Seq(a0, b0).toDS())
        .write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      runStream(schema)
      assert(!pub("p1").incremental) // first publish writes the state
      // re-ingest A WITHOUT its alias pair — retraction evidence that
      // sits UNPUBLISHED in the accumulation...
      val a1 = doc("A.scala", "c1",
        "def runA(a: Row): Txn = {", "z = other_call(x)")
      Seq(a1).toDS().write.mode("append").parquet(src)
      runStream(schema)
      // ...when compaction folds the superseded versions
      val keep = if (keepPublished)
        StreamingPipeline.publishedStateTouches(spark, table, state)
      else None
      if (keepPublished) assert(keep.isDefined)
      StreamingPipeline.compactAccumulation(spark, ments, keep)
      val p2 = pub("p2")
      // either way the publish must NOT ride the stale merged canon:
      // with the published versions kept, the refcounts SEE the
      // retraction; with a bare latest-only fold, the decrement
      // evidence is gone and the evidence check must route to the
      // full publish rather than publish adds-only over it
      assert(!p2.incremental, s"$name: took incremental — ${p2.note}")
      if (keepPublished)
        assert(p2.note.contains("retracted"), s"$name: ${p2.note}")
      else
        assert(p2.note.contains("decrements unverifiable"),
          s"$name: ${p2.note}")
      val files2 = Extract.corpus(spark, 10).union(Seq(a1, b0).toDS())
      val want2 = tset(Pipeline.dynamicStagesFor(files2).triples)
      val got2 = tset(GraphTables.read(spark, table))
      // exactness vs the batch ground truth IS the stale-merge probe:
      // under the stale canon, B's camel mention would still ride the
      // component that remembers A's retracted snake twin, and the
      // sets would differ
      assert(got2 == want2,
        s"$name: +${(got2 -- want2).take(3)} -${(want2 -- got2).take(3)}")
      if (keepPublished) {
        // the benefit claim: an adds-only re-ingest compacted WITH the
        // published touches keeps its decrement evidence and the next
        // publish stays incremental
        val b1 = doc("B.scala", "c1",
          "def runB(a: Row): Txn = {", "val valveGammaQq = 1",
          "val more_stuff = 2")
        Seq(b1).toDS().write.mode("append").parquet(src)
        runStream(schema)
        StreamingPipeline.compactAccumulation(spark, ments,
          StreamingPipeline.publishedStateTouches(spark, table, state))
        val p3 = pub("p3")
        assert(p3.incremental && p3.note.contains("adds-only"),
          s"$name: ${p3.note}")
        val files3 = Extract.corpus(spark, 10).union(Seq(a1, b1).toDS())
        assert(tset(GraphTables.read(spark, table)) ==
          tset(Pipeline.dynamicStagesFor(files3).triples))
        // a crash mid-meta-write leaves a PRESENT but unreadable meta:
        // the contract routes the next publish to the full fallback —
        // it must not throw and wedge the stream's publish schedule
        val metaDir = new java.io.File(s"$state/snap=p3/meta")
        metaDir.listFiles().foreach(_.delete())
        java.nio.file.Files.write(metaDir.toPath.resolve("part-corrupt.parquet"),
          "not parquet".getBytes)
        val c1 = doc("C.scala", "c0",
          "def runC(a: Row): Txn = {", "val unrelated_thing = 9")
        Seq(c1).toDS().write.mode("append").parquet(src)
        runStream(schema)
        val p4 = pub("p4")
        assert(!p4.incremental &&
          p4.note.contains("no complete canon state chain"),
          s"$name: ${p4.note}")
        val files4 = files3.union(Seq(c1).toDS())
        assert(tset(GraphTables.read(spark, table)) ==
          tset(Pipeline.dynamicStagesFor(files4).triples))
      }
    }
    scenario("bare", keepPublished = false)
    scenario("kept", keepPublished = true)
  }

  test("dynamic publish of a LEGACY accumulation (no/partial roster) keeps every doc") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-legacy").toString
    val ments = s"$tmp/ments"; val table = s"$tmp/graph"
    // batch 0 accumulated under pre-roster code: mention rows only, NO
    // roster dir — the publish must fall back to the mention rows' own
    // (docId, batchId) projection instead of crashing or dropping docs
    def files0 = Extract.corpus(spark, 20)
    val linked0 = graft.link.Linker.link(Extract.mentionsFused(files0)).toDF()
    linked0.withColumn("batchId", lit(0L))
      .write.mode("overwrite").partitionBy("batchId").parquet(ments)
    def tset(df: org.apache.spark.sql.DataFrame) =
      df.select("subj", "pred", "obj", "docId").collect().map(_.toSeq).toSet
    val (n0, _) = StreamingPipeline.publishSnapshotDynamic(spark, ments,
      table, "legacy-0")
    val pub0 = tset(graft.sources.GraphTables.read(spark, table))
    assert(pub0 == tset(Pipeline.dynamicStagesFor(files0).triples) &&
      pub0.nonEmpty && n0 == pub0.size.toLong,
      "no-roster legacy accumulation must publish == batch dynamic")
    // batch 1 lands AFTER the roster upgrade (roster rows exist for it
    // alone): pre-roster docs must still contribute their mentions
    val extraSrc = "def legacyKeeper(b: Int): Int = {\nval keeperValZz = 2"
    val extra = graft.core.SourceFileHashed("legacyrepo", "L.scala", "c9",
      "scala", extraSrc, graft.core.CorpusGen.sha256Hex(extraSrc))
    val linked1 = graft.link.Linker.link(
      Extract.mentionsFused(Seq(extra).toDS())).toDF()
    linked1.withColumn("batchId", lit(1L))
      .write.mode("append").partitionBy("batchId").parquet(ments)
    Seq(extra).toDS().toDF()
      .select(graft.core.DocId.column.as("docId"))
      .distinct().withColumn("batchId", lit(1L))
      .write.mode("overwrite").partitionBy("batchId")
      .parquet(StreamingPipeline.rosterPath(ments))
    StreamingPipeline.publishSnapshotDynamic(spark, ments, table, "legacy-1")
    val pub1 = tset(graft.sources.GraphTables.read(spark, table))
    assert(pub1 == tset(Pipeline.dynamicStagesFor(
      files0.union(Seq(extra).toDS())).triples),
      "partial-roster accumulation must keep pre-roster docs AND the new batch")
    assert(pub1.exists(_.contains("legacyrepo/L.scala")) &&
      pub1.size > pub0.size)
  }

  test("publish of an all-zero-mention accumulation is a legitimate empty snapshot") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-empty").toString
    val ments = s"$tmp/ments"; val out = s"$tmp/out"
    // the exact on-disk shape a stream of zero-yield batches leaves:
    // parquet commit of an empty frame -> dir with _SUCCESS only
    val linked = graft.link.Linker.link(
      Extract.mentionsFused(Extract.corpus(spark, 2))).toDF()
    linked.filter(lit(false)).withColumn("batchId", lit(0L))
      .write.mode("overwrite").partitionBy("batchId").parquet(ments)
    val (nDyn, _) = StreamingPipeline.publishSnapshotDynamic(spark, ments,
      s"$tmp/graphDyn", "empty-dyn")
    assert(nDyn == 0L)
    val readBack = graft.sources.GraphTables.read(spark, s"$tmp/graphDyn")
    assert(readBack.count() == 0 &&
      readBack.schema == graft.sources.GraphTables.TableSchema)
    // static publish path: same empty-accumulation shape on the
    // per-batch TRIPLES dir
    linked.filter(lit(false))
      .select(lit("s").as("subj"), lit("p").as("pred"), lit("o").as("obj"),
        lit("d").as("docId"), lit(0.0).as("score"))
      .withColumn("batchId", lit(0L))
      .write.mode("overwrite").partitionBy("batchId").parquet(out)
    val (nStat, _) = StreamingPipeline.publishSnapshot(spark, out,
      s"$tmp/graphStat", "empty-stat")
    assert(nStat == 0L &&
      graft.sources.GraphTables.read(spark, s"$tmp/graphStat").count() == 0)
    // a MISSING accumulation dir is a caller bug (typo'd path / stream
    // never ran), not a legitimate empty publish — both paths fail loudly
    intercept[IllegalArgumentException] {
      StreamingPipeline.publishSnapshotDynamic(spark, s"$tmp/nope",
        s"$tmp/graphX", "x")
    }
    intercept[IllegalArgumentException] {
      StreamingPipeline.publishSnapshot(spark, s"$tmp/nope2",
        s"$tmp/graphY", "y")
    }
  }

  test("a retried micro-batch commit is idempotent (no duplicate triples)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-retry").toString
    val out = s"$tmp/out"; val man = s"$tmp/man"
    val triples = Seq(("a", "calls", "b", "d1", 1.0), ("c", "imports", "d", "d1", 1.0))
      .toDF("subj", "pred", "obj", "docId", "score")
    StreamingPipeline.commitBatch(triples, 0L, out, man)
    val once = spark.read.parquet(out).collect().map(_.toSeq).toSet
    // simulate the at-least-once retry: same batchId commits again
    StreamingPipeline.commitBatch(triples, 0L, out, man)
    val twice = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(twice == once && spark.read.parquet(out).count() == 2)
    assert(spark.read.parquet(man).count() == 1, "manifest row duplicated")
    // a NEW batch appends its own partition without touching batch 0
    StreamingPipeline.commitBatch(triples
      .withColumn("docId", lit("d2")), 1L, out, man)
    assert(spark.read.parquet(out).count() == 4)
    assert(spark.read.parquet(man).count() == 2)
  }

  test("streaming fingerprint dedup == batch exact-dedup group count") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("stream-dd").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (0 until 60).map { i =>
      // 20 distinct texts, each appearing 3x (case/punct variants that
      // normalize to the same fingerprint)
      val v = i % 3 match {
        case 0 => s"doc number ${i % 20} body"
        case 1 => s"DOC NUMBER ${i % 20} BODY"
        case _ => s"doc-number ${i % 20} body!"
      }
      (new java.sql.Timestamp(base.getTime + i * 1000L), i.toLong, v)
    }
    rows.toDF("ts", "doc_id", "text").write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = StreamingPipeline.dedupStream(
      spark.readStream.schema(schema).parquet(tmp)).writeStream
      .outputMode("append").format("memory").queryName("dd")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("dd")
    assert(out.count() == 20, s"got ${out.count()}")
    assert(out.select("fingerprint").distinct().count() == 20)
    val batchGroups = graft.ops.DedupOps
      .exactGroups(spark.read.parquet(tmp), "doc_id", "text").count()
    assert(out.count() == batchGroups)
  }

  test("watermarked stream-stream range join == batch join") {
    val tmp = Files.createTempDirectory("stream-ssj").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .limit(2000)
    ev.write.mode("overwrite").parquet(tmp)
    def stream = spark.readStream.schema(ev.schema).parquet(tmp)
    val q = StreamingPipeline.streamStreamJoin(stream, stream).writeStream
      .outputMode("append").format("memory").queryName("ssj")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj").collect().map(_.toSeq).toSet
    val want = StreamingPipeline.streamStreamJoin(ev, ev)
      .collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
  }

  test("range-join pairs are id-order-insensitive (earlier event, larger id)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2026-01-01 00:00:00"), 9L), // earlier but LARGER id
      (1L, ts("2026-01-01 00:01:00"), 2L),
      (1L, ts("2026-01-01 00:01:00"), 3L), // ts tie -> id order
      (2L, ts("2026-01-01 00:00:00"), 1L),
      (2L, ts("2026-01-01 00:30:00"), 4L)) // out of range
      .toDF("user_id", "ts", "event_id")
    val got = StreamingPipeline.streamStreamJoin(ev, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 9L, 2L), (1L, 9L, 3L), (1L, 2L, 3L)), s"$got")
  }

  test("gap sessionization with flatMapGroupsWithState") {
    import spark.implicits._
    def ts(m: Long) = new java.sql.Timestamp(m * 60000)
    val evs = Seq(
      StreamingPipeline.Ev(1, ts(0), "a"),
      StreamingPipeline.Ev(1, ts(1), "b"),
      StreamingPipeline.Ev(1, ts(30), "c"), // gap > 10min -> new session
      StreamingPipeline.Ev(2, ts(5), "a")).toDS()
    val sessions = StreamingPipeline.sessionize(evs, gapMs = 10 * 60000)
      .collect()
    // only CLOSED sessions are emitted (the open tail stays in state)
    assert(sessions.toSet == Set(
      StreamingPipeline.Session(1, 0, 60000, 2)))
  }

  test("late in-gap cross-batch event cannot move a session's end backward") {
    // two runs over one checkpoint = real cross-batch state restore
    // (an always-on MemoryStream query with ProcessingTimeTimeout runs
    // continuous timeout batches and processAllAvailable never sees
    // quiescence — the parquet + AvailableNow pattern used suite-wide
    // avoids that)
    import spark.implicits._
    val dir = Files.createTempDirectory("sess-late").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"
    // offset every event away from epoch 0: the initial watermark is 0
    // and the stateful operator's late filter drops rows AT the
    // watermark (ts <= wm), so a t=0 event would silently vanish
    def ts(m: Long) = new java.sql.Timestamp((100 + m) * 60000)
    val schema = Seq.empty[StreamingPipeline.Ev].toDS().schema
    // Spark 4.1's async checkpoint-file checksum writer deadlocks this
    // flatMapGroupsWithState query in local mode (executor tasks park
    // forever in ChecksumCancellableFSDataOutputStream.close awaiting
    // the checksum future); the feature is a corruption detector, not
    // semantics — disable it for this test only
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "false")
    // foreachBatch, not the memory sink: only the former supports
    // resuming from a checkpoint, which is the whole point here
    def run(): Set[StreamingPipeline.Session] = {
      val buf = scala.collection.mutable.Set[StreamingPipeline.Session]()
      val stream = spark.readStream.schema(schema).parquet(src)
        .as[StreamingPipeline.Ev]
      val q = StreamingPipeline.sessionize(stream, gapMs = 10 * 60000)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingPipeline.Session],
              _: Long) => buf ++= b.collect(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      buf.toSet
    }
    try {
      Seq(StreamingPipeline.Ev(1, ts(0), "a"),
        StreamingPipeline.Ev(1, ts(10), "b"))
        .toDS().write.mode("append").parquet(src)
      assert(run().isEmpty) // one open session, none closed
      // batch 2: t=8m is LATE but within the gap of last=10m -> merges
      // without shrinking the session; t=40m splits (40-10 > gap)
      Seq(StreamingPipeline.Ev(1, ts(8), "late"),
        StreamingPipeline.Ev(1, ts(40), "c"))
        .toDS().write.mode("append").parquet(src)
      val got = run()
      // pre-fix the late event dragged `last` back to minute 108 and
      // the emitted session shrank
      assert(got == Set(StreamingPipeline.Session(1,
        ts(0).getTime, ts(10).getTime, 3)), s"$got")
    } finally spark.conf
      .unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
  }
}
