package graft.streaming

import graft.core.{Mention, Sentence, SourceFileHashed}
import graft.extract.Tokenizer
import graft.kernel.{TriaffineScorer, Weights}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extension (SURVEY §2.9: the reference is batch-only; the
  * north-star's ingest path makes this a designed extension, not a
  * port): Structured Streaming over the same operators.
  *
  *  - [[extractStream]]: incremental mention extraction — readStream of
  *    source files -> the SAME kernel as the batch path (one code path,
  *    so batch/stream parity is by construction).
  *  - [[windowedEventCounts]]: watermarked tumbling-window aggregation
  *    over an event stream.
  *  - [[sessionize]]: custom state via flatMapGroupsWithState — session
  *    = per-user gap-bounded event run, emitted on gap expiry.
  *
  * Scale notes: extraction is stateless (no watermark needed, no state
  * store growth); the windowed agg bounds state by watermark; the
  * session store is keyed by user and pruned by timeout. All sinks are
  * idempotent-append (exactly-once with checkpointed offsets).
  */
object StreamingPipeline {

  /** Streaming source-file table -> mention stream (stateless map). */
  def extractStream(files: Dataset[SourceFileHashed]): Dataset[Mention] = {
    val spark = files.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(Weights.default)
    files.flatMap { f =>
      val w = bw.value
      TriaffineScorer.mentionsForFile(
        Tokenizer.sentences(graft.core.DocId.of(f.repo, f.path), f.content), w)
    }
  }

  /** Watermarked TUMBLING-window counts over (ts, event_type) — one
    * non-overlapping 5-minute window per event (pass a slide < width
    * to `window()` for the sliding variant).
    * Parquet NTZ timestamps are cast to session-TZ timestamps (UTC)
    * because event-time watermarks require TIMESTAMP type. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Idempotent per-batch commit: triples AND the manifest row are
    * written into a `batchId=<id>` partition with dynamic partition
    * overwrite, so a RETRIED micro-batch (crash between the data write
    * and the streaming checkpoint commit) REPLACES its own partition
    * instead of appending duplicates — the write is exactly-once per
    * batchId even though foreachBatch is at-least-once. */
  def commitBatch(triples: DataFrame, batchId: Long, outPath: String,
      manifestPath: String): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    val cached = triples.cache()
    try {
      // per-WRITE dynamic overwrite (writer option, not a session conf
      // — see ResumableStage.runWith)
      cached.withColumn("batchId", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batchId").parquet(outPath)
      val (nRows, cHash) = graft.sources.ContentHash.hex(cached,
        Seq("subj", "pred", "obj", "docId"))
      Seq((f"batch$batchId%05d", nRows, cHash,
        System.currentTimeMillis(), batchId))
        .toDF("stage", "rowCount", "contentHash", "committedAt", "batchId")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batchId").parquet(manifestPath)
    } finally { cached.unpersist(); () }
  }

  /** Streaming ingest -> triples: foreachBatch runs the SAME batch
    * pipeline stages per micro-batch (north-star §2.9 extension:
    * "idempotent per-partition writes + a manifest table, foreachBatch
    * if a streaming ingest is later attached"). Each micro-batch
    * commits its triples and one lineage row via [[commitBatch]]
    * (idempotent per batchId); the checkpointLocation dedups batches,
    * the manifest gives auditability. */
  /** Doc-roster side table of the mention accumulation: one row per
    * (docId, batchId) the batch TOUCHED — including docs that yielded
    * ZERO mentions. Last-writer-wins at publish time is resolved on
    * this roster, not on the mention rows themselves: a re-ingested doc
    * whose new content has no linked mentions must suppress its old
    * mentions, and the mention table alone cannot say the doc was seen
    * again. */
  def rosterPath(mentionsPath: String): String = s"${mentionsPath}_docs"

  /** Canon contract: each micro-batch canonicalizes against the STATIC
    * dictionary map — a batch sees only its own files, so it cannot
    * mine corpus-wide alias edges; its per-batch triples may keep a
    * novel surface-form alias self-canonical where the batch
    * dynamic-canon pipeline would merge it. Pass `mentionsPath` to also
    * accumulate the LINKED mention table per batch (plus the
    * [[rosterPath]] doc roster; same idempotent batchId-partition
    * protocol) — [[publishSnapshotDynamic]] then restores EXACT
    * dynamic-canon parity at publish time by re-running the shared
    * canon+emit stages over the accumulated union.
    *
    * `ingestTsCol` (explicit OPT-IN — never inferred from a column
    * name, so a source that happens to carry a similarly-named column
    * keeps the documented deterministic survivor) names a monotone
    * ingest-time column the caller added to the source before the
    * typed conversion (`.as[SourceFileHashed]` keeps extra columns in
    * the plan), e.g.
    *   .withColumn("ingestTs", col("_metadata.file_modification_time"))
    * It must resolve (Spark's case-insensitive resolution applies) to
    * a timestamp or numeric column — a string epoch would order
    * lexicographically ("9..." > "10...") and is rejected loudly. */
  def triplesStream(files: Dataset[SourceFileHashed], outPath: String,
      manifestPath: String, checkpoint: String,
      mentionsPath: Option[String] = None,
      ingestTsCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // validate the opt-in once, against the STREAM schema, before any
    // batch runs — a typo'd or mistyped column fails at start(), not
    // silently mid-stream
    ingestTsCol.foreach { name =>
      val f = files.schema.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"ingestTsCol '$name' not found in the source schema " +
            s"(${files.schema.fieldNames.mkString(", ")}) — add it " +
            "before the typed conversion, e.g. from " +
            "_metadata.file_modification_time"))
      f.dataType match {
        case _: org.apache.spark.sql.types.TimestampType => ()
        case _: org.apache.spark.sql.types.TimestampNTZType => ()
        case _: org.apache.spark.sql.types.NumericType => ()
        case other => throw new IllegalArgumentException(
          s"ingestTsCol '$name' must be a timestamp or numeric column " +
            s"(got ${other.simpleString}) — a string epoch would order " +
            "lexicographically and pick wrong survivors")
      }
    }
    files.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: Dataset[SourceFileHashed], batchId: Long) =>
        val spark = batch0.sparkSession
        import org.apache.spark.sql.functions._
        import spark.implicits._
        // ONE version per doc per batch: with maxFilesPerTrigger > 1 a
        // doc re-ingested twice between triggers lands both versions in
        // this micro-batch under a single batchId — the (docId,
        // batchId) last-writer-wins at publish time cannot separate
        // them, and the union of both versions' facts is wrong under
        // any ordering. With `ingestTsCol` the ingest time orders
        // first (a row missing the ts loses to any row carrying one:
        // recency evidence beats absence) — last-writer semantics up
        // to the timestamp's granularity; versions tied on the ts
        // (same filesystem mtime tick) fall through to the
        // deterministic rule below. Without it a file source gives no
        // within-batch order, so the survivor is the deterministic
        // max (commit, sha256) — determinism, not chronology: when
        // the lexicographically larger (commit, sha256) is the OLDER
        // version, the batch keeps the stale one; separate versions
        // into distinct batches (maxFilesPerTrigger=1) if the source
        // cannot carry a timestamp. Across batches the batchId
        // ordering still governs.
        val ord = ingestTsCol.map(c => col(c).desc_nulls_last).toSeq ++
          Seq(col("commit").desc, col("sha256").desc)
        val vw = org.apache.spark.sql.expressions.Window
          .partitionBy(graft.core.DocId.column)
          .orderBy(ord: _*)
        val batch = batch0.toDF()
          .withColumn("__rn", row_number().over(vw))
          .filter(col("__rn") === 1).drop("__rn")
          .as[SourceFileHashed]
        val ments = graft.extract.Extract.mentionsFused(batch)
        // persist when two actions read it (the mentions write + the
        // canon->triples commit): unpersisted, each would re-run the
        // extraction kernel — the dominant stage — once over
        val linked0 = graft.link.Linker.link(ments).toDF()
        val linked =
          if (mentionsPath.isDefined) linked0.persist() else linked0
        try {
          mentionsPath.foreach { mp =>
            linked.withColumn("batchId", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batchId").parquet(mp)
            batch.toDF()
              .select(graft.core.DocId.column.as("docId"))
              .distinct()
              .withColumn("batchId", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batchId").parquet(rosterPath(mp))
          }
          val canon = graft.Pipeline.canonicalize(linked,
            graft.Pipeline.staticCanonMap(spark))
          import spark.implicits._
          val triples = graft.triples.TripleEmit
            .emitFused(canon.as[graft.triples.TripleEmit.CanonMention])
            .toDF()
          commitBatch(triples, batchId, outPath, manifestPath)
        } finally {
          if (mentionsPath.isDefined) { linked.unpersist(); () }
        }
      }
      .start()
  }

  /** Publish the union of all COMMITTED streamed batches as one
    * [[graft.sources.GraphTables]] snapshot — the step that turns a
    * streamed backfill into a consumable graph table (round 2 committed
    * per-batch parquet but never published a snapshot). A docId
    * re-ingested across batches contributes only its LATEST batch's
    * triples (last-writer-wins per doc, the same rule as
    * [[publishSnapshotDynamic]]; within one micro-batch
    * [[triplesStream]] keeps a single version per doc — by its
    * caller's `ingestTsCol` chronology when opted in, else by the
    * deterministic (commit, sha256) rule — so batchId granularity
    * suffices) — a bare union would keep stale
    * triples whose facts vanished from the newer content. The one case
    * this path cannot resolve is a re-ingest whose new content yields
    * ZERO triples (no row records the doc was seen again); run
    * [[triplesStream]] with `mentionsPath` and publish via
    * [[publishSnapshotDynamic]] (doc roster) when that matters.
    * Snapshot isolation comes from GraphTables.write (own snap dir,
    * manifest append LAST), so a crash mid-publish leaves readers on
    * the previous snapshot. Returns (rowCount, contentHash) of the
    * published snapshot. */
  def publishSnapshot(spark: SparkSession, outPath: String,
      tablePath: String, snapshotId: String): (Long, String) = {
    // an accumulation whose EVERY batch committed zero triples wrote no
    // batchId= partitions (just _SUCCESS) — read.parquet on the bare
    // dir fails schema inference; the correct publish is a legitimate
    // EMPTY snapshot (same probe-then-empty shape as GraphTables.write/
    // readSnapshot). A MISSING dir is different: no stream ever
    // committed there, so publishing "empty" would mask a typo'd path —
    // fail loudly instead.
    require(graft.sources.Fs.exists(spark, outPath),
      s"no streamed accumulation at $outPath — nothing was ever committed")
    if (!graft.sources.Fs.hasPartitions(spark, outPath, "batchId=")) {
      import spark.implicits._
      return graft.sources.GraphTables.write(
        spark.emptyDataset[graft.core.Triple].toDF(), tablePath, snapshotId)
    }
    val all = spark.read.parquet(outPath)
    val latest = all.groupBy(col("docId"))
      .agg(max(col("batchId")).as("batchId"))
    val t = all.join(latest, Seq("docId", "batchId"))
      // collapse a retried batch's identical rows (idempotent commit
      // already overwrites the partition; the agg is belt-and-braces
      // and drops the batchId column from the published schema)
      .groupBy(col("subj"), col("pred"), col("obj"), col("docId"))
      .agg(max(col("score")).as("score"))
    graft.sources.GraphTables.write(t, tablePath, snapshotId)
  }

  /** DYNAMIC-canon snapshot publish: re-runs the shared downstream
    * stages ([[graft.Pipeline.dynamicCanonMap]] -> canonicalize ->
    * fused emit) over the mention table accumulated by
    * [[triplesStream]]'s `mentionsPath` — so a streamed backfill of a
    * corpus with NOVEL surface-form aliases publishes exactly what the
    * batch dynamic pipeline ([[graft.Pipeline.dynamicStagesFor]]) emits
    * (parity by shared code path, asserted in StreamingSpec), where the
    * per-batch static-canon triples cannot mine cross-corpus alias
    * edges. Extraction is NOT re-run — only canon+emit, over already-
    * linked mentions. A docId re-ingested across batches contributes
    * only its LATEST batch's mentions (last-writer-wins), matching a
    * batch run over the current corpus state; within ONE micro-batch
    * [[triplesStream]] keeps a single version per doc (`ingestTsCol`
    * chronology when opted in, else the deterministic (commit,
    * sha256) rule), so batchId granularity is sufficient here.
    *
    * Cost is O(accumulated corpus) EVERY publish — alias mining, CC,
    * canon join, and emit all re-run over the full union. Prefer
    * [[publishSnapshotDynamicIncremental]], which produces the
    * identical snapshot at O(delta) cost whenever the ingest only adds
    * alias evidence, and falls back to this full path (plus a state
    * rewrite) when evidence is retracted. */
  def publishSnapshotDynamic(spark: SparkSession, mentionsPath: String,
      tablePath: String, snapshotId: String): (Long, String) = {
    import spark.implicits._
    // every batch yielded zero LINKED mentions -> no batchId=
    // partitions under mentionsPath (just _SUCCESS); publish a
    // legitimate empty snapshot instead of failing schema inference
    // (same probe shape as publishSnapshot / GraphTables.write). A
    // MISSING dir means no stream ever accumulated here — fail loudly
    // rather than mask a typo'd path with an empty publish.
    require(graft.sources.Fs.exists(spark, mentionsPath),
      s"no mention accumulation at $mentionsPath — nothing was ever " +
        "committed (triplesStream needs mentionsPath=Some(...))")
    if (!graft.sources.Fs.hasPartitions(spark, mentionsPath, "batchId="))
      return graft.sources.GraphTables.write(
        spark.emptyDataset[graft.core.Triple].toDF(), tablePath, snapshotId)
    val all = spark.read.parquet(mentionsPath)
    val latest = latestTouches(spark, mentionsPath, all)
    val linked = all.join(latest, Seq("docId", "batchId"))
      .drop("batchId").persist()
    try {
      // driver-gated fast path (see Pipeline.dynamicCanonMapGated):
      // same rows, one job instead of the serial star-round chain
      val (canonMap, canonRows) =
        graft.Pipeline.dynamicCanonMapGated(spark, linked)
      val canon = graft.Pipeline.canonicalize(linked, canonMap,
        hintBroadcast = canonRows <= graft.Pipeline.BroadcastCanonMaxRows)
      val triples = graft.triples.TripleEmit
        .emitFused(canon.as[graft.triples.TripleEmit.CanonMention]).toDF()
      graft.sources.GraphTables.write(triples, tablePath, snapshotId)
    } finally { linked.unpersist(); () }
  }

  /** Latest (docId, batchId) touch per doc — last-writer-wins resolved
    * on the union of the DOC ROSTER and the mention rows' own
    * (docId, batchId) projection:
    *  - the roster records every doc a batch TOUCHED, including a
    *    re-ingest whose new content has zero linked mentions — mention
    *    rows alone cannot say the doc was seen again, so max(batchId)
    *    over mentions alone would keep the stale batch's mentions;
    *  - mention rows cover batches accumulated BEFORE the roster
    *    existed (a legacy accumulation resumed under this code has no
    *    roster rows for those batches — joining against the roster
    *    alone would silently drop every pre-roster doc; with no roster
    *    dir at all the read itself would fail).
    * The max over the union is the true latest touch in every case
    * except a PRE-roster zero-mention re-ingest, which left no record
    * of itself anywhere and is unknowable by construction. */
  private def latestTouches(spark: SparkSession, mentionsPath: String,
      all: DataFrame): DataFrame = {
    val mentionTouches = all.select(col("docId"), col("batchId"))
    val rosterP = rosterPath(mentionsPath)
    val touched =
      if (graft.sources.Fs.hasPartitions(spark, rosterP, "batchId="))
        spark.read.parquet(rosterP).select(col("docId"), col("batchId"))
          .unionByName(mentionTouches)
      else mentionTouches
    touched.groupBy(col("docId")).agg(max(col("batchId")).as("batchId"))
  }

  /** Accumulation compaction — the storage-hygiene half of the
    * streamed mention table: every re-ingest leaves the doc's OLD
    * rows behind in their `batchId=` partitions (publish resolves
    * last-writer-wins at read time, so correctness never needed them
    * gone), which grows the accumulation with total ingest volume
    * instead of corpus size. This folds the layout down to each doc's
    * LATEST rows — exactly the set every publish resolves —
    * PRESERVING each surviving row's batchId partition value, so the
    * publish delta floor (`lastBatchId`), the canon state's
    * (docId -> batchId) pointers, and future last-writer-wins all stay
    * valid. The roster is compacted the same way (a doc whose latest
    * touch predates the roster keeps no roster row — its mention rows
    * still record it, the legacy rule). Publish before == publish
    * after (StreamingSpec). Runs through a tmp dir + [[graft.sources
    * .Fs.swapInto]]; NOT concurrency-safe with a live stream writing
    * new batches — run at a quiescent point (between triggers, after
    * a backfill), like any table-maintenance job.
    *
    * `keepTouches`: extra (docId, batchId) versions to PRESERVE beyond
    * each doc's latest — pass [[publishedStateTouches]] whenever the
    * table is published via [[publishSnapshotDynamicIncremental]] and
    * the accumulation may hold re-ingests NEWER than the last publish.
    * The incremental publish decrements pair refcounts against the
    * superseded versions' rows — the versions the last publish
    * RECORDED, not the latest ones — and a bare latest-only fold
    * deletes exactly those rows (mentions and roster touch alike).
    * The publish detects the loss and falls back to a full
    * recanonicalization (never a wrong answer — see the evidence
    * check in [[publishSnapshotDynamicIncremental]]), but the
    * fallback costs the O(corpus) publish this path exists to avoid:
    * keep the published versions and the next publish stays
    * incremental. */
  def compactAccumulation(spark: SparkSession, mentionsPath: String,
      keepTouches: Option[DataFrame] = None): Unit = {
    import graft.sources.Fs
    if (!Fs.hasPartitions(spark, mentionsPath, "batchId=")) return
    val all = spark.read.parquet(mentionsPath)
    // materialize: read by both rewrites, and it must be computed
    // before the swap replaces the dir it reads. Cast batchId to long
    // on BOTH branches: the partition column reads back as int when
    // every value fits, while state-derived keepTouches carry longs.
    val latest0 = latestTouches(spark, mentionsPath, all)
      .select(col("docId"), col("batchId").cast("long").as("batchId"))
    val latest = keepTouches.fold(latest0)(k =>
        latest0.unionByName(k.select(col("docId"),
          col("batchId").cast("long").as("batchId"))).distinct())
      .localCheckpoint()
    val tmpM = s"${mentionsPath}__compact"
    all.join(latest, Seq("docId", "batchId"), "left_semi")
      .write.mode("overwrite").partitionBy("batchId").parquet(tmpM)
    val rosterP = rosterPath(mentionsPath)
    val doRoster = Fs.hasPartitions(spark, rosterP, "batchId=")
    if (doRoster) {
      // written BEFORE either swap — this plan reads rosterP
      spark.read.parquet(rosterP)
        .join(latest, Seq("docId", "batchId"), "left_semi")
        .write.mode("overwrite").partitionBy("batchId")
        .parquet(s"${rosterP}__compact")
    }
    // roster FIRST: a crash between the swaps must leave the mention
    // table OVER-evidenced (stale mentions with a compacted roster are
    // superseded by latestTouches and keep decrements computable); the
    // reverse order would leave superseded versions roster-evidenced
    // but mention-row-less, silently defeating the retraction detector
    if (doRoster) Fs.swapInto(spark, s"${rosterP}__compact", rosterP)
    Fs.swapInto(spark, tmpM, mentionsPath)
  }

  /** The (docId, batchId) versions the latest COMMITTED snapshot's
    * publish state recorded — [[compactAccumulation]]'s `keepTouches`
    * for a table published incrementally. None when no snapshot is
    * committed or its state chain is unreadable: then the next publish
    * takes the full path regardless, which needs no superseded-version
    * rows, so a latest-only fold is already safe. */
  def publishedStateTouches(spark: SparkSession, tablePath: String,
      statePath: String): Option[DataFrame] =
    (if (graft.sources.Fs.exists(spark, s"$tablePath/manifest"))
       graft.sources.GraphTables.latestSnapshot(spark, tablePath)
     else None)
      .flatMap(id => readState(spark, statePath, id))
      .map(_.docs.select(col("docId"), col("batchId")))

  // ------------------------------------------------------------------
  // DELTA-AWARE dynamic publish (incremental canonicalization)
  // ------------------------------------------------------------------

  /** Result of an incremental-capable publish: `incremental` says
    * which path actually ran; `note` says why. */
  final case class DynPublish(rows: Long, hash: String,
      incremental: Boolean, note: String)

  private def stateDir(statePath: String, snapshotId: String): String =
    s"$statePath/snap=$snapshotId"

  // ---- entity→doc index: the affected-docs probe at O(touched
  // ---- buckets) instead of an O(corpus) accumulation scan ----------

  private val EntIdxBuckets = 64

  /** Shared across snapshots (next to the per-snapshot state dirs).
    * Rows (entity, docId, ebucket): every doc that EVER mentioned the
    * entity, partitioned by entity-hash bucket so a changed-entity
    * lookup prunes to the touched buckets. Over-coverage is BENIGN by
    * the same argument as the stale-row over-selection it replaces —
    * re-emitting a doc from its latest version is always correct — so
    * the index is append-only per delta (stale pairs and duplicates
    * never hurt) and is rebuilt distinct on every full publish. The
    * `_complete` marker gates reads: it lands atomically with a full
    * rebuild (inside the swap) and is required before the incremental
    * path trusts the index — a legacy accumulation without it keeps
    * the corpus-scan fallback until its next full publish. */
  private def entIdxDir(statePath: String): String = s"$statePath/entidx"

  private def entIdxMarker(statePath: String): String =
    s"${entIdxDir(statePath)}/_complete"

  private def ebucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(EntIdxBuckets)).cast("int")

  private def entIdxUsable(spark: SparkSession, statePath: String): Boolean =
    graft.sources.Fs.exists(spark, entIdxMarker(statePath)) &&
      graft.sources.Fs.hasPartitions(spark, entIdxDir(statePath), "ebucket=")

  /** Delta append — MUST run before the snapshot's manifest commit: a
    * crash in between leaves over-coverage (benign), never a committed
    * snapshot whose docs the index misses. */
  private def appendEntIdx(spark: SparkSession, statePath: String,
      linked: DataFrame): Unit =
    linked.select(col("entity"), col("docId")).distinct()
      .withColumn("ebucket", ebucket(col("entity")))
      .write.mode("append").partitionBy("ebucket")
      .parquet(entIdxDir(statePath))

  /** Full rebuild (full-publish path): distinct pairs through a tmp
    * dir + swap, the completeness marker written INTO the tmp so data
    * and marker land together; also the dedup that bounds the
    * append-only growth between full publishes. */
  private def rebuildEntIdx(spark: SparkSession, statePath: String,
      linked: DataFrame): Unit = {
    val d = entIdxDir(statePath); val tmp = s"${d}__rebuild"
    linked.select(col("entity"), col("docId")).distinct()
      .withColumn("ebucket", ebucket(col("entity")))
      .write.mode("overwrite").partitionBy("ebucket").parquet(tmp)
    graft.sources.Fs.touch(spark, s"$tmp/_complete")
    graft.sources.Fs.swapInto(spark, tmp, d)
  }

  final case class Maintenance(flattened: Boolean,
      expiredSnapshots: Seq[String], prunedManifest: Seq[String],
      expiredState: Seq[String])

  /** One-call table maintenance for a quiescent window, in the one
    * order that composes correctly:
    *  1. optionally FLATTEN the latest snapshot in place
    *     ([[graft.sources.GraphTables.compactSnapshot]] for the data,
    *     [[compactState]] for its canon-state chain) — making both
    *     base chains collectible in the same pass (without this,
    *     chain-safe GC rightly keeps every base of the kept overlay);
    *  2. expire snapshot data dirs ([[graft.sources.GraphTables
    *     .expireSnapshots]], chain-safe);
    *  3. expire superseded canon state ([[expireCanonState]] — while
    *     the manifest still lists the superseded ids as committed; run
    *     after the prune and they'd read as "uncommitted" and escape
    *     deletion until the orphan age gate);
    *  4. prune manifest rows to the SAME window ([[graft.sources
    *     .GraphTables.pruneManifest]] — last, so every earlier step
    *     agrees on the keep set).
    * `flatten=false` (default) keeps maintenance O(metadata): the
    * `maxChain` publish gate already amortizes materialization. */
  def maintainGraph(spark: SparkSession, tablePath: String,
      statePath: String, keepLast: Int,
      flatten: Boolean = false): Maintenance = {
    import graft.sources.GraphTables
    // resolve the latest snapshot ONCE — two manifest reads could
    // disagree if a publish raced the quiescent window
    val latestId =
      if (flatten) GraphTables.latestSnapshot(spark, tablePath) else None
    val flattened = latestId.exists(id =>
      GraphTables.compactSnapshot(spark, tablePath, id))
    // flatten the latest snapshot's STATE chain alongside its data
    // chain, so the expiry below can collect the state bases too
    latestId.foreach(id => compactState(spark, statePath, id))
    val expired = GraphTables.expireSnapshots(spark, tablePath, keepLast)
    val state = expireCanonState(spark, statePath, tablePath, keepLast)
    val pruned = GraphTables.pruneManifest(spark, tablePath, keepLast)
    Maintenance(flattened, expired, pruned, state)
  }

  /** Canon-state GC — the state-side twin of
    * [[graft.sources.GraphTables.expireSnapshots]]: every publish
    * writes a `snap=` state dir (canon map + pair refcounts + per-doc
    * fingerprints), and only the LATEST committed snapshot's state is
    * ever read, so without expiry state storage grows with publish
    * count × corpus vocabulary. Deletes state dirs that are
    *  - for a COMMITTED snapshot beyond the `keepLast` most recent
    *    (the latest is never deleted — same clamp and tie-break as
    *    expireSnapshots, so the kept set always covers what
    *    `latestSnapshot` resolves), or
    *  - for NO committed snapshot (crashed publish) and older than
    *    `orphanSafetyMs` — the age gate protects an in-flight publish
    *    whose manifest append hasn't landed yet.
    * Expiring a state dir never breaks correctness: a later publish
    * finding no state for its prior snapshot falls back to the full
    * recompute and rewrites fresh state. Returns deleted ids. */
  def expireCanonState(spark: SparkSession, statePath: String,
      tablePath: String, keepLast: Int,
      orphanSafetyMs: Long = 6 * 3600 * 1000L): Seq[String] = {
    val keep = math.max(1, keepLast)
    val stateP = new org.apache.hadoop.fs.Path(statePath)
    val fs = stateP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(stateP)) return Seq.empty
    val manP = s"$tablePath/manifest"
    val committed: Seq[String] =
      if (!graft.sources.Fs.exists(spark, manP)) Seq.empty
      else spark.read.parquet(manP)
        .groupBy(col("snapshotId"))
        .agg(max(col("committedAt")).as("committedAt"))
        .orderBy(col("committedAt").desc, col("snapshotId").desc)
        .select(col("snapshotId"))
        .collect().map(_.getString(0)).toSeq
    // chain-safe: a kept snapshot's state may be a delta CHAIN whose
    // base dirs belong to older snapshots — those must survive too
    // (the state-side twin of expireSnapshots' base-chain keep)
    val keepIds = {
      val direct = committed.take(keep)
      direct.toSet ++ direct.flatMap(id =>
        stateChain(spark, statePath, id).getOrElse(Seq.empty))
    }
    val committedIds = committed.toSet
    val now = System.currentTimeMillis()
    fs.listStatus(stateP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("snap="))
      .flatMap { st =>
        val id = st.getPath.getName.stripPrefix("snap=")
        val expire =
          if (keepIds.contains(id)) false
          else if (committedIds.contains(id)) true
          else now - st.getModificationTime > orphanSafetyMs
        if (expire && fs.delete(st.getPath, true)) Some(id) else None
      }
  }

  /** Canon state written NEXT TO each published snapshot:
    *  - `canon`  — the snapshot's full mined canon map;
    *  - `pairs`  — alias-pair refcounts (k, entity, ndocs) over the
    *    snapshot's resolved corpus (IncrementalCanon.pairCounts);
    *  - `docs`   — per doc at publish time: latest (docId, batchId)
    *    PLUS the doc's content fingerprint over the snapshot's
    *    WRITTEN triples (nTriples, h64 = xor of the row hashes
    *    [[graft.sources.ContentHash]] combines) — what lets the next
    *    overlay publish derive the removed-rows hash of its re-emitted
    *    docs from state instead of scanning the base snapshot;
    *  - `meta`   — lastBatchId: the highest accumulated batch folded
    *    into this snapshot (the next publish's delta floor).
    *
    * Ordering vs the snapshot commit: the per-doc fingerprints are
    * computed from the data READ BACK off the committed snapshot, so
    * state lands AFTER the manifest row. A crash in between leaves a
    * committed snapshot with no state — `meta` is written last, the
    * reader probes for it, and a missing/partial state simply routes
    * the next publish through the full fallback, which rewrites fresh
    * state. Nothing ever reads a half-written state. */
  private def writeState(spark: SparkSession, statePath: String,
      snapshotId: String, canon: DataFrame, pairs: DataFrame,
      docs: DataFrame, lastBatchId: Long): Unit = {
    import spark.implicits._
    val d = stateDir(statePath, snapshotId)
    canon.write.mode("overwrite").parquet(s"$d/canon")
    pairs.write.mode("overwrite").parquet(s"$d/pairs")
    docs.select(col("docId"), col("batchId").cast("long").as("batchId"),
        col("nTriples").cast("long").as("nTriples"),
        col("h64").cast("long").as("h64"))
      .write.mode("overwrite").parquet(s"$d/docs")
    writeMeta(spark, d, lastBatchId, None)
  }

  // ---- CHAINED canon state: O(delta) publish-time state I/O ---------
  //
  // writeState above rewrites three tables that all grow with the
  // CORPUS (canon map ~ vocabulary, pair refcounts ~ vocabulary, per-
  // doc fingerprints ~ doc count) — with overlay snapshots making the
  // DATA write O(delta), these state rewrites were the last O(corpus)
  // I/O term left in an incremental publish. A delta publish now
  // writes only the CHANGED state rows plus a base pointer in meta,
  // and readers resolve the chain last-writer-wins. No tombstones can
  // occur by construction: under the adds-only invariant canon labels
  // never revert to self (components only merge, minima only
  // decrease), a touched pair's refcount stays positive (zero forces
  // the full fallback, which rewrites full state), and docs are never
  // deleted (a superseded doc is re-emitted, never dropped).

  private def writeMeta(spark: SparkSession, dir: String,
      lastBatchId: Long, baseState: Option[String]): Unit = {
    import spark.implicits._
    Seq((lastBatchId, baseState.orNull))
      .toDF("lastBatchId", "baseState")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** meta of one state dir: (lastBatchId, baseState). A legacy layout
    * (bare lastBatchId column, pre-chaining) reads as a FULL state. */
  private def readMeta(spark: SparkSession,
      dir: String): (Long, Option[String]) = {
    val df = spark.read.parquet(s"$dir/meta")
    val cols = df.columns
    val r = df.head()
    val last = r.getLong(cols.indexOf("lastBatchId"))
    val base =
      if (!cols.contains("baseState")) None
      else Option(r.getString(cols.indexOf("baseState")))
    (last, base)
  }

  /** Base-first chain of state snapshot ids ending at `snapshotId`.
    * None when any link is missing or the chain is corrupt (expired
    * base, crashed write, cycle, over-deep) — the caller then takes
    * the full publish, which rewrites fresh flat state. A meta dir
    * that EXISTS but fails to read (a crash mid-meta-write left a
    * partial parquet, or an empty one) counts as corrupt too —
    * throwing here would wedge every later incremental publish on a
    * state the contract says is simply "unreadable as a chain tip". */
  private def stateChain(spark: SparkSession, statePath: String,
      snapshotId: String, maxWalk: Int = 64): Option[Seq[String]] = {
    val acc = scala.collection.mutable.ListBuffer.empty[String]
    var cur = snapshotId
    while (acc.size < maxWalk) {
      val d = stateDir(statePath, cur)
      if (!graft.sources.Fs.exists(spark, s"$d/meta")) return None
      acc.prepend(cur)
      scala.util.Try(readMeta(spark, d)) match {
        case scala.util.Failure(e) =>
          // log the CAUSE: a persistent environmental failure (FS/IO,
          // permissions) must be distinguishable from a genuinely
          // corrupt chain tip — both degrade to the full-publish path,
          // but only one should page storage (round-5 ADVICE)
          System.err.println(s"[publish] canon state meta unreadable " +
            s"at $d (treating as corrupt chain tip): ${e.getMessage}")
          return None
        case scala.util.Success((_, None)) => return Some(acc.toList)
        case scala.util.Success((_, Some(b))) =>
          if (acc.contains(b)) return None // cycle: corrupt state
          cur = b
      }
    }
    None
  }

  /** Last-writer-wins resolution of a chained keyed table: each chain
    * position holds at most one row per key, later positions override
    * earlier ones (max over a __pos-led struct — (key, __pos) is
    * unique, so the pick is deterministic). */
  private def lwwResolve(dfs: Seq[DataFrame],
      keys: Seq[String]): DataFrame =
    if (dfs.size == 1) dfs.head
    else {
      val u = dfs.zipWithIndex
        .map { case (df, i) => df.withColumn("__pos", lit(i)) }
        .reduce(_.unionByName(_))
      val payload =
        u.columns.filterNot(c => keys.contains(c) || c == "__pos").toSeq
      u.groupBy(keys.map(col): _*)
        .agg(max(struct((col("__pos") +: payload.map(col)): _*)).as("__m"))
        .select(keys.map(col) ++
          payload.map(p => col(s"__m.$p").as(p)): _*)
    }

  private final case class CanonState(canon: DataFrame, pairs: DataFrame,
      docs: DataFrame, lastBatchId: Long, depth: Int)

  /** Resolve `snapshotId`'s canon state across its delta chain. The
    * frames are lazy plans over the chain's slim parquet dirs; `depth`
    * is the number of dirs (1 = flat). None routes the caller to the
    * full publish. */
  private def readState(spark: SparkSession, statePath: String,
      snapshotId: String): Option[CanonState] =
    stateChain(spark, statePath, snapshotId).flatMap { chain =>
      val dirs = chain.map(id => stateDir(statePath, id))
      def whole(sub: String) = dirs.forall(d =>
        graft.sources.Fs.exists(spark, s"$d/$sub"))
      if (!whole("canon") || !whole("pairs") || !whole("docs")) None
      else Some(CanonState(
        lwwResolve(dirs.map(d => spark.read.parquet(s"$d/canon")),
          Seq("entity")),
        lwwResolve(dirs.map(d => spark.read.parquet(s"$d/pairs")),
          Seq("k", "entity")),
        lwwResolve(dirs.map(d => spark.read.parquet(s"$d/docs")),
          Seq("docId")),
        readMeta(spark, dirs.last)._1,
        chain.size))
    }

  /** Delta state write — the O(delta) twin of [[writeState]]: only the
    * rows that changed vs `baseSnapshotId`'s state land on disk, plus
    * the base pointer in meta. Same crash contract as writeState: meta
    * lands LAST, so a half-written delta is unreadable as a chain tip
    * and the next publish takes the full fallback. */
  private def writeStateDelta(spark: SparkSession, statePath: String,
      snapshotId: String, baseSnapshotId: String, canonDelta: DataFrame,
      pairsDelta: DataFrame, docsDelta: DataFrame,
      lastBatchId: Long): Unit = {
    val d = stateDir(statePath, snapshotId)
    canonDelta.select(col("entity"), col("canonical"))
      .write.mode("overwrite").parquet(s"$d/canon")
    pairsDelta.select(col("k"), col("entity"),
        col("ndocs").cast("long").as("ndocs"))
      .write.mode("overwrite").parquet(s"$d/pairs")
    docsDelta.select(col("docId"),
        col("batchId").cast("long").as("batchId"),
        col("nTriples").cast("long").as("nTriples"),
        col("h64").cast("long").as("h64"))
      .write.mode("overwrite").parquet(s"$d/docs")
    writeMeta(spark, d, lastBatchId, Some(baseSnapshotId))
  }

  /** Flatten a snapshot's state chain in place: rewrite the three
    * tables fully resolved (table swaps first, meta pointer-flip
    * LAST). Crash-safe: a fully-resolved table read as a chain tip
    * overrides everything beneath it, so any completed swap keeps the
    * resolution exact; a crash INSIDE a swap's rename window leaves
    * that sub-table missing, which [[readState]] detects and routes
    * to the full publish. Returns false when the state is already
    * flat, legacy, or unreadable. */
  def compactState(spark: SparkSession, statePath: String,
      snapshotId: String): Boolean =
    readState(spark, statePath, snapshotId) match {
      case Some(st) if st.depth > 1 =>
        val d = stateDir(statePath, snapshotId)
        def swap(sub: String, df: DataFrame): Unit = {
          val tmp = s"$d/${sub}__compact"
          df.write.mode("overwrite").parquet(tmp)
          graft.sources.Fs.swapInto(spark, tmp, s"$d/$sub")
        }
        // materialize BEFORE swapping: the lazy plans read the very
        // dirs being replaced
        swap("canon", st.canon.localCheckpoint())
        swap("pairs", st.pairs.localCheckpoint())
        swap("docs", st.docs.localCheckpoint())
        writeMeta(spark, d, st.lastBatchId, None)
        true
      case _ => false
    }

  /** Per-doc content fingerprints of a written triple set — the same
    * per-row hash [[graft.sources.ContentHash.xorLong]] xor-combines
    * globally, grouped by doc: xor of the per-doc h64s == the
    * snapshot's contentHash, which is what makes per-doc removal
    * algebra exact. */
  private def perDocStats(triples: DataFrame): DataFrame =
    triples.withColumn("__h",
        xxhash64(col("subj"), col("pred"), col("obj"), col("docId")))
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("nTriples"),
        expr("bit_xor(__h)").as("h64"))

  /** `docs` frame carrying (nTriples, h64) for every doc in `latest`,
    * zero-filled for docs that emitted no triples. */
  private def docsWithStats(latest: DataFrame, stats: DataFrame): DataFrame =
    latest.join(stats, Seq("docId"), "left")
      .select(col("docId"), col("batchId"),
        coalesce(col("nTriples"), lit(0L)).as("nTriples"),
        coalesce(col("h64"), lit(0L)).as("h64"))

  /** FULL dynamic publish that also writes canon state — the
    * incremental path's base case (first publish) and its fallback
    * (alias evidence retracted). Same stages as
    * [[publishSnapshotDynamic]] plus the state write. */
  private def fullDynamicPublish(spark: SparkSession, mentionsPath: String,
      tablePath: String, snapshotId: String, statePath: String,
      note: String): DynPublish = {
    import spark.implicits._
    if (!graft.sources.Fs.hasPartitions(spark, mentionsPath, "batchId=")) {
      rebuildEntIdx(spark, statePath,
        Seq.empty[(String, String)].toDF("entity", "docId"))
      val (n, h) = graft.sources.GraphTables.write(
        spark.emptyDataset[graft.core.Triple].toDF(), tablePath, snapshotId)
      // the canon state must carry the DICTIONARY forest even with no
      // accumulated mentions: a later incremental publish seeds CC from
      // the prior state's forest alone, and an empty forest would lose
      // the static-dictionary merges (divergence vs the full path)
      writeState(spark, statePath, snapshotId,
        graft.canon.ConnectedComponents.canonicalMap(
          graft.link.Linker.aliasDf(spark)),
        Seq.empty[(String, String, Long)].toDF("k", "entity", "ndocs"),
        Seq.empty[(String, Long, Long, Long)]
          .toDF("docId", "batchId", "nTriples", "h64"), -1L)
      return DynPublish(n, h, incremental = false, note)
    }
    val all = spark.read.parquet(mentionsPath)
    val latest = latestTouches(spark, mentionsPath, all).localCheckpoint()
    val linked = all.join(latest, Seq("docId", "batchId"))
      .drop("batchId").persist()
    try {
      // driver-gated fast path (see Pipeline.dynamicCanonMapGated):
      // same rows, one job instead of the serial star-round chain
      val (canonMap, canonRows) =
        graft.Pipeline.dynamicCanonMapGated(spark, linked)
      val canon = graft.Pipeline.canonicalize(linked, canonMap,
        hintBroadcast = canonRows <= graft.Pipeline.BroadcastCanonMaxRows)
      val triples = graft.triples.TripleEmit
        .emitFused(canon.as[graft.triples.TripleEmit.CanonMention]).toDF()
      val lastB = latest.agg(max(col("batchId")).cast("long")).head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
      // index rebuild strictly BEFORE the manifest commit (crash in
      // between = over-coverage, benign)
      rebuildEntIdx(spark, statePath, linked)
      val (n, h) =
        graft.sources.GraphTables.write(triples, tablePath, snapshotId)
      // per-doc fingerprints of the data ACTUALLY WRITTEN (read back),
      // so the next overlay publish's removal algebra describes the
      // durable base, not a recomputation of the input plan
      writeState(spark, statePath, snapshotId, canonMap,
        graft.canon.IncrementalCanon.pairCounts(
          graft.canon.IncrementalCanon.docPairs(linked)),
        docsWithStats(latest, perDocStats(
          graft.sources.GraphTables.readOwnData(spark, tablePath,
            snapshotId))),
        lastB)
      DynPublish(n, h, incremental = false, note)
    } finally { linked.unpersist(); () }
  }

  /** Incremental dynamic-canon publish: identical OUTPUT to
    * [[publishSnapshotDynamic]] (asserted in StreamingSpec), with
    * publish COST — compute AND I/O — bounded by the ingest delta
    * instead of the accumulated corpus whenever the delta only ADDS
    * alias evidence.
    *
    * Compute side: the delta's batch partitions (partition-pruned on
    * `batchId > lastBatchId`), the superseded docs' old partitions
    * (pruned to their recorded batchIds), the vocabulary-sized
    * pair/canon state, a ~2-round seeded CC over the prior star
    * forest, and the re-emit of CHANGED docs only. The changed-entity
    * doc probe goes through the entity→doc index (entity-hash-bucketed
    * pairs next to the state, appended per delta, rebuilt distinct on
    * every full publish) pruned to the changed entities' buckets —
    * with a corpus-scan fallback while the index's completeness
    * marker is absent (legacy accumulation).
    *
    * I/O side: the snapshot is published as an OVERLAY
    * ([[graft.sources.GraphTables.writeDelta]]) — only the re-emitted
    * docs' triples are written, the base's untouched rows are a
    * pointer, and the manifest rowCount/contentHash are derived by
    * xor algebra from the base's committed row plus per-doc
    * fingerprints kept in the publish state. The prior path rewrote
    * (and re-hashed) the ENTIRE corpus per publish, so "incremental"
    * was O(delta) compute on top of O(corpus) I/O. Overlay chains are
    * depth-bounded: once the prior chain reaches `maxChain`, this
    * publish MATERIALIZES (full write of resolved content — the
    * compaction), amortizing the corpus-sized write over `maxChain`
    * deltas. Readers resolve chains transparently; GC keeps base
    * chains of kept snapshots alive.
    *
    * The publish STATE rides the same pattern: canon map, pair
    * refcounts, and per-doc fingerprints all grow with the corpus, so
    * rewriting them per publish ([[writeState]]) was the last
    * O(corpus) I/O term. An overlay publish writes only the CHANGED
    * state rows with a base pointer ([[writeStateDelta]]), readers
    * resolve last-writer-wins ([[readState]] — sound without
    * tombstones because adds-only canon labels never revert, touched
    * refcounts stay positive, and docs are never deleted), and the
    * same `maxChain` gate materializes state and data together.
    *
    * Falls back to the full recompute — same output, corpus-sized
    * cost — when (a) no prior committed snapshot or no state for it
    * exists, (b) the prior state predates the per-doc-fingerprint
    * layout, or (c) the delta RETRACTS alias evidence (a pair
    * refcount hits zero: an edge removal can split a component,
    * which seeding cannot express). The fallback rewrites fresh
    * state, so one retraction never disables later incrementality. */
  def publishSnapshotDynamicIncremental(spark: SparkSession,
      mentionsPath: String, tablePath: String, snapshotId: String,
      statePath: String, maxChain: Int = 8): DynPublish = {
    import spark.implicits._
    import graft.canon.IncrementalCanon
    import graft.sources.{Fs, GraphTables}
    require(Fs.exists(spark, mentionsPath),
      s"no mention accumulation at $mentionsPath — nothing was ever " +
        "committed (triplesStream needs mentionsPath=Some(...))")
    val prior =
      if (Fs.exists(spark, s"$tablePath/manifest"))
        GraphTables.latestSnapshot(spark, tablePath)
      else None
    val priorState = prior.flatMap(id => readState(spark, statePath, id))
    if (prior.isEmpty || priorState.isEmpty)
      return fullDynamicPublish(spark, mentionsPath, tablePath, snapshotId,
        statePath,
        if (prior.isEmpty) "first publish — no prior snapshot"
        else s"no complete canon state chain for prior " +
          s"snapshot ${prior.get}")
    val pst = priorState.get
    val lastB = pst.lastBatchId
    // a resolved chain is a union+group plan re-executed per action —
    // pin the frames the branches below read more than once; a flat
    // (depth-1) state is the raw parquet read and needs no pinning
    def pin(df: DataFrame): DataFrame =
      if (pst.depth > 1) df.localCheckpoint() else df
    val priorCanon = pin(pst.canon)
    val priorPairs = pin(pst.pairs)
    val priorDocs = pin(pst.docs)
    if (!priorDocs.columns.contains("h64"))
      return fullDynamicPublish(spark, mentionsPath, tablePath, snapshotId,
        statePath, "prior state lacks per-doc content fingerprints " +
          "(pre-overlay layout) — full republish refreshes it")
    // depth gate decided UP FRONT: at maxChain the publish materializes
    // the resolved content (corpus write, amortized) instead of
    // growing the chain — this includes the empty-delta copy-forward.
    // The STATE chain rides the same gate (its dir count = edges + 1),
    // so both flatten together even if one was compacted externally.
    val priorDepth = math.max(
      GraphTables.chainDepth(spark, tablePath, prior.get), pst.depth - 1)
    val all = spark.read.parquet(mentionsPath)
    // the DELTA: batches after the prior publish's floor — partition-
    // pruned reads on both the mention accumulation and the roster
    val deltaM = all.filter(col("batchId") > lastB)
    val rosterP = rosterPath(mentionsPath)
    val deltaTouches0 = (
      if (Fs.hasPartitions(spark, rosterP, "batchId="))
        spark.read.parquet(rosterP).select(col("docId"), col("batchId"))
          .filter(col("batchId") > lastB)
          .unionByName(deltaM.select(col("docId"), col("batchId")))
      else deltaM.select(col("docId"), col("batchId")))
      .groupBy(col("docId"))
      .agg(max(col("batchId")).cast("long").as("batchId"))
    val deltaLatest = deltaTouches0.localCheckpoint()
    val newLastB = deltaLatest.agg(max(col("batchId"))).head() match {
      case r if r.isNullAt(0) => lastB
      case r => math.max(lastB, r.getLong(0))
    }
    if (deltaLatest.isEmpty) {
      // nothing ingested since the prior publish: the new snapshot is
      // a copy-forward of the prior one, state included — a pure
      // POINTER overlay (zero rows written) below the depth gate, a
      // materializing rewrite at it
      val (n, h) =
        if (priorDepth + 1 <= maxChain) {
          // pure pointer forward in DATA and in STATE — an idle stream
          // publishing on a schedule costs O(1), not O(corpus state)
          val r = GraphTables.writeDelta(spark, tablePath, snapshotId,
            prior.get, spark.emptyDataset[graft.core.Triple].toDF(),
            priorDocs.select(col("docId")).limit(0), 0L, 0L)
          writeStateDelta(spark, statePath, snapshotId, prior.get,
            priorCanon.limit(0), priorPairs.limit(0),
            priorDocs.limit(0), lastB)
          r
        } else {
          val kept = GraphTables.readSnapshot(spark, tablePath, prior.get)
            .select(col("subj"), col("pred"), col("obj"), col("docId"),
              col("score"))
          val r = GraphTables.write(kept, tablePath, snapshotId)
          writeState(spark, statePath, snapshotId, priorCanon, priorPairs,
            priorDocs, lastB)
          r
        }
      return DynPublish(n, h, incremental = true, "empty delta")
    }
    val deltaLinked = deltaM
      .join(deltaLatest, Seq("docId", "batchId")).drop("batchId").persist()
    try {
      // superseded docs: delta docs the prior state already knew —
      // their OLD pairs are the refcount decrements. Their old rows
      // live in the batch partitions the prior state recorded, so the
      // read is pruned to exactly those batchIds.
      val superseded = priorDocs
        .join(deltaLatest.select(col("docId")), Seq("docId"), "left_semi")
        .localCheckpoint()
      val oldBatchIds = superseded.select(col("batchId")).distinct()
        .collect().map(_.getLong(0))
      // localCheckpoint: read twice below (the unevidenced probe and
      // IncrementalCanon.docPairs) — uncached, each reference re-ran
      // the pruned batch-partition scan + semi-join (round-5 ADVICE)
      val oldMents =
        if (oldBatchIds.isEmpty) deltaLinked.limit(0)
        else all.filter(col("batchId").isin(oldBatchIds: _*))
          .join(superseded, Seq("docId", "batchId"), "left_semi")
          .localCheckpoint()
      // decrement EVIDENCE must still exist: a compaction run while
      // these re-ingests sat unpublished folds the superseded
      // versions' rows away (mention rows AND roster touch alike —
      // compactAccumulation keeps them only when passed
      // publishedStateTouches), and the decrements would then read
      // silently empty — refcounts stay high and a genuine retraction
      // would pass as adds-only, publishing a STALE merged canon. A
      // superseded version with neither a mention row nor a roster
      // touch left is unverifiable: take the full publish, which
      // needs no decrements and rewrites fresh state. A version that
      // legitimately had zero linked mentions always kept its roster
      // touch (or, pre-roster, could never have entered the prior
      // state's doc table at all), so this never false-positives.
      val unevidenced =
        if (oldBatchIds.isEmpty) 0L
        else {
          val rosterOld =
            if (Fs.hasPartitions(spark, rosterP, "batchId="))
              spark.read.parquet(rosterP)
                .select(col("docId"), col("batchId"))
                .filter(col("batchId").isin(oldBatchIds: _*))
                .join(superseded, Seq("docId", "batchId"), "left_semi")
                .select(col("docId"))
            else superseded.select(col("docId")).limit(0)
          superseded.join(
              oldMents.select(col("docId")).unionByName(rosterOld),
              Seq("docId"), "left_anti")
            .count()
        }
      if (unevidenced > 0)
        return fullDynamicPublish(spark, mentionsPath, tablePath,
          snapshotId, statePath,
          s"$unevidenced superseded doc versions left no rows in the " +
            "accumulation (compacted without publishedStateTouches?) — " +
            "decrements unverifiable, full recanonicalization")
      val pd = IncrementalCanon.mergePairs(priorPairs,
        IncrementalCanon.docPairs(deltaLinked),
        IncrementalCanon.docPairs(oldMents))
      if (pd.removedCount > 0)
        return fullDynamicPublish(spark, mentionsPath, tablePath,
          snapshotId, statePath,
          s"alias evidence retracted (${pd.removedCount} pairs) — " +
            "full recanonicalization")
      // keep the entity→doc index current for FUTURE publishes — an
      // append of delta-sized pairs, strictly before this snapshot's
      // manifest commit (crash in between = over-coverage, benign); a
      // legacy index without the completeness marker stays untouched
      // until the next full publish rebuilds it
      val idxUsable = entIdxUsable(spark, statePath)
      if (idxUsable) appendEntIdx(spark, statePath, deltaLinked)
      // seeded CC from the prior star forest + added-pair edges
      val newCanon = IncrementalCanon
        .seededCanonMap(priorCanon, priorPairs, pd.added).localCheckpoint()
      // materialize: a full-outer join over two vocabulary-sized maps,
      // read by the isEmpty probe, the bucket collection, and three
      // semi-joins — re-executing it per action pays the join 4×
      val changed = IncrementalCanon.changedEntities(newCanon, priorCanon)
        .localCheckpoint()
      // docs OUTSIDE the delta whose triples the relabeling touches:
      // the entity→doc index pruned to the changed entities' buckets
      // (a ≤64-value driver-side isin — partition pruning needs no
      // DPP), falling back to a two-column projection scan of the
      // accumulation when the index is not (yet) complete. Stale pairs
      // and stale accumulation rows alike may over-select a doc —
      // harmless, re-emission from its latest version is correct
      // either way. The common no-novel-alias delta changes NO labels
      // — probe the tiny changed set first and skip the lookup
      // entirely then.
      val affected =
        if (changed.isEmpty)
          deltaLatest.select(col("docId")).limit(0).localCheckpoint()
        else {
          val candidates =
            if (idxUsable) {
              val bks = changed.select(ebucket(col("entity")).as("b"))
                .distinct().collect().map(_.getInt(0))
              spark.read.parquet(entIdxDir(statePath))
                .filter(col("ebucket").isin(bks.toSeq: _*))
                .join(changed, Seq("entity"), "left_semi")
            } else all.select(col("docId"), col("entity"))
              .join(changed, Seq("entity"), "left_semi")
          candidates
            .select(col("docId")).distinct()
            .join(deltaLatest.select(col("docId")), Seq("docId"),
              "left_anti")
            .localCheckpoint()
        }
      val affLatest = priorDocs.join(affected, Seq("docId"), "left_semi")
      val affMents = all.join(affLatest, Seq("docId", "batchId"))
        .drop("batchId")
      val reMents = deltaLinked
        .unionByName(affMents.select(deltaLinked.columns.map(col): _*))
      val canon = graft.Pipeline.canonicalize(reMents, newCanon,
        hintBroadcast =
          newCanon.count() <= graft.Pipeline.BroadcastCanonMaxRows)
      val newTriples = graft.triples.TripleEmit
        .emitFused(canon.as[graft.triples.TripleEmit.CanonMention]).toDF()
        .select(col("subj"), col("pred"), col("obj"), col("docId"),
          col("score"))
      val reDocs = deltaLatest.select(col("docId"))
        .union(affected.select(col("docId"))).distinct()
        .localCheckpoint()
      // removal algebra over the STATE's per-doc fingerprints —
      // O(#docs) slim rows, never a scan of the base snapshot's data
      val remRow = priorDocs.join(reDocs, Seq("docId"), "left_semi")
        .agg(sum(col("nTriples")), expr("bit_xor(h64)")).head()
      val removedRows = if (remRow.isNullAt(0)) 0L else remRow.getLong(0)
      val removedHash = if (remRow.isNullAt(1)) 0L else remRow.getLong(1)
      val growChain = priorDepth + 1 <= maxChain
      val (n, h, mode) =
        if (growChain)
          GraphTables.writeDelta(spark, tablePath, snapshotId, prior.get,
            newTriples, reDocs, removedRows, removedHash) match {
            case (n0, h0) => (n0, h0, "overlay")
          }
        else {
          val kept = GraphTables.readSnapshot(spark, tablePath, prior.get)
            .select(col("subj"), col("pred"), col("obj"), col("docId"),
              col("score"))
            .join(reDocs, Seq("docId"), "left_anti")
            .select(col("subj"), col("pred"), col("obj"), col("docId"),
              col("score"))
          GraphTables.write(kept.unionByName(newTriples),
            tablePath, snapshotId) match {
            case (n0, h0) =>
              (n0, h0, s"materialized at chain depth $priorDepth")
          }
        }
      // re-emitted docs' fingerprints from the data actually written
      // (overlay mode reads back only the delta rows); delta docs ride
      // their new batchId, affected docs keep their prior one
      val touchedBatch = priorDocs
        .join(affected, Seq("docId"), "left_semi")
        .select(col("docId"), col("batchId"))
        .unionByName(deltaLatest)
      val reStats = docsWithStats(touchedBatch, perDocStats(
        GraphTables.readOwnData(spark, tablePath, snapshotId)))
      if (growChain)
        // O(delta) state: only the relabeled entities' canon rows, the
        // touched pair refcounts, and the re-emitted docs' fingerprints
        writeStateDelta(spark, statePath, snapshotId, prior.get,
          newCanon.join(changed, Seq("entity"), "left_semi"),
          pd.changed, reStats, newLastB)
      else
        writeState(spark, statePath, snapshotId, newCanon, pd.merged,
          priorDocs.join(reDocs, Seq("docId"), "left_anti")
            .select(col("docId"), col("batchId"), col("nTriples"),
              col("h64"))
            .unionByName(reStats), newLastB)
      DynPublish(n, h, incremental = true,
        s"incremental (adds-only alias delta, $mode)")
    } finally { deltaLinked.unpersist(); () }
  }

  /** Streaming exact-dedup by content fingerprint — the streaming
    * member of the dedup family (DedupOps.exactGroups is the batch
    * twin). dropDuplicatesWithinWatermark keeps the seen-fingerprint
    * state only within the watermark delay, so the state store is
    * bounded by ingest-rate x delay at any corpus size — a plain
    * dropDuplicates on a stream would grow state forever. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .withColumn("fingerprint",
        graft.ops.TextOps.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Watermarked stream-stream SELF-join: unordered pairs of events of
    * the same user within a 5-minute range, each pair emitted exactly
    * once (both arguments must be the same stream — the pair-dedup
    * predicate below assumes every pair is seen from both directions;
    * for two DISTINCT streams drop it and keep only the range bound).
    * Both join state stores are pruned by the watermark + the
    * time-range condition — the state-bounding pattern a 100 TB
    * streaming join needs (without the range bound, each side buffers
    * forever). */
  def streamStreamJoin(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.withColumn("a_ts", col("ts").cast("timestamp"))
      .withWatermark("a_ts", "10 minutes")
      .select(col("user_id"), col("a_ts"), col("event_id").as("a_id"))
    val r = b.withColumn("b_ts", col("ts").cast("timestamp"))
      .withWatermark("b_ts", "10 minutes")
      .select(col("user_id").as("b_uid"), col("b_ts"),
        col("event_id").as("b_id"))
    // each unordered pair is emitted exactly once: via (a=earlier,
    // b=later) when timestamps differ, by id order on ties. A plain
    // a_id < b_id here would silently DROP pairs whose earlier event
    // has the larger id (the reverse direction fails b_ts >= a_ts).
    l.join(r,
      col("user_id") === col("b_uid") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES") &&
        (col("b_ts") > col("a_ts") || col("a_id") < col("b_id")))
      .select(col("user_id"), col("a_id"), col("b_id"))
  }

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, startMs: Long, endMs: Long,
      n_events: Int)

  /** Gap-based sessionization with explicit state (the
    * KeyValueGroupedDataset custom-state surface). EVENT-time timeout:
    * the watermark advancing past last+gap flushes a user's FINAL
    * session and removes the state entry — deterministic and
    * replay-safe where a processing-time timer depends on wall clock
    * (and a timer-driven query keeps scheduling empty timer batches, so
    * it never quiesces under an AvailableNow backfill); with NoTimeout
    * the last session would never be emitted and the store would grow
    * by one entry per user forever. In batch mode the whole group
    * arrives at once, so timeouts are moot and the trailing open
    * session simply stays unemitted (same contract). */
  def sessionize(events: Dataset[Ev], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min/max, not assignment: a LATE cross-batch event
                  // inside the gap must extend the session's bounds,
                  // never move `last` backward (which would corrupt the
                  // next gap decision and could emit end < start)
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  out += Session(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush timer rides the watermark, clamped strictly above
              // it (a session whose gap already expired flushes at the
              // next watermark tick). Batch mode has no watermark and
              // ignores event-time timers — skip the call there.
              try {
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
              } catch { case _: UnsupportedOperationException => () }
            }
            out.result().iterator
          }
      }
  }
}
