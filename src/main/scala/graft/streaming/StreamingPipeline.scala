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
    * canon+emit stages over the accumulated union. */
  def triplesStream(files: Dataset[SourceFileHashed], outPath: String,
      manifestPath: String, checkpoint: String,
      mentionsPath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
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
        // any ordering. A file source gives no within-batch order, so
        // the survivor is picked deterministically: max (commit,
        // sha256). Across batches the batchId ordering still governs.
        val vw = org.apache.spark.sql.expressions.Window
          .partitionBy(graft.core.DocId.column)
          .orderBy(col("commit").desc, col("sha256").desc)
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
    * [[triplesStream]] keeps a single deterministically-chosen version
    * per doc, so batchId granularity suffices) — a bare union would keep stale
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
    * [[triplesStream]] keeps a single deterministically-chosen version
    * per doc, so batchId granularity is sufficient here. */
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
    // last-writer-wins resolved on the union of the DOC ROSTER and the
    // mention rows' own (docId, batchId) projection:
    //  - the roster records every doc a batch TOUCHED, including a
    //    re-ingest whose new content has zero linked mentions — mention
    //    rows alone cannot say the doc was seen again, so max(batchId)
    //    over mentions alone would keep the stale batch's mentions;
    //  - mention rows cover batches accumulated BEFORE the roster
    //    existed (a legacy accumulation resumed under this code has no
    //    roster rows for those batches — joining against the roster
    //    alone would silently drop every pre-roster doc; with no roster
    //    dir at all the read itself would fail).
    // The max over the union is the true latest touch in every case
    // except a PRE-roster zero-mention re-ingest, which left no record
    // of itself anywhere and is unknowable by construction.
    val mentionTouches = all.select(col("docId"), col("batchId"))
    val rosterP = rosterPath(mentionsPath)
    val touched =
      if (graft.sources.Fs.hasPartitions(spark, rosterP, "batchId="))
        spark.read.parquet(rosterP).select(col("docId"), col("batchId"))
          .unionByName(mentionTouches)
      else mentionTouches
    val latest = touched
      .groupBy(col("docId"))
      .agg(max(col("batchId")).as("batchId"))
    val linked = all.join(latest, Seq("docId", "batchId"))
      .drop("batchId").persist()
    try {
      val canonMap = graft.Pipeline.dynamicCanonMap(spark, linked)
        .localCheckpoint()
      val canon = graft.Pipeline.canonicalize(linked, canonMap,
        hintBroadcast =
          canonMap.count() <= graft.Pipeline.BroadcastCanonMaxRows)
      val triples = graft.triples.TripleEmit
        .emitFused(canon.as[graft.triples.TripleEmit.CanonMention]).toDF()
      graft.sources.GraphTables.write(triples, tablePath, snapshotId)
    } finally { linked.unpersist(); () }
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
