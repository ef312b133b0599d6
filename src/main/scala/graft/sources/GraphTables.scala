package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-LAYOUT graph tables (no Iceberg jars in the sandbox —
  * SURVEY §7.0): partitioned parquet + a snapshot manifest table,
  * matching the north-star's "partitioned Iceberg graph tables
  * bucketed by canonical-entity hash".
  *
  * Layout: `path/data/pred=<p>/bucket=<b>/` parquet files
  *  - partition column `pred`: per-predicate partition PRUNING — a
  *    query over `calls` edges never touches `documented_as` files
  *    (asserted in PlanSpec);
  *  - `bucket` = hash(subj) % nBuckets: co-locates each canonical
  *    entity's out-edges, so entity-keyed reads touch one bucket and
  *    same-bucket joins between graph tables can skip the shuffle;
  *  - `path/manifest`: one row per snapshot with row counts + content
  *    hash — the read side can verify integrity and pick a snapshot.
  */
/** Row-set fingerprint shared by the graph-table publish and the
  * streaming batch commit: xxhash64 over the named columns,
  * xor-combined (order-independent), hex. (ResumableStage keeps its own
  * per-bucket variant over struct(sorted cols) — see Manifest.scala.) */
object ContentHash {
  /** (rowCount, xor-combined xxhash64) as a raw Long — the form the
    * DELTA-snapshot math needs: xor is order-independent AND
    * self-inverse, so a snapshot differing from a base by (removed,
    * added) row sets has hash
    * `base ^ xorLong(removed) ^ xorLong(added)` — an O(delta)
    * update of an O(corpus) fingerprint. */
  def xorLong(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    val r = df
      .withColumn("__h", xxhash64(cols.map(col): _*))
      .agg(count(lit(1)), coalesce(expr("bit_xor(__h)"), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  def hex(df: DataFrame, cols: Seq[String]): (Long, String) = {
    val (n, x) = xorLong(df, cols)
    (n, "%016x".format(x))
  }

  def parseHex(h: String): Long = java.lang.Long.parseUnsignedLong(h, 16)
}

/** THE Hadoop-FS existence probes for manifest/snapshot path checks
  * (ResumableStage, GraphTables, StreamingPipeline). java.io.File on
  * HDFS/S3 always answers "missing", which turns restart/read guards
  * into silent recomputes or fabricated empty reads — probe via the
  * FileSystem resolved from the path itself. */
object Fs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Does `dir` hold any `prefix`-named partition subdir? A parquet
    * write whose data had zero rows leaves a dir (just _SUCCESS) that
    * fails schema inference on read — callers probe before reading and
    * substitute an explicit empty frame. */
  def hasPartitions(spark: SparkSession, dir: String,
      prefix: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
  }

  /** Create (or truncate) an empty marker file. */
  def touch(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }

  /** Replace `path` with the freshly-written `tmpPath` (rename old
    * aside, rename tmp in, delete old) — the rewrite-compaction swap
    * (accumulation compaction, manifest pruning). NOT atomic: a crash
    * between the two renames leaves `path` absent with the data intact
    * under `path__old` / `tmpPath` for manual recovery — acceptable for
    * maintenance jobs run at quiescent points; a transactional table
    * format owns this swap in production. */
  def swapInto(spark: SparkSession, tmpPath: String, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmpPath)
    val o = new org.apache.hadoop.fs.Path(path + "__old")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(t), s"swapInto: missing tmp dir $tmpPath")
    fs.delete(o, true)
    if (fs.exists(p)) require(fs.rename(p, o), s"swapInto: cannot move $path aside")
    require(fs.rename(t, p), s"swapInto: cannot move $tmpPath into place")
    fs.delete(o, true)
    ()
  }
}

object GraphTables {

  val NumBuckets = 16

  /** THE table schema (write layout after partition-column reordering:
    * data columns first, then `pred`/`bucket` partition columns). The
    * empty-snapshot read path returns a frame of exactly this type, so
    * the two can never drift apart. */
  val TableSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("subj", StringType), StructField("obj", StringType),
      StructField("docId", StringType),
      StructField("score", DoubleType),
      StructField("pred", StringType),
      StructField("bucket", IntegerType)))
  }

  def bucketCol(subj: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(subj), lit(NumBuckets)).cast("int")

  private def snapDir(path: String, snapshotId: String): String =
    s"$path/data/snap=$snapshotId"

  /** Does this snapshot dir hold any written partition? (A bare probe
    * would commit rowCount=0 fingerprints and fabricate empty reads for
    * non-empty snapshots on HDFS/S3 — see [[Fs]].) */
  private def hasPartitions(spark: SparkSession, dir: String): Boolean =
    Fs.hasPartitions(spark, dir, "pred=")

  /** Publish one snapshot into its OWN directory, THEN append the
    * manifest row. The previous snapshot's data is never touched, so a
    * crash between the data write and the manifest append leaves
    * readers on the old snapshot with a still-consistent manifest (an
    * orphaned snap dir at worst) — publishing in place would destroy
    * the committed snapshot before the new one commits. Readers
    * resolve the snapshot via the manifest ([[read]] takes the
    * latest), which also gives time-travel reads ([[readSnapshot]]).
    * Returns (rowCount, contentHash) of the published data — callers
    * wanting the count must not re-scan the table they just wrote. */
  def write(triples: DataFrame, path: String,
      snapshotId: String): (Long, String) = {
    val spark = triples.sparkSession
    val withB = triples.withColumn("bucket", bucketCol(col("subj")))
    // explicit STATIC overwrite of THIS snapshot's dir: a republish of
    // the same snapshotId replaces it wholesale, including (pred,
    // bucket) partitions absent from the new data — immune to any
    // dynamic-overwrite session conf set elsewhere
    withB.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("pred", "bucket").parquet(snapDir(path, snapshotId))
    // fingerprint the data ACTUALLY WRITTEN (read back from disk), not
    // a recomputation of the input plan — recomputing would run the
    // whole upstream pipeline a second time and hash rows that were
    // never made durable
    import spark.implicits._
    // an EMPTY publish writes a snap dir with no pred=/bucket= subdirs
    // and no data files — read.parquet on it fails schema inference, so
    // probe first and commit (0, constant hash) like ResumableStage does
    val hasData = hasPartitions(spark, snapDir(path, snapshotId))
    val (n, h) =
      if (!hasData) (0L, "%016x".format(0L))
      else ContentHash.hex(
        spark.read.parquet(snapDir(path, snapshotId)),
        Seq("subj", "pred", "obj", "docId"))
    Seq((n, h, snapshotId, System.currentTimeMillis()))
      .toDF("rowCount", "contentHash", "snapshotId", "committedAt")
      .write.mode(SaveMode.Append).parquet(s"$path/manifest")
    (n, h)
  }

  /** The latest COMMITTED snapshot (manifest-resolved) — an
    * uncommitted/partial publish is invisible here. */
  def read(spark: SparkSession, path: String): DataFrame =
    readSnapshot(spark, path, latestSnapshot(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $path")))

  /** Time-travel read of one committed snapshot. A legitimately-empty
    * snapshot (rowCount=0 manifest row) has no data files to infer a
    * schema from — return an explicit empty frame of [[TableSchema]]
    * instead of a schema-inference failure. A snapshot whose manifest
    * row says rowCount>0 but whose data dir is gone (expired by
    * [[expireSnapshots]], or corrupted) FAILS instead of silently
    * reading as empty; an id with no manifest row at all (uncommitted
    * or unknown) fails likewise. */
  def readSnapshot(spark: SparkSession, path: String,
      snapshotId: String): DataFrame = {
    val dir = snapDir(path, snapshotId)
    if (Fs.exists(spark, baseMetaDir(dir))) resolveOverlay(spark, path, dir)
    else if (hasPartitions(spark, dir)) spark.read.parquet(dir)
    else {
      // probe the manifest's existence first (Manifest.committed
      // pattern): a consumer polling a fresh table must get the
      // contract's "not committed" failure, not a PATH_NOT_FOUND
      val committedRows =
        if (!Fs.exists(spark, s"$path/manifest")) None
        else spark.read.parquet(s"$path/manifest")
          .filter(col("snapshotId") === snapshotId)
          .orderBy(col("committedAt").desc)
          .select(col("rowCount")).limit(1)
          .collect().headOption.map(_.getLong(0))
      committedRows match {
        case Some(0L) =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            TableSchema)
        case Some(n) => throw new IllegalStateException(
          s"snapshot $snapshotId at $path has a committed manifest row " +
            s"($n rows) but no data dir — expired or corrupted")
        case None => throw new IllegalStateException(
          s"snapshot $snapshotId at $path is not committed")
      }
    }
  }

  // ------------------------------------------------------------------
  // DELTA (overlay) snapshots — O(delta) publish I/O
  // ------------------------------------------------------------------

  /** Sidecar dir marking a snapshot as an OVERLAY over a base
    * snapshot. The underscore prefix keeps it invisible to the parquet
    * reader's partition discovery over the same snap dir (the same
    * rule that hides `_SUCCESS`/`_temporary`), so the overlay's own
    * `pred=`/`bucket=` data and its chain metadata coexist in one dir
    * and one GC unit. Rows: `('base', baseSnapshotId)` and
    * `('depth', chainDepth)` exactly once each, plus
    * `('removed', docId)` for every doc whose BASE rows this snapshot
    * hides (always ≥ 1 row, so an empty-read probe is never
    * needed). */
  private def baseMetaDir(dir: String): String = s"$dir/_graft_base"

  /** (baseSnapshotId, recorded depth) of an overlay's sidecar; None
    * for a full snapshot. One read serves both fields. A sidecar
    * without a 'depth' row (not written in practice — kept as a
    * defensive fallback) reports depth -1, making [[chainDepth]] walk. */
  private def sidecarMeta(spark: SparkSession, path: String,
      snapshotId: String): Option[(String, Int)] = {
    val meta = baseMetaDir(snapDir(path, snapshotId))
    if (!Fs.exists(spark, meta)) None
    else {
      val rows = spark.read.parquet(meta)
        .filter(col("kind").isin("base", "depth"))
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      Some((rows("base"), rows.get("depth").map(_.toInt).getOrElse(-1)))
    }
  }

  /** The base snapshot an overlay builds on; None for a full
    * (self-contained) snapshot. */
  def baseOf(spark: SparkSession, path: String,
      snapshotId: String): Option[String] =
    sidecarMeta(spark, path, snapshotId).map(_._1)

  /** Overlay-chain length above a snapshot (0 = full). The sidecar
    * records its own depth, so the common case is ONE sidecar read —
    * the publish-time depth gate must not pay a 2-reads-per-level
    * walk. Falls back to walking the base pointers for a sidecar
    * without the depth row; a cycle (corrupted sidecars) fails
    * instead of looping. */
  def chainDepth(spark: SparkSession, path: String,
      snapshotId: String): Int = {
    var id = snapshotId; var d = 0; var seen = Set.empty[String]
    var m = sidecarMeta(spark, path, id)
    while (m.isDefined) {
      if (m.get._2 >= 0) return d + m.get._2
      require(!seen.contains(id), s"overlay chain cycle at snapshot $id")
      seen += id; id = m.get._1; d += 1
      m = sidecarMeta(spark, path, id)
    }
    d
  }

  private def resolveOverlay(spark: SparkSession, path: String,
      dir: String): DataFrame = {
    val meta = spark.read.parquet(baseMetaDir(dir))
    val baseId = meta.filter(col("kind") === "base")
      .select(col("value")).head().getString(0)
    val removed = meta.filter(col("kind") === "removed")
      .select(col("value").as("docId"))
    val base = readSnapshot(spark,
      path, baseId)
    val overlay =
      if (hasPartitions(spark, dir)) spark.read.parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TableSchema)
    val cols = TableSchema.fieldNames.map(col).toSeq
    base.join(removed, Seq("docId"), "left_anti").select(cols: _*)
      .unionByName(overlay.select(cols: _*))
  }

  /** Publish a snapshot as an OVERLAY over `baseSnapshotId`: write
    * ONLY `added` (the re-emitted docs' triples) plus the sidecar
    * naming the base and the hidden docs — publish I/O scales with the
    * DELTA, not the corpus. The manifest row is exact nonetheless:
    * `added` is read back from disk and fingerprinted, and the
    * resolved snapshot's rowCount/contentHash derive from the base's
    * committed row by xor algebra (see [[ContentHash.xorLong]]) —
    * callers supply `(removedRows, removedHash)` over the base rows of
    * exactly the `removedDocs` set (the publish state keeps per-doc
    * fingerprints for this; GraphSinkSpec asserts the derived hash
    * equals a from-scratch [[ContentHash.hex]] of the resolved read).
    * Readers resolve the chain transparently ([[readSnapshot]]);
    * [[expireSnapshots]]/[[pruneManifest]] keep base chains of kept
    * snapshots alive; a chain is flattened by [[compactSnapshot]] or
    * by the caller publishing full once depth exceeds its bound.
    * Same commit discipline as [[write]]: data + sidecar land before
    * the manifest row; a crash mid-publish leaves an orphan dir. */
  def writeDelta(spark: SparkSession, path: String, snapshotId: String,
      baseSnapshotId: String, added: DataFrame, removedDocs: DataFrame,
      removedRows: Long, removedHash: Long): (Long, String) = {
    import spark.implicits._
    val base = spark.read.parquet(s"$path/manifest")
      .filter(col("snapshotId") === baseSnapshotId)
      .orderBy(col("committedAt").desc)
      .select(col("rowCount"), col("contentHash")).limit(1)
      .collect().headOption.getOrElse(throw new IllegalStateException(
        s"overlay base $baseSnapshotId at $path is not committed"))
    val dir = snapDir(path, snapshotId)
    // data FIRST (static Overwrite wipes the dir, sidecar included —
    // a republish of the same snapshotId replaces the overlay
    // wholesale), sidecar second, manifest row last
    added.withColumn("bucket", bucketCol(col("subj")))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("pred", "bucket").parquet(dir)
    val (addN, addH) =
      if (!hasPartitions(spark, dir)) (0L, 0L)
      else ContentHash.xorLong(spark.read.parquet(dir),
        Seq("subj", "pred", "obj", "docId"))
    val depth = chainDepth(spark, path, baseSnapshotId) + 1
    removedDocs.select(lit("removed").as("kind"), col("docId").as("value"))
      .unionByName(Seq(("base", baseSnapshotId),
        ("depth", depth.toString)).toDF("kind", "value"))
      .write.mode(SaveMode.Overwrite).parquet(baseMetaDir(dir))
    val n = base.getLong(0) - removedRows + addN
    val h = ContentHash.parseHex(base.getString(1)) ^ removedHash ^ addH
    require(n >= 0, s"overlay row count went negative ($n): removed " +
      s"$removedRows from a base of ${base.getLong(0)} — the removed-doc " +
      "stats do not describe this base")
    val hex = "%016x".format(h)
    Seq((n, hex, snapshotId, System.currentTimeMillis()))
      .toDF("rowCount", "contentHash", "snapshotId", "committedAt")
      .write.mode(SaveMode.Append).parquet(s"$path/manifest")
    (n, hex)
  }

  /** A snapshot's OWN written rows, no chain resolution — for an
    * overlay that is the delta data alone (what the publisher needs to
    * fingerprint per re-emitted doc at O(delta) cost); for a full
    * snapshot it is the whole thing. Empty-typed frame when the dir
    * holds no data. */
  def readOwnData(spark: SparkSession, path: String,
      snapshotId: String): DataFrame = {
    val dir = snapDir(path, snapshotId)
    if (hasPartitions(spark, dir)) spark.read.parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TableSchema)
  }

  /** Flatten one overlay snapshot in place: resolve its chain and
    * rewrite it as a FULL snapshot (manifest untouched — rowCount and
    * contentHash are invariants of the resolved content, which is
    * exactly what the overlay's manifest row already records; asserted
    * in GraphSinkSpec). Frees its base for [[expireSnapshots]] and
    * caps the read-side chain cost. No-op on a full snapshot. Goes
    * through a tmp dir + [[Fs.swapInto]] — like the other maintenance
    * rewrites, run at a quiescent point. */
  def compactSnapshot(spark: SparkSession, path: String,
      snapshotId: String): Boolean = {
    val dir = snapDir(path, snapshotId)
    if (!Fs.exists(spark, baseMetaDir(dir))) return false
    val tmp = s"${dir}__compact"
    readSnapshot(spark, path, snapshotId)
      .select(col("subj"), col("obj"), col("docId"), col("score"),
        col("pred"), col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pred", "bucket").parquet(tmp)
    Fs.swapInto(spark, tmp, dir)
    true
  }

  /** Transitive closure of `ids` under overlay base pointers — the GC
    * keep-set expansion: deleting the base of a kept overlay would
    * turn [[readSnapshot]] of the kept id into a loud failure. */
  private def withBaseChains(spark: SparkSession, path: String,
      ids: Set[String]): Set[String] = {
    var keep = ids; var frontier = ids
    while (frontier.nonEmpty) {
      val bases = frontier.flatMap(id => baseOf(spark, path, id)) -- keep
      keep ++= bases; frontier = bases
    }
    keep
  }

  /** Out-edges of one canonical entity under one predicate — the
    * point-lookup the bucket layout exists for. `bucketCol(lit(subj))`
    * is constant-foldable, so both `pred` and `bucket` land in the
    * scan's PartitionFilters: of pred×16 partition dirs the read
    * touches exactly ONE, regardless of table size (asserted in
    * GraphSinkSpec). */
  def entityEdges(spark: SparkSession, path: String, pred: String,
      subj: String): DataFrame =
    read(spark, path)
      .filter(col("pred") === pred &&
        col("bucket") === bucketCol(lit(subj)) &&
        col("subj") === subj)

  /** Tie-break on snapshotId: two publishes can commit within one
    * clock millisecond, and [[expireSnapshots]] must agree with this
    * resolution on which snapshot is "latest" — an un-tied sort here
    * and an independent sort there could disagree and GC the dir this
    * method resolves. */
  def latestSnapshot(spark: SparkSession, path: String): Option[String] = {
    val m = spark.read.parquet(s"$path/manifest")
    m.orderBy(col("committedAt").desc, col("snapshotId").desc)
      .select(col("snapshotId"))
      .limit(1).collect().headOption.map(_.getString(0))
  }

  /** Snapshot GC — without it, every crashed publish (orphan snap dir,
    * never committed) and every superseded snapshot stays on disk
    * forever: at a snapshot per ingest that is unbounded storage.
    *
    * Deletes a `snap=` dir when it is either
    *  - COMMITTED but superseded beyond the `keepLast` most recent
    *    snapshots (time travel within the last `keepLast` stays intact;
    *    the latest committed snapshot is never deleted — `keepLast` is
    *    clamped to >= 1), or
    *  - UNCOMMITTED (no manifest row) and older than `orphanSafetyMs`
    *    by dir modification time — the age gate keeps an in-flight
    *    publish (data written, manifest append pending) from being
    *    swept by a concurrent GC.
    *
    * Manifest rows of expired snapshots are kept (cheap lineage);
    * [[readSnapshot]] on an expired id fails loudly via the
    * rowCount>0-but-no-data check. Returns the deleted snapshot dirs. */
  def expireSnapshots(spark: SparkSession, path: String, keepLast: Int,
      orphanSafetyMs: Long = 6 * 3600 * 1000L): Seq[String] = {
    val keep = math.max(1, keepLast)
    val dataP = new org.apache.hadoop.fs.Path(s"$path/data")
    val fs = dataP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dataP)) return Seq.empty
    val manP = new org.apache.hadoop.fs.Path(s"$path/manifest")
    // committed ids, most recent first (an id republished under the
    // same snapshotId counts once, at its latest commit time)
    val committed: Seq[String] =
      if (!fs.exists(manP)) Seq.empty
      else spark.read.parquet(s"$path/manifest")
        .groupBy(col("snapshotId"))
        .agg(max(col("committedAt")).as("committedAt"))
        // same tie-break as latestSnapshot — the keep-set must contain
        // whatever readers resolve as latest even on equal timestamps
        .orderBy(col("committedAt").desc, col("snapshotId").desc)
        .select(col("snapshotId"))
        .collect().map(_.getString(0)).toSeq
    // chain closure: an overlay's base must outlive it even when the
    // base itself is beyond the keepLast window (or manifest-pruned)
    val keepIds = withBaseChains(spark, path, committed.take(keep).toSet)
    val committedIds = committed.toSet
    val now = System.currentTimeMillis()
    fs.listStatus(dataP).toSeq
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

  /** Manifest pruning — the storage-hygiene twin of
    * [[expireSnapshots]]: [[expireSnapshots]] deletes data dirs but
    * appends nothing to the manifest, so at a snapshot per ingest the
    * manifest grows one row per publish forever. This rewrites the
    * manifest keeping every row of the `keepLast` most recently
    * committed snapshotIds (same ordering and tie-break as
    * [[latestSnapshot]]/[[expireSnapshots]], so the kept window is
    * exactly the readable one — run it AFTER expireSnapshots with the
    * same `keepLast`). Returns the pruned snapshot ids. A pruned id
    * whose data dir still exists remains time-travel READABLE
    * ([[readSnapshot]] probes the data dir first) but is now invisible
    * to [[latestSnapshot]] and, being manifest-less, will be swept as
    * an orphan by a later expireSnapshots once past the safety age.
    * The rewrite goes through a tmp dir + [[Fs.swapInto]]. */
  def pruneManifest(spark: SparkSession, path: String,
      keepLast: Int): Seq[String] = {
    val keep = math.max(1, keepLast)
    val manPath = s"$path/manifest"
    if (!Fs.exists(spark, manPath)) return Seq.empty
    // materialize BEFORE the rewrite — the plan reads the dir the swap
    // replaces
    val m = spark.read.parquet(manPath).localCheckpoint()
    val committed = m
      .groupBy(col("snapshotId"))
      .agg(max(col("committedAt")).as("committedAt"))
      .orderBy(col("committedAt").desc, col("snapshotId").desc)
      .select(col("snapshotId"))
      .collect().map(_.getString(0)).toSeq
    // keep the base chains of kept overlays: a base manifest row is
    // load-bearing for an empty base snapshot's read AND keeps the
    // base dir from being swept as an orphan by a later GC
    val keepIds = withBaseChains(spark, path,
      committed.take(keep).toSet).toSeq
    val dropIds = committed.filterNot(keepIds.contains)
    if (dropIds.isEmpty) return Seq.empty
    val tmp = s"${manPath}__prune"
    m.filter(col("snapshotId").isin(keepIds: _*))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    Fs.swapInto(spark, tmp, manPath)
    dropIds
  }
}
