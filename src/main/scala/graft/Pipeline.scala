package graft

import graft.canon.ConnectedComponents
import graft.core._
import graft.extract.Extract
import graft.link.Linker
import graft.triples.TripleEmit
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline (the flagship query,
  * SURVEY §3.2): source table -> fused tokenize+triaffine extract ->
  * broadcast link -> canonicalize -> triples.
  *
  * The canonical-entity map is a pure function of the (static) alias
  * dictionary — a dimension build. It is computed once per process and
  * reused across jobs (`staticCanonMap`), exactly as a production
  * pipeline materializes dimension tables; the corpus-proportional
  * stages (extract, link, emit) are what scale with data volume.
  */
object Pipeline {

  final case class Stages(
      files: Dataset[SourceFileHashed],
      mentions: Dataset[Mention],
      canonMentions: DataFrame,
      triples: DataFrame)

  /** (entity, canonical) rows collected once; tiny dimension. */
  @volatile private var canonCache: Option[Array[(String, String)]] = None

  def staticCanonMap(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = canonCache.getOrElse {
      val r = ConnectedComponents.canonicalMap(Linker.aliasDf(spark))
        .collect().map(x => (x.getString(0), x.getString(1)))
      canonCache = Some(r)
      r
    }
    rows.toSeq.toDF("entity", "canonical")
  }

  /** THE canonicalization join — left-join on entity, unknown entities
    * stay self-canonical. One definition shared by every pipeline
    * variant (in-process, dynamic, from-table, resumable, streaming) so
    * the null-fallback rule can never silently diverge between paths.
    *
    * `hintBroadcast` is true ONLY for the static dictionary-derived map
    * (a genuine dimension, known tiny). The mention-MINED dynamic map
    * grows with the observed corpus vocabulary — millions of entities
    * at 100 TB, a multi-GB broadcast if hinted — so the dynamic path
    * passes false and AQE picks broadcast vs shuffle from the map's
    * ACTUAL runtime size (asserted in PlanSpec). */
  def canonicalize(linked: DataFrame, canonMap: DataFrame,
      hintBroadcast: Boolean = true): DataFrame = {
    val cm = if (hintBroadcast) broadcast(canonMap) else canonMap
    linked.join(cm,
      linked("entity") === canonMap("entity"), "left")
      .select(linked("*"),
        coalesce(col("canonical"), linked("entity")).as("canonical"))
  }

  /** relationalEmit = true uses the 5-branch DataFrame emitter
    * (operator showcase, needs a cache of the mention table);
    * false (default) uses the fused single-shuffle emitter. */
  def run(spark: SparkSession, nFiles: Long, verifySha: Boolean = false,
      relationalEmit: Boolean = false): Stages = {
    val files = Extract.corpus(spark, nFiles)
    if (verifySha) Extract.verifyIntegrity(files)
    // generated corpus: uniform range partitions, unique paths — the
    // skew-control repartition would be a pure extra shuffle here
    val st = stagesFor(files, repartitionByDoc = false)
    if (relationalEmit) st.copy(triples = TripleEmit.emit(st.canonMentions))
    else st
  }

  /** Canonical map from the static dictionary PLUS mention-derived
    * surface-form alias edges (AliasMining over the linked mention
    * table) — canonicalization as a data-scale stage: the CC input
    * grows with the observed corpus vocabulary, not just the dictionary.
    * On this corpus the mined merges coincide with the dictionary's
    * snake/camel aliases, so gold parity is preserved (asserted in
    * PipelineSpec). */
  def dynamicCanonMap(spark: SparkSession, linked: DataFrame): DataFrame =
    ConnectedComponents.canonicalMap(Linker.aliasDf(spark),
      Some(graft.canon.AliasMining.mentionAliasEdges(linked)))

  /** A mined canon map up to this many rows gets an explicit broadcast
    * hint (the SIZE-GATE): a few million (entity, canonical) string
    * pairs is comfortably under executor broadcast budgets, and the
    * hint saves AQE's full shuffle materialization of the mention
    * table (AQE converts SMJ->BHJ only after the probe side's shuffle
    * files are written). Above the gate the hint is dropped and AQE
    * decides from runtime sizes. */
  val BroadcastCanonMaxRows = 4000000L

  /** Dynamic-canon stage chain over an arbitrary file slice: the
    * canonical map is mined from the corpus itself (AliasMining + CC
    * below the [[DriverCanonMaxPairs]] gate, the distributed star
    * rounds above it), making canonicalization a data-scale stage.
    * The linked mention table is persisted because it feeds both the
    * alias mining aggregation and the canon join (at cluster scale
    * this is the stage boundary you would materialize anyway). */
  /** Caching contract (same as DedupOps): the linked mention table is
    * persisted (it feeds alias mining AND the canon+emit chain) and
    * returned LAZY inside the Stages plans — the CALLER owns cleanup
    * (`spark.catalog.clearCache()` between unrelated jobs, as Bench
    * and Verify do). Round 2 instead localCheckpoint-ed the triples
    * and unpersisted eagerly — one extra full materialization pass of
    * the triple set per run, paid even by callers that consume the
    * plan exactly once. */
  def dynamicStagesFor(files: Dataset[SourceFileHashed],
      repartitionByDoc: Boolean = true): Stages = {
    val spark = files.sparkSession
    import spark.implicits._
    val ments = Extract.mentionsFused(files,
      repartitionByDoc = repartitionByDoc)
    val linked = Linker.link(ments).toDF().persist()
    val (canonMap, canonRows) = dynamicCanonMapGated(spark, linked)
    val hint = canonRows <= BroadcastCanonMaxRows
    val canon = canonicalize(linked, canonMap, hintBroadcast = hint)
    // broadcast canon join => the cached linked table reaches the emit
    // narrow and doc-contiguous, so the emit's mention shuffle can be
    // dropped outright; above the gate the join may shuffle by entity
    // and the grouped emitter is required
    val triples =
      if (hint) TripleEmit.emitFusedLocal(canon.as[TripleEmit.CanonMention]).toDF()
      else TripleEmit.emitFused(canon.as[TripleEmit.CanonMention]).toDF()
    Stages(files, ments, canon, triples)
  }

  /** Gate for the driver-side dynamic-canon fast path: at most this
    * many DISTINCT (normKey, entity) pairs are collected. A few
    * hundred thousand string pairs is a few tens of MB on the driver —
    * the same budget class as [[ConnectedComponents.DriverSolveMaxEdges]]
    * (the mined edge set is a subset of the pair set, star-built per
    * key). Above the gate the distributed mining + star-round path
    * runs unchanged. */
  val DriverCanonMaxPairs = 400000

  /** Mined dynamic canon map with a driver-side fast path, returning
    * (map, rowCount).
    *
    * The distributed chain ([[dynamicCanonMap]]) costs ~6 SERIAL tiny
    * jobs on this stage's critical path (mining distinct + window,
    * edge checkpoint, CC checksum, CC solve, label join, map
    * checkpoint + count) — pure stage-barrier latency once the
    * vocabulary is small, which it is by construction: the pair set is
    * bounded by the corpus VOCABULARY (heavy-tailed), not the mention
    * count. Below the gate, ONE distributed job (the vocabulary-sized
    * distinct) feeds a driver union-find that replays
    * `canonicalMap(aliasDf, mentionAliasEdges(linked))` exactly:
    * same star edges, same min-member labels, same membership rule
    * (dictionary entities + mined multi-entity key groups) — parity
    * asserted in CanonSpec. Returns the row count for free, saving
    * the size-gate count() job too. */
  def dynamicCanonMapGated(spark: SparkSession,
      linked: DataFrame): (DataFrame, Long) = {
    import spark.implicits._
    val pairs = linked.filter(col("entType") === "identifier")
      .select(graft.canon.AliasMining.normKey(col("surface")).as("k"),
        col("entity"))
      .distinct().limit(DriverCanonMaxPairs + 1)
      .as[(String, String)].collect()
    if (pairs.length > DriverCanonMaxPairs) {
      val m = dynamicCanonMap(spark, linked).localCheckpoint()
      (m, m.count())
    } else {
      // ---- driver replay of canonicalMap(aliasDf, mined edges) ----
      val parent = scala.collection.mutable.HashMap[String, String]()
      def find(x: String): String = {
        var r = parent.getOrElseUpdate(x, x)
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def union(a: String, b: String): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // nodes that appear in SOME edge (dictionary star or mined star):
      // exactly the node set the distributed CC labels; everything else
      // joins as a self-canonical single
      val edgeNodes = scala.collection.mutable.HashSet[String]()
      def star(ents: Iterable[String]): Unit = {
        val ds = ents.toVector.distinct
        if (ds.size > 1) {
          val src = ds.min
          ds.foreach { d =>
            if (d != src) { union(src, d); edgeNodes += src; edgeNodes += d }
          }
        }
      }
      Vocab.aliasToEntities.valuesIterator.foreach(star)
      pairs.groupBy(_._1).valuesIterator.foreach(ps => star(ps.map(_._2)))
      // singles = dictionary entities ∪ mined edge endpoints; label =
      // min member of the component, self when edge-free
      val singles = (Vocab.aliasRows.iterator.map(_._2) ++
        edgeNodes.iterator).toSet
      val minOf = scala.collection.mutable.HashMap[String, String]()
      edgeNodes.foreach { m =>
        val r = find(m)
        val cur = minOf.getOrElse(r, m)
        minOf(r) = if (m < cur) m else cur
      }
      val rows = singles.toSeq.sorted.map { e =>
        val canon =
          if (edgeNodes.contains(e)) minOf(find(e)) else e
        (e, canon)
      }
      (rows.toDF("entity", "canonical"), rows.size.toLong)
    }
  }

  /** Like [[run]] but with the mention-derived dynamic canonical map. */
  def runDynamicCanon(spark: SparkSession, nFiles: Long): Stages =
    dynamicStagesFor(Extract.corpus(spark, nFiles),
      repartitionByDoc = false)

  /** Dynamic-canon pipeline over a materialized source table — the
    * BENCHED variant (Bench times this, so the measured number includes
    * canonicalization as a data-scale stage, not a prebuilt dimension). */
  def runFromTableDynamic(spark: SparkSession, path: String): Stages = {
    import spark.implicits._
    dynamicStagesFor(spark.read.parquet(path).as[SourceFileHashed])
  }

  /** THE standard stage chain over an arbitrary file slice: extract ->
    * link -> canonicalize (static map) -> fused emit. Every batch entry
    * point ([[run]], [[runFromTable]]) AND the incremental splice
    * ([[graft.incremental.IncrementalPipeline]]) go through here, so
    * "re-extract this slice" can never diverge from the full pipeline
    * — structurally, not by convention. */
  def stagesFor(files: Dataset[SourceFileHashed],
      repartitionByDoc: Boolean = true): Stages = {
    val spark = files.sparkSession
    import spark.implicits._
    val ments = Extract.mentionsFused(files,
      repartitionByDoc = repartitionByDoc)
    val linked = Linker.link(ments)
    val canon = canonicalize(linked.toDF(), staticCanonMap(spark))
    // static canon map is always broadcast (genuine dimension) => the
    // mention stream is narrow and doc-contiguous end to end; the
    // partition-local emitter removes the pipeline's only
    // corpus-sized shuffle after the skew-control repartition
    Stages(files, ments, canon,
      TripleEmit.emitFusedLocal(canon.as[TripleEmit.CanonMention]).toDF())
  }

  def triplesFor(files: Dataset[SourceFileHashed]): DataFrame =
    stagesFor(files).triples

  /** Warm re-score path: triples from a frozen-encoder cache
    * ([[graft.extract.EncodingCache]]) without touching the source
    * table — the S3 re-run shape (new scoring/linking weights, same
    * encoder). Downstream stages are THE shared ones (link ->
    * canonicalize -> fused emit), so a warm run can never diverge from
    * the cold pipeline except by skipping the encode. */
  def triplesFromCache(spark: SparkSession, cachePath: String): DataFrame = {
    import spark.implicits._
    val ments = graft.extract.EncodingCache.mentionsFromCache(spark, cachePath)
    val linked = Linker.link(ments)
    canonicalize(linked.toDF(), staticCanonMap(spark))
      .as[TripleEmit.CanonMention]
      .transform(TripleEmit.emitFused).toDF()
  }

  /** Pipeline over a materialized source table (the production shape:
    * north_star reads the Iceberg source-code table; synthesis is data
    * prep, not pipeline). */
  def runFromTable(spark: SparkSession, path: String,
      verifySha: Boolean = false): Stages = {
    import spark.implicits._
    val files = spark.read.parquet(path).as[SourceFileHashed]
    if (verifySha) Extract.verifyIntegrity(files)
    stagesFor(files)
  }

  /** Gold triples for the same corpus slice (closed-form). */
  def goldTriples(spark: SparkSession, nFiles: Long): DataFrame = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => CorpusGen.file(id).triples)
      .toDF().dropDuplicates("subj", "pred", "obj", "docId")
  }

  /** Gold mentions for the same corpus slice (closed-form). */
  def goldMentions(spark: SparkSession, nFiles: Long): DataFrame = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => CorpusGen.file(id).mentions).toDF()
  }

  /** Gold sentence lengths (closed-form, from the generator's
    * pre-render token vectors — independent of the engine tokenizer):
    * the neg_sample oracle enumerates its span universe from these. */
  def goldSentences(spark: SparkSession, nFiles: Long): DataFrame = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => CorpusGen.file(id).sents).toDF()
  }
}
