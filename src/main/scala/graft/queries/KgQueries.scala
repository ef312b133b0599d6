package graft.queries

import graft.Pipeline
import graft.canon.ConnectedComponents
import graft.evalm.StrictMetric
import graft.extract.Extract
import graft.link.Linker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KG-pipeline entries WITH hard DuckDB oracles.
  *
  * The triaffine kernel itself is not SQL-expressible, but its expected
  * output IS: the corpus gold is closed-form (CorpusGen generates
  * content and gold together), so [[graft.Verify]] materializes the
  * gold mentions/triples/corpus/canon tables to parquet under
  * the sibling `<outDir>_gold/` dir and the oracles are DuckDB `read_parquet` selects
  * over them (`__GOLDDIR__` is substituted with the absolute gold dir at
  * dump time). A green row therefore proves the distributed kernel +
  * linking + canonicalization reproduce the closed-form gold exactly —
  * the driver-side hard version of the ScalaTest parity suites.
  * Corpus size scales with the sf dir. */
object KgQueries {

  /** Corpus slice per sf dir. SPARK_GRAFT_KG_FILES overrides for
    * scale re-verification runs (e.g. 10x the sf0.1 slice — COVERAGE.md
    * records the result); the driver never sets it. */
  def nFilesFor(sfDir: String): Long =
    sys.env.get("SPARK_GRAFT_KG_FILES").map(_.toLong).getOrElse(
      if (sfDir.contains("0.1")) 15000L
      else if (sfDir.contains("0.01")) 1500L
      else 150L)

  type Q = (SparkSession, String) => DataFrame

  /** Corpus slice for neg_sample: a tenth of the kg slice — the span
    * universe is ~40x the sentence count, so the full slice would push
    * the driver compare into the millions of rows for no extra
    * evidence. */
  def negSampleFiles(sfDir: String): Long = math.max(nFilesFor(sfDir) / 10, 15L)

  /** Reference hard_neg_dist (span_utils.py:15): the tridiagonal-band
    * dilation run twice == the L1 ball of radius 2 in (start, end). */
  val HardNegDist = 2
  private val NegSampleSeed = 42

  /** Fixed query aliases for the K10 driver-graded soft lookup —
    * planted identifiers, so most sentences contain real matches.
    * Verify dumps the engine's encodings/head transforms for exactly
    * this list (align_q) next to the per-position memory table
    * (align_mem); the oracle replays the similarity + argmax decode
    * from those tables alone. */
  val AlignQueries: Seq[String] = graft.core.Vocab.idents.take(8)

  /** K12 negative sampling (reference span_utils.py:4-40) as a
    * relational plan over the engine's own extraction:
    *
    *  - positives = extracted mention spans (== closed-form gold,
    *    kg_eval pins P/R = 1.0, so the oracle recomputes them
    *    independently);
    *  - HARD negatives = non-positive cells of the P3/P4 span grid
    *    within L1 distance [[HardNegDist]] of a positive — the
    *    reference's `neg_step` dilation (w@H + H@w, w = tridiagonal
    *    band) iterated hard_neg_dist times reaches exactly the cells
    *    with |ds|+|de| <= dist;
    *  - EASY negatives (all remaining grid cells) are KEPT with
    *    probability pos_cnt/(1e-6+easy_cnt) per sentence — the huge
    *    easy pool is downsampled to roughly the positive count, which
    *    is the point of negative sampling. The reference sets the
    *    -100 ignore label where `rand > pos_count/(1e-6+easy_count)`
    *    (span_utils.py:34-39), i.e. a cell SURVIVES iff
    *    rand <= pos/(1e-6+easy); with the F13 partition-stable hash
    *    uniform u = u_ppm/1e6 instead of rand(seed) that is, in EXACT
    *    integer arithmetic (multiply through by 1e12, no division):
    *    keep iff u_ppm * (easy_cnt * 1e6 + 1) <= pos_cnt * 1e12.
    *    A positive-free sentence keeps (almost) no easy negative,
    *    exactly like the reference. Dropped rows are the reference's
    *    -100 ignore label — omitted here. (Round 4 initially shipped
    *    the complement of this rule — keeping ~easy-pos cells — with
    *    oracle and spec replicating the same inversion; all three
    *    were flipped together.)
    *
    * Spans are exclusive-end like gold mentions; the span grid comes
    * from the native spans() Generator (F6) with the kernel's
    * maxSpanLen=16 tri-mask bound.
    *
    * Plan shape (the 100 TB story): gold spans are pre-grouped into a
    * per-sentence ARRAY (bounded — the grammar caps mentions per
    * line), so the label join is a plain equi-join on (docId, sentId)
    * with exists() predicates over the array instead of a
    * row-multiplying band join + re-grouping. The span universe (~40x
    * the sentence count, the big table here) is therefore shuffled at
    * most ONCE: never for a small broadcast label side, and exactly
    * once — reused by the count windows, whose (docId, sentId) keys
    * match the join key — when the label side is too big to
    * broadcast. */
  private def negSample(s: SparkSession, d: String): DataFrame = {
    val n = negSampleFiles(d)
    // ONE corpus pass (round-4 finding): the fused tokenize+score
    // producer emits sentence lengths AND positive spans together,
    // materialized once (localCheckpoint) and read by both the span
    // universe and the label side — the previous shape ran
    // Extract.sentences AND Extract.run, i.e. two generator+tokenizer
    // passes with one paying the kernel twice over the same corpus.
    // PlanSpec pins the single generation (no corpus source node may
    // remain in the final plan).
    val cells = Extract.sentenceSpans(Extract.corpus(s, n),
      repartitionByDoc = false).localCheckpoint()
    val sents = cells.select(col("docId"), col("sentId"), col("n"))
    val positives = cells
      .select(col("docId"), col("sentId"), explode(col("spans")).as("sp"))
      .select(col("docId"), col("sentId"),
        col("sp._1").as("start"), col("sp._2").as("end"))
    sampleCells(sents, positives)
      .orderBy(col("docId"), col("sentId"), col("start"), col("end"))
  }

  /** THE K12 sampler core, shared by the driver-graded query above
    * (positives = engine extraction) and the loss-monitoring cell set
    * ([[graft.evalm.Losses]], positives = closed-form gold) so the two
    * surfaces cannot drift. `sents` = (docId, sentId, n);
    * `positives` = (docId, sentId, start, end), duplicates allowed (a
    * cell is positive whatever type(s) it carries — collect_set dedups
    * inside the single label-side aggregation, span_utils.py:20).
    * Returns every kept cell with its role. */
  def sampleCells(sents: DataFrame, positives: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = sents.sparkSession
    graft.functions.SpanFunctions.register(s)
    val universe = sents
      .selectExpr("docId", "sentId", "spans(n, 16) AS (start, end_incl)")
      .select(col("docId"), col("sentId"), col("start"),
        (col("end_incl") + 1).as("end"))
    val g = positives
      .select(col("docId"), col("sentId"), col("start").as("gs"),
        col("end").as("ge"))
      .groupBy(col("docId"), col("sentId"))
      .agg(collect_set(struct(col("gs"), col("ge"))).as("golds"))
    val lab = universe.join(g, Seq("docId", "sentId"), "left")
      .withColumn("is_pos", when(coalesce(exists(col("golds"), gg =>
          gg.getField("gs") === col("start") &&
            gg.getField("ge") === col("end")), lit(false)), 1).otherwise(0))
      .withColumn("near", when(coalesce(exists(col("golds"), gg =>
          abs(col("start") - gg.getField("gs")) +
            abs(col("end") - gg.getField("ge")) <= lit(HardNegDist)),
          lit(false)), 1).otherwise(0))
      .withColumn("role",
        when(col("is_pos") === 1, "pos")
          .when(col("near") === 1, "hard_neg")
          .otherwise("easy_neg"))
      // slim the window shuffle: the gold array and flags are spent
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("role"))
    val w = Window.partitionBy(col("docId"), col("sentId"))
    val uPpm = pmod(graft.ops.TextOps.md5h60(concat_ws("#",
      col("docId"), col("sentId").cast("string"),
      col("start").cast("string"), col("end").cast("string"),
      lit(NegSampleSeed.toString))), lit(1000000L))
    lab
      // BOTH window sums in one projection: sequential withColumns
      // leave a Project between the two Window operators, which blocks
      // the CollapseWindow rule — the round-6 probe plan showed two
      // WindowExec passes over the ~40x-sentence universe for one
      // shared (docId, sentId) spec. One select = one Window node.
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("role"),
        sum(when(col("role") === "pos", 1L).otherwise(0L)).over(w)
          .as("pos_cnt"),
        sum(when(col("role") === "easy_neg", 1L).otherwise(0L)).over(w)
          .as("easy_cnt"))
      .filter(col("role") =!= "easy_neg" ||
        uPpm * (col("easy_cnt") * lit(1000000L) + lit(1L)) <=
          col("pos_cnt") * lit(1000000000000L))
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("role"))
  }

  /** Nearest strictly-enclosing mention per mention (J5 semantics,
    * reference data_util.py:437-466) over a genuinely nested mention
    * table (signature strictly contains function/identifier/type_ref).
    * Inner join: mentions with no enclosing span are omitted (keeps the
    * result null-free for exact cross-engine compare).
    *
    * Two deliberate divergences from convert_trans, both unreachable
    * or non-canonical there: (1) the reference's `j != i` admits a
    * SAME-span entity of a different type as an encloser (non-strict
    * containment); this engine requires a strictly larger span — the
    * corpus has no same-span different-type mention pair (asserted by
    * the gold grammar), so the outputs are identical. (2) the
    * reference breaks minimal-length ties by entity FILE order, which
    * no relational formulation can reconstruct; ties break here by the
    * canonical (length, start, entType) order instead, mirrored in the
    * oracle. */
  def nestingJoin(m: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = m.as("a"); val b = m.as("b")
    val joined = a.join(b,
      col("a.docId") === col("b.docId") &&
        col("a.sentId") === col("b.sentId") &&
        col("b.start") <= col("a.start") && col("a.end") <= col("b.end") &&
        (col("b.start") < col("a.start") || col("a.end") < col("b.end")))
    val w = Window
      .partitionBy(col("a.docId"), col("a.sentId"), col("a.start"),
        col("a.end"), col("a.entType"))
      .orderBy(col("b.end") - col("b.start"), col("b.start"), col("b.entType"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("a.docId").as("docId"), col("a.sentId").as("sentId"),
        col("a.start").as("start"), col("a.end").as("end"),
        col("a.entType").as("entType"),
        col("b.start").as("enc_start"), col("b.end").as("enc_end"),
        col("b.entType").as("enc_type"))
      .orderBy(col("docId"), col("sentId"), col("start"), col("end"),
        col("entType"))
  }

  val all: Map[String, Q] = Map(
    "kg_corpus" -> ((s, d) =>
      Extract.corpus(s, nFilesFor(d)).toDF()
        .select(col("repo"), col("path"), col("commit"), col("lang"),
          col("sha256"))
        .orderBy(col("repo"), col("path"))),
    "kg_mentions" -> ((s, d) =>
      Extract.run(s, nFilesFor(d)).toDF()
        .select(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"), col("surface"))
        .orderBy(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"))),
    // K13 driver-graded: the SAME extraction under the EMA weight set
    // (Weights.emaDefault — decay-averaged parameters, the reference's
    // flagship decode mode, evaluation.py:28-37). Every parameter and
    // the run-config fingerprint differ from the raw bundle; the
    // DECISIONS must not — same gold oracle as kg_mentions.
    "kg_mentions_ema" -> ((s, d) =>
      Extract.mentionsFused(Extract.corpus(s, nFilesFor(d)),
        weights = graft.kernel.Weights.emaDefault,
        repartitionByDoc = false).toDF()
        .select(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"), col("surface"))
        .orderBy(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"))),
    "kg_triples" -> ((s, d) =>
      Pipeline.run(s, nFilesFor(d)).triples
        .select(col("subj"), col("pred"), col("obj"), col("docId"))
        .orderBy(col("subj"), col("pred"), col("obj"), col("docId"))),
    // incremental snapshot processing: prev = the corpus' first half,
    // cur = the full corpus. Change detection (left_anti on repo/path/
    // sha256) re-extracts ONLY the second half; the spliced result must
    // equal the full closed-form gold — same oracle as kg_triples.
    // Exactness under modify/remove is IncrementalSpec's job.
    "kg_incremental" -> ((s, d) => {
      val n = nFilesFor(d)
      val prev = Extract.corpus(s, n / 2)
      val cur = Extract.corpus(s, n)
      val prevTriples = graft.Pipeline.triplesFor(prev)
      graft.incremental.IncrementalPipeline
        .incrementalTriples(prevTriples, prev, cur)
        .select(col("subj"), col("pred"), col("obj"), col("docId"))
        .orderBy(col("subj"), col("pred"), col("obj"), col("docId"))
    }),
    "kg_canon" -> ((s, _) =>
      ConnectedComponents.canonicalMap(Linker.aliasDf(s))
        .orderBy(col("entity"))),
    // the DISTRIBUTED large/small-star loop, driver-graded: a 600k-edge
    // chain sits ABOVE ConnectedComponents.DriverSolveMaxEdges (so the
    // star rounds — not the driver union-find gate — produce the
    // labels) and is the worst case for naive label propagation
    // (diameter = n). Every node's component is the chain minimum in
    // closed form, which the DuckDB oracle generates independently.
    "kg_cc_chain" -> ((s, _) => {
      val n = 600001L // 600k edges > DriverSolveMaxEdges
      val edges = s.range(n - 1)
        .select(format_string("n%07d", col("id")).as("src"),
          format_string("n%07d", col("id") + 1).as("dst"))
      ConnectedComponents.run(edges)
        .select(col("node"), col("component"))
        .orderBy(col("node"))
    }),
    "kg_nesting" -> ((s, d) =>
      // localCheckpoint: the mention table is materialized ONCE and the
      // containment self-join reads it twice — without it both join
      // sides would re-run the extraction kernel (2x the corpus scan)
      nestingJoin(Extract.run(s, nFilesFor(d)).toDF()
        .select(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"))
        .localCheckpoint())),
    // 2-hop graph traversal (a calls b, b calls c within one doc).
    // Here both sides are projections of the freshly-computed triple
    // set, so the equi-join on (mid, docId) shuffles both — an
    // equi-join on the hop key, never a cross join. At cluster scale
    // the consumption path reads the PUBLISHED table instead
    // (GraphTables: bucketed by hash(subj), so the b-side arrives
    // co-located and single-entity hops are bucket-pruned point
    // lookups — entityEdges, asserted in GraphSinkSpec).
    "kg_twohop" -> ((s, d) => {
      val t = Pipeline.run(s, nFilesFor(d)).triples
        .filter(col("pred") === "calls")
        .select(col("subj"), col("obj"), col("docId"))
        .localCheckpoint() // materialize once; both hop sides read it
      val a = t.select(col("subj").as("caller"), col("obj").as("mid"),
        col("docId"))
      val b = t.select(col("subj").as("mid"), col("obj").as("callee"),
        col("docId"))
      a.join(b, Seq("mid", "docId"))
        .select(col("caller"), col("mid"), col("callee"), col("docId"))
        .distinct()
        .orderBy(col("caller"), col("mid"), col("callee"), col("docId"))
    }),
    // degree centrality over the calls graph (canonical entities):
    // two groupBy counts + a full-outer merge — integer-exact, so the
    // oracle hash-compares. The graph-analytics consumption demo next
    // to kg_twohop's traversal.
    "kg_degree" -> ((s, d) => {
      val t = Pipeline.run(s, nFilesFor(d)).triples
        .filter(col("pred") === "calls")
        .select(col("subj"), col("obj"))
        .localCheckpoint()
      val outD = t.groupBy(col("subj").as("entity"))
        .agg(count(lit(1)).as("out_deg"))
      val inD = t.groupBy(col("obj").as("entity"))
        .agg(count(lit(1)).as("in_deg"))
      outD.join(inD, Seq("entity"), "full_outer")
        .select(col("entity"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"))
        .orderBy(col("entity"))
    }),
    // the reference's prediction-file sink format (write_predict,
    // evaluation.py:64-68: per sentence the '|'-joined "start,end type"
    // strings; the reference's list(set(...)) order is nondeterministic,
    // normalized here to sorted). One groupBy on the extraction key.
    "kg_predict_lines" -> ((s, d) =>
      Extract.run(s, nFilesFor(d)).toDF()
        .select(col("docId"), col("sentId"),
          format_string("%d,%d %s", col("start"), col("end"),
            col("entType")).as("m"))
        .groupBy(col("docId"), col("sentId"))
        .agg(concat_ws("|", array_sort(collect_list(col("m")))).as("line"))
        .orderBy(col("docId"), col("sentId"))),
    "neg_sample" -> (negSample _),
    // K10 driver-graded: the Aligner soft dictionary lookup decoded
    // over the negSample corpus slice. Integer-exact output (argmax
    // positions, first-maximum tie-break); the oracle recomputes every
    // similarity from the dumped encodings and must decode the same
    // positions (AlignerSpec pins the top-2 margin floor that makes
    // the cross-engine float summation order irrelevant).
    "align_lookup" -> ((s, d) =>
      graft.kernel.Aligner.alignTable(
        Extract.sentences(Extract.corpus(s, negSampleFiles(d))),
        AlignQueries)
        .orderBy(col("docId"), col("sentId"), col("query"))),
    // K11 driver-graded: the monitoring loss table of the default
    // bundle over the closed-form labeled cell set (gold positives +
    // the K12-sampled negatives), integerized at 1e9 resolution. The
    // gold side is the SEQUENTIAL TWIN (Losses.twinCells — same cell
    // set, same kernel entry, driver-side loops), dumped by Verify;
    // LossSpec carries the bit-exact double claim underneath.
    "loss_cells" -> ((s, d) => {
      import graft.evalm.Losses
      val sc = lit(Losses.LossScale)
      Losses.evalCorpus(s, negSampleFiles(d))
        .select(col("docId"), col("sentId"), col("start"), col("end"),
          col("label"),
          floor(col("ce") * sc).as("ce_e9"),
          floor(col("focal") * sc).as("focal_e9"),
          floor(col("smooth") * sc).as("smooth_e9"),
          floor(col("ldam") * sc).as("ldam_e9"),
          floor(col("na_bce") * sc).as("na_bce_e9"),
          floor(col("ent_ce") * sc).as("ent_ce_e9"))
        .orderBy(col("docId"), col("sentId"), col("start"), col("end"))
    }),
    "kg_eval" -> ((s, d) => {
      val n = nFilesFor(d)
      val st = Pipeline.run(s, n)
      val mT = StrictMetric.triplePrf(st.triples, Pipeline.goldTriples(s, n))
      val mM = StrictMetric.prf(st.mentions.toDF(), Pipeline.goldMentions(s, n))
      import s.implicits._
      Seq(
        ("triples", mT.correct, mT.npred, mT.ngold, mT.p, mT.r, mT.f1),
        ("mentions", mM.correct, mM.npred, mM.ngold, mM.p, mM.r, mM.f1))
        .toDF("level", "correct", "npred", "ngold", "p", "r", "f1")
        .orderBy(col("level"))
    }))

  // ----------------------------------------------------------------
  // DuckDB oracles over the gold parquet Verify materializes.
  // `__GOLDDIR__` -> absolute sibling gold dir (substituted by Verify at dump
  // time). "start"/"end"/"commit" are quoted (reserved words).
  // ----------------------------------------------------------------

  private def gold(t: String) =
    s"read_parquet('__GOLDDIR__/$t/*.parquet')"

  val oracles: Map[String, String] = Map(
    // the corpus invariant is RECOMPUTED by DuckDB: sha256 over the raw
    // content must equal the sha256 column the engine carries
    "kg_corpus" ->
      s"""SELECT repo, path, "commit", lang, sha256(content) AS sha256
         |FROM ${gold("corpus")} ORDER BY repo, path""".stripMargin,
    "kg_mentions" ->
      s"""SELECT docId, sentId, "start", "end", entType, surface
         |FROM ${gold("mentions")}
         |ORDER BY docId, sentId, "start", "end", entType""".stripMargin,
    // identical gold: EMA decode must reproduce the raw bundle's
    // decisions exactly (K13)
    "kg_mentions_ema" ->
      s"""SELECT docId, sentId, "start", "end", entType, surface
         |FROM ${gold("mentions")}
         |ORDER BY docId, sentId, "start", "end", entType""".stripMargin,
    "kg_triples" ->
      s"""SELECT subj, pred, obj, docId FROM ${gold("triples")}
         |ORDER BY subj, pred, obj, docId""".stripMargin,
    "kg_incremental" ->
      s"""SELECT subj, pred, obj, docId FROM ${gold("triples")}
         |ORDER BY subj, pred, obj, docId""".stripMargin,
    "kg_canon" ->
      s"""SELECT entity, canonical FROM ${gold("canon")}
         |ORDER BY entity""".stripMargin,
    // closed form: every chain node's component is the chain minimum
    "kg_cc_chain" ->
      """SELECT printf('n%07d', i) AS node, 'n0000000' AS component
        |FROM range(0, 600001) t(i) ORDER BY node""".stripMargin,
    "kg_nesting" ->
      s"""WITH m AS (SELECT * FROM ${gold("mentions")}),
         |enc AS (
         |  SELECT a.docId, a.sentId, a."start", a."end", a.entType,
         |    b."start" AS enc_start, b."end" AS enc_end,
         |    b.entType AS enc_type,
         |    row_number() OVER (
         |      PARTITION BY a.docId, a.sentId, a."start", a."end", a.entType
         |      ORDER BY b."end" - b."start", b."start", b.entType) AS rn
         |  FROM m a JOIN m b ON a.docId = b.docId AND a.sentId = b.sentId
         |    AND b."start" <= a."start" AND a."end" <= b."end"
         |    AND (b."start" < a."start" OR a."end" < b."end"))
         |SELECT docId, sentId, "start", "end", entType,
         |  enc_start, enc_end, enc_type
         |FROM enc WHERE rn = 1
         |ORDER BY docId, sentId, "start", "end", entType""".stripMargin,
    "kg_twohop" ->
      s"""WITH t AS (SELECT subj, obj, docId FROM ${gold("triples")}
         |  WHERE pred = 'calls')
         |SELECT DISTINCT a.subj AS caller, a.obj AS mid, b.obj AS callee,
         |  a.docId
         |FROM t a JOIN t b ON a.obj = b.subj AND a.docId = b.docId
         |ORDER BY 1, 2, 3, 4""".stripMargin,
    "kg_degree" ->
      s"""WITH t AS (SELECT subj, obj FROM ${gold("triples")}
         |  WHERE pred = 'calls'),
         |o AS (SELECT subj AS entity, count(*) AS out_deg FROM t GROUP BY 1),
         |i AS (SELECT obj AS entity, count(*) AS in_deg FROM t GROUP BY 1)
         |SELECT entity,
         |  CAST(coalesce(out_deg, 0) AS BIGINT) AS out_deg,
         |  CAST(coalesce(in_deg, 0) AS BIGINT) AS in_deg
         |FROM o FULL OUTER JOIN i USING (entity)
         |ORDER BY entity""".stripMargin,
    "kg_predict_lines" ->
      s"""SELECT docId, sentId,
         |  string_agg(printf('%d,%d %s', "start", "end", entType), '|'
         |    ORDER BY printf('%d,%d %s', "start", "end", entType)) AS line
         |FROM ${gold("mentions")}
         |GROUP BY docId, sentId ORDER BY docId, sentId""".stripMargin,
    // the full sampler recomputed from CLOSED FORM: universe from the
    // generator's sentence lengths (never the engine tokenizer), labels
    // from gold mentions, same integer keep rule. generate_series is
    // INCLUSIVE of stop (and empty when stop < start) in DuckDB; the
    // scalar-list unnest form is used because the table-function form
    // rejects lateral column arguments. The two unnests mirror
    // spans(n, 16) + the exclusive-end shift exactly.
    "neg_sample" ->
      s"""WITH sents AS (SELECT docId, sentId, n
         |  FROM ${gold("sentences")}),
         |u1 AS (SELECT docId, sentId, n,
         |    unnest(generate_series(0, n - 1)) AS s
         |  FROM sents),
         |univ AS (SELECT docId, sentId, s AS "start",
         |    unnest(generate_series(s + 1, least(n, s + 16))) AS "end"
         |  FROM u1),
         |pos AS (SELECT DISTINCT docId, sentId, "start", "end"
         |  FROM ${gold("mentions")}),
         |lab AS (
         |  SELECT u.docId, u.sentId, u."start", u."end",
         |    max(CASE WHEN p."start" = u."start" AND p."end" = u."end"
         |        THEN 1 ELSE 0 END) AS is_pos,
         |    max(CASE WHEN p."start" IS NOT NULL THEN 1 ELSE 0 END) AS near
         |  FROM univ u LEFT JOIN pos p
         |    ON u.docId = p.docId AND u.sentId = p.sentId
         |    AND abs(u."start" - p."start") + abs(u."end" - p."end") <= $HardNegDist
         |  GROUP BY 1, 2, 3, 4),
         |r AS (SELECT docId, sentId, "start", "end",
         |    CASE WHEN is_pos = 1 THEN 'pos'
         |         WHEN near = 1 THEN 'hard_neg'
         |         ELSE 'easy_neg' END AS role
         |  FROM lab),
         |c AS (SELECT *,
         |    sum(CASE WHEN role = 'pos' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY docId, sentId) AS pos_cnt,
         |    sum(CASE WHEN role = 'easy_neg' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY docId, sentId) AS easy_cnt
         |  FROM r)
         |SELECT docId, sentId, CAST("start" AS INTEGER) AS "start",
         |  CAST("end" AS INTEGER) AS "end", role
         |FROM c
         |WHERE role <> 'easy_neg' OR
         |  (('0x' || substr(md5(docId || '#' || sentId || '#' || "start"
         |      || '#' || "end" || '#42'), 1, 15))::BIGINT % 1000000)
         |    * (easy_cnt * 1000000 + 1) <= pos_cnt * 1000000000000
         |ORDER BY docId, sentId, "start", "end"""".stripMargin,
    // K10: every similarity recomputed from the dumped per-dimension
    // tables (align_mem: memory embedding + pointer memory transform
    // per position; align_q: per-query head transforms), then the
    // first-maximum argmax with the position tie-break — ties in the
    // engine are EXACT float ties (identical tokens -> identical
    // vectors). For the tie-break to fire in DuckDB too, the per-
    // dimension sums MUST be ordered (ORDER BY q.d): an unordered
    // parallel sum adds the same summands in a run-dependent order,
    // and at sf0.1 that turned an exact three-way tie into an
    // arbitrary strict winner (pointer head, 1 cell of 152792 — the
    // ordered sum makes identical summand sequences identical
    // doubles, so ties stay exact and both engines break them by
    // position). tanh is spelled in the overflow-stable form
    // 1 - 2/(exp(2x)+1) (this DuckDB build has exp but no tanh).
    "align_lookup" ->
      s"""WITH sims AS (
         |  SELECT m.docId, m.sentId, q.query, m.pos,
         |    sum(q.h * m.vec ORDER BY q.d) AS sa,
         |    sum(q.v * (1 - 2 / (exp(2 * (q.hq + m.hm)) + 1))
         |        ORDER BY q.d) AS sp,
         |    sum(q.tqb * m.vec ORDER BY q.d) + max(q.qterm) AS sb
         |  FROM read_parquet('__GOLDDIR__/align_mem/*.parquet') m
         |  JOIN read_parquet('__GOLDDIR__/align_q/*.parquet') q
         |    ON m.d = q.d
         |  GROUP BY 1, 2, 3, 4)
         |SELECT docId, sentId, query,
         |  CAST(first(pos ORDER BY sa DESC, pos) AS INTEGER) AS aligner_pos,
         |  CAST(first(pos ORDER BY sp DESC, pos) AS INTEGER) AS pointer_pos,
         |  CAST(first(pos ORDER BY sb DESC, pos) AS INTEGER)
         |    AS pbiaffine_pos
         |FROM sims GROUP BY 1, 2, 3
         |ORDER BY docId, sentId, query""".stripMargin,
    // K11: the gold is the sequential twin's table — the oracle is a
    // plain ordered select, so the hash compare pins the DISTRIBUTED
    // loss plan against the single-threaded recompute integer-exactly
    "loss_cells" ->
      s"""SELECT docId, sentId, "start", "end", label, ce_e9, focal_e9,
         |  smooth_e9, ldam_e9, na_bce_e9, ent_ce_e9
         |FROM ${gold("loss_cells")}
         |ORDER BY docId, sentId, "start", "end"""".stripMargin,
    // P/R/F1 must be EXACTLY 1.0 against the closed-form gold, with
    // correct == npred == ngold == |gold| — computed from the gold side
    // alone, so a single extra or missing prediction fails the row
    "kg_eval" ->
      s"""WITH m AS (SELECT count(*) AS n FROM ${gold("mentions")}),
         |t AS (SELECT count(*) AS n FROM ${gold("triples")})
         |SELECT * FROM (
         |  SELECT 'mentions' AS level, n AS correct, n AS npred,
         |    n AS ngold, CAST(1.0 AS DOUBLE) AS p, CAST(1.0 AS DOUBLE) AS r,
         |    CAST(1.0 AS DOUBLE) AS f1 FROM m
         |  UNION ALL
         |  SELECT 'triples', n, n, n, CAST(1.0 AS DOUBLE),
         |    CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE) FROM t)
         |ORDER BY level""".stripMargin)
}
