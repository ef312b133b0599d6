package graft.queries

import graft.ops.{DedupOps, Multimodal, SimilarityOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the documents/embeddings
  * tables: dedup family, similarity search, text analysis, multimodal
  * plumbing. Oracle SQL provided for everything SQL-expressible (the
  * hash family is the portable md5-60bit arithmetic so DuckDB
  * reproduces values exactly); LSH-ANN and the mapPartitions decode
  * stub are rows-only + ScalaTest-covered. */
object TrainingDataQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  type Q = (SparkSession, String) => DataFrame

  private val textStats: Q = (s, d) => {
    val (nTok, nSub) = TextOps.tokenCounts(col("text"))
    val quality = TextOps.qualityCols(col("text"))
    docs(s, d).select(
      Seq(col("doc_id"), nTok.as("n_tokens_ws"), nSub.as("n_subtokens")) ++
        quality.drop(1).map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  private val langId: Q = (s, d) => {
    val cols = TextOps.langIdCols(col("text"))
    docs(s, d).select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  // F1/F2: the reference's exact ordered clean / remove_space chain
  // (align_input.py:7-15) as one codegen'd narrow map over documents
  private val cleanAlign: Q = (s, d) =>
    docs(s, d).select(col("doc_id"),
      TextOps.ptbClean(col("text")).as("cleaned"),
      TextOps.removeSpace(col("text")).as("squeezed"))
      .orderBy(col("doc_id"))

  private val winnowFp: Q = (s, d) =>
    TextOps.winnowFingerprints(docs(s, d), "doc_id", "text")
      .orderBy(col("doc"), col("fp"))

  private val dedupExactDocs: Q = (s, d) =>
    DedupOps.exactGroups(docs(s, d), "doc_id", "text")
      .orderBy(col("fingerprint"))

  // df-cut at 200: shingles present in >200 documents are dropped from
  // the inverted-index candidate generation (mirrored in the oracle) —
  // the web-scale guard against quadratic hot-shingle joins. Only the
  // jaccard path needs it: minhash candidates come from a band join
  // that hot shingles cannot explode.
  private val MaxDf = 200L

  private val dedupJaccard: Q = (s, d) =>
    DedupOps.jaccardPairs(docs(s, d), "doc_id", "text", 0.7, MaxDf)
      .orderBy(col("d1"), col("d2"))

  private val dedupMinhash: Q = (s, d) =>
    DedupOps.minhashLshPairs(docs(s, d), "doc_id", "text", 0.7)
      .orderBy(col("d1"), col("d2"))

  private val dedupSimhash: Q = (s, d) =>
    DedupOps.simhashPairs(docs(s, d), "doc_id", "text", 3)
      .withColumn("hamming", col("hamming").cast("int"))
      .orderBy(col("d1"), col("d2"))

  private val annTopk: Q = (s, d) =>
    SimilarityOps.bruteForceTopK(emb(s, d), col("vec_id") < 10, 5)
      .orderBy(col("query_id"), col("rank"))

  private val annIvf: Q = (s, d) =>
    SimilarityOps.ivfTopK(emb(s, d), col("vec_id") < 10, 5)
      .orderBy(col("query_id"), col("rank"))

  private val annLsh: Q = (s, d) =>
    SimilarityOps.lshTopK(emb(s, d), col("vec_id") < 10, 5)
      .orderBy(col("query_id"), col("rank"))

  // threshold 0.3: the synthetic embeddings carry no planted dups, so
  // the nearest pair to the cut sits >= 5e-7 away at every sf — far
  // above cross-engine double-summation noise (~1e-14)
  private val dedupCosine: Q = (s, d) =>
    SimilarityOps.cosineNearDupPairs(emb(s, d), 0.3)
      .orderBy(col("d1"), col("d2"))

  private val embedPairs: Q = (s, d) =>
    SimilarityOps.topPairs(emb(s, d), sampleMod = 10, topN = 20)
      .orderBy(col("rank"))

  // F13, the rand(seed) form (reference span_utils.py:35-39): SEEDED
  // STRATIFIED Bernoulli sampling as a pure narrow filter. The uniform
  // is hash-derived — u = md5h60(doc_id # seed) % 1e6 — which is what a
  // reproducible distributed sampler actually wants: Spark's
  // rand(seed) is seeded PER PARTITION, so a repartition or a changed
  // split count silently changes which rows are kept; the hash uniform
  // is a pure function of the ROW, stable under any partitioning (and
  // portable, so DuckDB replicates it exactly). Rates are stratified
  // per lang: en keeps 10%, everything else 5%.
  private val SampleSeed = 42
  private val sampleSeeded: Q = (s, d) => {
    val u = pmod(TextOps.md5h60(
      concat(col("doc_id").cast("string"), lit(s"#$SampleSeed"))),
      lit(1000000L))
    docs(s, d)
      .withColumn("u_ppm", u.cast("int"))
      .filter(col("u_ppm") <
        when(col("lang") === "en", lit(100000)).otherwise(lit(50000)))
      .select(col("doc_id"), col("lang"), col("u_ppm"))
      .orderBy(col("doc_id"))
  }

  // Output restricted to integer-exact columns so the DuckDB oracle
  // reproduces them from the raw text (the payload is its utf-8 bytes);
  // checksum + float features stay ScalaTest-covered (OpsSpec).
  private val mmFeatures: Q = (s, d) => {
    val media = Multimodal.mediaTable(docs(s, d))
    Multimodal.decodeFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_sum"))
      .orderBy(col("media_id"))
  }

  val all: Map[String, Q] = Map(
    "text_stats" -> textStats,
    "lang_id" -> langId,
    "clean_align" -> cleanAlign,
    "winnow_fp" -> winnowFp,
    "dedup_exact_docs" -> dedupExactDocs,
    "dedup_jaccard" -> dedupJaccard,
    "dedup_minhash" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "ann_topk" -> annTopk,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "dedup_cosine" -> dedupCosine,
    "embed_pairs" -> embedPairs,
    "sample_seeded" -> sampleSeeded,
    "mm_features" -> mmFeatures)

  // ----------------------------------------------------------------
  // DuckDB oracles
  // ----------------------------------------------------------------

  private def inList(set: Seq[String]) =
    set.map(w => s"'$w'").mkString("[", ", ", "]")

  // DuckDB string literal for a clean-chain operand (tab/newline via
  // chr(), quotes doubled) — the oracle expression is GENERATED from
  // TextOps.cleanChain so both engines run the identical ordered chain
  private def duckLit(s: String): String = s match {
    case "\t" => "chr(9)"
    case "\n" => "chr(10)"
    case _    => "'" + s.replace("'", "''") + "'"
  }
  private def cleanOver(base: String): String =
    TextOps.cleanChain.foldLeft(base) { case (e, (f, t)) =>
      s"replace($e, ${duckLit(f)}, ${duckLit(t)})" }

  private val shinglesCte =
    """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id AS doc,
      |  unnest(list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
      |                        for i in range(1, len(t)-1)])) AS ng
      |FROM tt)
      |""".stripMargin

  // bucket recompute from the dumped hyperplane matrix — the ONE
  // blocking definition shared by the ann_lsh and dedup_cosine oracles
  // (mirrors SimilarityOps.lshIndex: d > 0 sign test, 1 << plane)
  private val lshBucketCte =
    """WITH pl AS (SELECT * FROM
      |    read_parquet('__GOLDDIR__/lsh_planes/*.parquet')),
      |b AS (SELECT e.vec_id, pl.tbl,
      |    CAST(sum(CASE WHEN
      |      list_inner_product(e.embedding::DOUBLE[], pl.vec) > 0
      |      THEN 1 << pl.plane ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e, pl GROUP BY 1, 2),
      |""".stripMargin

  // candidate generation over df-cut postings, exact verification over
  // the full postings (value-identical to the engine's narrow
  // array-intersection verify) — mirrors DedupOps.jaccardPairs(maxDf=200)
  private val jaccardBody =
    s""", dfc AS (SELECT ng FROM sh GROUP BY ng HAVING count(*) <= $MaxDf),
      |shx AS (SELECT sh.doc, sh.ng FROM sh JOIN dfc USING (ng)),
      |cand AS (SELECT DISTINCT a.doc AS d1, b.doc AS d2
      |  FROM shx a JOIN shx b ON a.ng = b.ng AND a.doc < b.doc),
      |n AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
      |common AS (SELECT d1, d2, count(*) AS c FROM cand
      |  JOIN sh s1 ON d1 = s1.doc
      |  JOIN sh s2 ON d2 = s2.doc AND s1.ng = s2.ng GROUP BY 1, 2)
      |SELECT d1, d2,
      |  CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard
      |FROM common JOIN n n1 ON d1 = n1.doc JOIN n n2 ON d2 = n2.doc
      |WHERE CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) >= 0.7
      |ORDER BY d1, d2""".stripMargin

  private val minhashOracle: String = {
    val mins = (0 until DedupOps.NumHashes).map { i =>
      s"min((x * ${2 * i + 1} + ${97 + 31 * i}) % ${DedupOps.PMOD}) AS mh$i"
    }.mkString(",\n  ")
    val bands = (0 until DedupOps.Bands).map { b =>
      val sig = (0 until DedupOps.RowsPerBand)
        .map(r => s"mh${b * DedupOps.RowsPerBand + r}")
        .mkString("||','||")
      s"SELECT doc, $b AS band, $sig AS sig FROM sig"
    }.mkString("\n  UNION ALL ")
    shinglesCte +
      s""", hx AS (SELECT doc,
         |  ('0x'||substr(md5(ng),1,15))::BIGINT % ${DedupOps.P30} AS x FROM sh),
         |sig AS (SELECT doc,
         |  $mins
         |FROM hx GROUP BY doc),
         |bands AS (
         |  $bands),
         |cand AS (SELECT DISTINCT a.doc AS d1, b.doc AS d2 FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc),
         |n AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
         |common AS (SELECT d1, d2, count(*) AS c FROM cand
         |  JOIN sh s1 ON d1 = s1.doc
         |  JOIN sh s2 ON d2 = s2.doc AND s1.ng = s2.ng GROUP BY 1, 2)
         |SELECT d1, d2,
         |  CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) AS jaccard
         |FROM common JOIN n n1 ON d1 = n1.doc JOIN n n2 ON d2 = n2.doc
         |WHERE CAST(c AS DOUBLE) / CAST(n1.n + n2.n - c AS DOUBLE) >= 0.7
         |ORDER BY d1, d2""".stripMargin
  }

  private val simhashOracle: String = {
    val bits = (0 until 32).map { k =>
      s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS b$k"
    }.mkString(",\n  ")
    val sig = (0 until 32).map { k =>
      s"(CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END)"
    }.mkString(" + ")
    // 4 bands x 8 bits, mirroring DedupOps.SimhashBands/SimhashBandBits
    // (pigeonhole-complete for hamming <= 3)
    val mask = (1L << graft.ops.DedupOps.SimhashBandBits) - 1
    val bandRows = (0 until graft.ops.DedupOps.SimhashBands).map { b =>
      s"SELECT doc, simhash, $b AS band, " +
        s"(simhash >> ${b * graft.ops.DedupOps.SimhashBandBits}) & $mask " +
        "AS slice FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH tok AS (SELECT doc_id AS doc,
       |  unnest(list_distinct(string_split(text, ' '))) AS w FROM documents),
       |h AS (SELECT doc, ('0x'||substr(md5(w),1,15))::BIGINT AS h
       |  FROM tok WHERE length(w) > 0),
       |bits AS (SELECT doc,
       |  $bits
       |FROM h GROUP BY doc),
       |sig AS (SELECT doc, $sig AS simhash FROM bits),
       |sb AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.doc AS d1, b.doc AS d2,
       |    a.simhash AS s1, b.simhash AS s2
       |  FROM sb a JOIN sb b ON a.band = b.band AND a.slice = b.slice
       |    AND a.doc < b.doc)
       |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
       |ORDER BY d1, d2""".stripMargin
  }

  private val langIdOracle: String = {
    val hits = TextOps.langSets.map { case (l, set) =>
      s"CAST(len(list_filter(string_split(text, ' '), w -> list_contains(${inList(set)}, w))) AS INT) AS hits_$l"
    }.mkString(",\n  ")
    val langs = TextOps.langSets.map(_._1)
    val best = s"greatest(${langs.map(l => s"hits_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN hits_$l = $best THEN '$l'")
      .mkString("CASE WHEN " + best + " = 0 THEN 'und' ", " ", " END")
    s"""SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
       |  $pred AS lang_pred
       |FROM (SELECT doc_id,
       |  $hits
       |FROM documents) ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the [^...] classes interpolate TextOps.wsChars — shorthand \s
    // differs between Java regex (engine) and RE2 (oracle) on \x0B
    "text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_ws,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9${TextOps.wsChars}]')) AS INT) AS n_subtokens,
         |  CAST(length(text) AS INT) AS n_chars,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9${TextOps.wsChars}]')) AS DOUBLE) /
         |    CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
         |  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) /
         |    CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    w -> list_contains(${inList(TextOps.stopEn)}, w))) AS DOUBLE) /
         |    CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) AS stopword_ratio,
         |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) /
         |    CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) AS mean_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" -> langIdOracle,
    // the whitespace class interpolates from TextOps.wsClass — one
    // definition for both engines (shorthand \s differs: Java has
    // \x0B in it, RE2 does not)
    "clean_align" ->
      s"""SELECT doc_id, ${cleanOver("text")} AS cleaned,
         |  ${cleanOver(s"regexp_replace(text, '${TextOps.wsClass}', '', 'g')")} AS squeezed
         |FROM documents ORDER BY doc_id""".stripMargin,
    "winnow_fp" ->
      """WITH p AS (SELECT doc_id AS doc, text, length(text) - 7 AS n,
        |    unnest(generate_series(1, length(text) - 7)) AS pos
        |  FROM documents),
        |g AS (SELECT doc, n, pos,
        |    ('0x'||substr(md5(substring(text, pos, 8)),1,15))::BIGINT AS h
        |  FROM p),
        |w AS (SELECT doc, n, pos, min(h) OVER (PARTITION BY doc
        |    ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM g)
        |SELECT DISTINCT doc, fp FROM w WHERE pos <= n - 3
        |ORDER BY doc, fp""".stripMargin,
    "dedup_exact_docs" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        |  min(doc_id) AS rep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_jaccard" -> (shinglesCte + jaccardBody),
    "dedup_minhash" -> minhashOracle,
    "dedup_simhash" -> simhashOracle,
    // the oracle recomputes cell assignment (exact same ascending
    // squared-distance arithmetic) and nProbe=2 probing from the
    // dumped trained centroids (_gold/ivf_centroids)
    "ann_ivf" ->
      """WITH c AS (SELECT cell, vec FROM
        |    read_parquet('__GOLDDIR__/ivf_centroids/*.parquet')),
        |d AS (SELECT e.vec_id, c.cell,
        |    list_aggregate(list_transform(generate_series(1, len(c.vec)),
        |      i -> (e.embedding[i]::DOUBLE - c.vec[i]) *
        |           (e.embedding[i]::DOUBLE - c.vec[i])), 'sum') AS dist
        |  FROM embeddings e, c),
        |a AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY dist, cell) AS rn FROM d) WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY dist, cell) AS rn FROM d WHERE vec_id < 10)
        |  WHERE rn <= 2),
        |cand AS (SELECT DISTINCT qp.query_id, a.vec_id AS neighbor_id
        |  FROM qp JOIN a ON qp.cell = a.cell AND a.vec_id <> qp.query_id),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY
        |      list_cosine_similarity(eq.embedding::DOUBLE[],
        |                             ec.embedding::DOUBLE[]) DESC,
        |      neighbor_id) AS rank
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = query_id
        |  JOIN embeddings ec ON ec.vec_id = neighbor_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the oracle recomputes the sign-pattern buckets from the dumped
    // hyperplane matrix (_gold/lsh_planes), builds the same candidate
    // set, and ranks by exact cosine — fully independent of the Spark
    // mapPartitions kernel path
    "ann_lsh" -> (lshBucketCte +
      """q AS (SELECT vec_id AS query_id, tbl, bucket FROM b
        |      WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        |  FROM q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |    AND c.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY
        |      list_cosine_similarity(eq.embedding::DOUBLE[],
        |                             ec.embedding::DOUBLE[]) DESC,
        |      neighbor_id) AS rank
        |  FROM cand
        |  JOIN embeddings eq ON eq.vec_id = query_id
        |  JOIN embeddings ec ON ec.vec_id = neighbor_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "ann_topk" ->
      """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
        |                                      c.embedding::DOUBLE[]) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // byte_sum: the engine sums the payload's UTF-8 BYTES; the oracle
    // derives each char's UTF-8 byte sum from its codepoint (ascii(c))
    // arithmetically, so the row stays exact on non-ASCII documents too
    // (a plain ascii(c) sum would diverge on the first multibyte char)
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(list_aggregate(list_transform(string_split_regex(text, ''),
        |    c -> CASE
        |      WHEN ascii(c) < 128 THEN ascii(c)
        |      WHEN ascii(c) < 2048 THEN
        |        320 + ascii(c) // 64 + ascii(c) % 64
        |      WHEN ascii(c) < 65536 THEN
        |        480 + ascii(c) // 4096 + (ascii(c) // 64) % 64
        |            + ascii(c) % 64
        |      ELSE
        |        624 + ascii(c) // 262144 + (ascii(c) // 4096) % 64
        |            + (ascii(c) // 64) % 64 + ascii(c) % 64
        |    END), 'sum')
        |       AS BIGINT) AS byte_sum
        |FROM documents ORDER BY media_id""".stripMargin,
    // same bucket recompute as ann_lsh (dumped plane matrix), then the
    // exact-cosine threshold over candidates only — mirrors
    // SimilarityOps.cosineNearDupPairs(0.3) blocking exactly
    "dedup_cosine" -> (lshBucketCte +
      """cand AS (SELECT DISTINCT a.vec_id AS d1, c.vec_id AS d2
        |  FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket
        |    AND a.vec_id < c.vec_id)
        |SELECT d1, d2 FROM cand
        |JOIN embeddings e1 ON e1.vec_id = d1
        |JOIN embeddings e2 ON e2.vec_id = d2
        |WHERE list_cosine_similarity(e1.embedding::DOUBLE[],
        |                             e2.embedding::DOUBLE[]) >= 0.3
        |ORDER BY d1, d2""".stripMargin),
    "sample_seeded" ->
      s"""SELECT doc_id, lang,
         |  CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#$SampleSeed'),1,15))::BIGINT
         |       % 1000000 AS INT) AS u_ppm
         |FROM documents
         |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'#$SampleSeed'),1,15))::BIGINT
         |      % 1000000 < CASE WHEN lang = 'en' THEN 100000 ELSE 50000 END
         |ORDER BY doc_id""".stripMargin,
    "embed_pairs" ->
      """SELECT CAST(rank AS INT) AS rank, id1, id2 FROM (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    row_number() OVER (
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
        |                                      b.embedding::DOUBLE[]) DESC,
        |               a.vec_id, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id % 10 = 0)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin)
}
