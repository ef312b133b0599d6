package graft.kernel

import graft.core.Sentence
import org.apache.spark.sql.{DataFrame, Dataset}

/** K10: the DETR-legacy query-to-memory similarity heads (reference
  * model/aligner.py:7-76) — Aligner (linear+ReLU dot), Pointer
  * (additive tanh), PBiaffine (biaffine + bi/uni terms, num_class=1).
  * The reference's flagship decode never calls them (they back the
  * retired DETR-style models), so the engine re-targets them at the
  * one inference-shaped job the same arithmetic performs: a SOFT
  * DICTIONARY LOOKUP — align a query vector (the hash embedding of a
  * known alias) against a sentence's token feature vectors and return
  * per-position similarities, masked positions filled with -1e6
  * exactly like the reference's ce_mask handling.
  *
  * Query and memory live in the ENCODER EMBEDDING space (the
  * hash+char block of the kernel's token features, L2-normalized) —
  * the reference aligns against encoder hidden states, never POS
  * one-hots, and the normalization plays the role of the learned
  * temperature. Stand-in parameters follow the K1 convention (seeded,
  * fixed): the linear and biaffine cores are identity-anchored with
  * small seeded Gaussian noise — the "learned" solution these heads
  * converge to when query and memory share an embedding space — which
  * makes the dot and biaffine heads decision-bearing: an exact token
  * match maximizes the similarity (self-cosine is exactly 1; the
  * vocabulary's planted suffix-sharing pairs like readBlock/writeBlock
  * stay strictly below it), asserted in AlignerSpec.
  */
object Aligner {

  /** The reference's masked_fill value (aligner.py:23,41,76). */
  val MaskFill: Double = -1e6

  final case class AlignWeights(
      dim: Int,
      wLin: Array[Array[Double]],  // Aligner.linear  (dim x dim)
      wH: Array[Array[Double]],    // Pointer.W_h     (dim x dim)
      wM: Array[Array[Double]],    // Pointer.W_m     (dim x dim)
      v: Array[Double],            // Pointer.v       (dim)
      tri: Array[Array[Double]],   // PBiaffine.tri   (dim x dim)
      bi0: Array[Double],          // PBiaffine.bi0   (dim, memory side)
      bi1: Array[Double],          // PBiaffine.bi1   (dim, query side)
      uni: Double)                 // PBiaffine.uni

  /** Embedding-space width: the hash+char block of the kernel
    * features (tag one-hots are not part of the encoder stream). */
  def embDim(w: Weights = Weights.default): Int = w.nHashDims + w.nCharDims

  /** Seeded stand-in bundle. wLin and tri are identity + small noise
    * (the "learned" alignment solution when query and memory share an
    * embedding space — noise well below the worst-pair cosine margin);
    * the rest is plain seeded noise like every other stand-in
    * parameter (K1). */
  def default(dim: Int = embDim()): AlignWeights = {
    val rng = new scala.util.Random(13L)
    def g1(n: Int) = Array.fill(n)(rng.nextGaussian() * 0.05)
    def g2(n: Int, m: Int, std: Double = 0.05) =
      Array.fill(n, m)(rng.nextGaussian() * std)
    def eye(m: Array[Array[Double]]): Array[Array[Double]] = {
      var i = 0
      while (i < m.length) { m(i)(i) += 1.0; i += 1 }
      m
    }
    AlignWeights(dim,
      wLin = eye(g2(dim, dim, 0.01)), wH = g2(dim, dim), wM = g2(dim, dim),
      v = g1(dim), tri = eye(g2(dim, dim, 0.01)), bi0 = g1(dim),
      bi1 = g1(dim), uni = rng.nextGaussian() * 0.05)
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var n2 = 0.0; var i = 0
    while (i < v.length) { n2 += v(i) * v(i); i += 1 }
    val inv = if (n2 > 0.0) 1.0 / StrictMath.sqrt(n2) else 0.0
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Weight of the word-hash block in the alignment embedding. The
    * raw kernel features put the char-recurrence state at ~10x the
    * hash block's per-dim magnitude, and char states live in an
    * 8-dim space where unrelated tokens collide badly — a naive
    * normalization would align by last letters. Per-block
    * normalization with a hash-dominant mix keeps the 13-dim
    * token-identity signal in charge (self-cosine is still exactly 1;
    * subword-sharing pairs keep a ~0.5 hash-cosine gap). */
  private val HashBlockWeight = 0.8

  /** Alignment embedding of a raw kernel token vector: each block
    * (hash, char) L2-normalized, mixed hash-heavy, then the whole
    * normalized to unit length. */
  private def embedOf(raw: Array[Double], w: Weights): Array[Double] = {
    val nh = w.nHashDims
    val out = new Array[Double](raw.length)
    var n2 = 0.0; var i = 0
    while (i < nh) { n2 += raw(i) * raw(i); i += 1 }
    var inv = if (n2 > 0.0) HashBlockWeight / StrictMath.sqrt(n2) else 0.0
    i = 0
    while (i < nh) { out(i) = raw(i) * inv; i += 1 }
    n2 = 0.0; i = nh
    while (i < raw.length) { n2 += raw(i) * raw(i); i += 1 }
    inv =
      if (n2 > 0.0) (1.0 - HashBlockWeight) / StrictMath.sqrt(n2) else 0.0
    i = nh
    while (i < raw.length) { out(i) = raw(i) * inv; i += 1 }
    normalized(out)
  }

  private def matVec(m: Array[Array[Double]], x: Array[Double])
      : Array[Double] = {
    val out = new Array[Double](m.length)
    var i = 0
    while (i < m.length) {
      val row = m(i); var s = 0.0; var d = 0
      while (d < row.length) { s += row(d) * x(d); d += 1 }
      out(i) = s; i += 1
    }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Aligner head (aligner.py:12-24): sim_s = ReLU(W q) · m_s. */
  def alignerSim(q: Array[Double], memory: Array[Array[Double]],
      mask: Array[Boolean], aw: AlignWeights): Array[Double] = {
    val h = matVec(aw.wLin, q)
    var i = 0
    while (i < h.length) { if (h(i) < 0.0) h(i) = 0.0; i += 1 }
    Array.tabulate(memory.length)(s =>
      if (mask(s)) dot(h, memory(s)) else MaskFill)
  }

  /** Pointer head (aligner.py:26-42): sim_s = v · tanh(W_h q + W_m m_s). */
  def pointerSim(q: Array[Double], memory: Array[Array[Double]],
      mask: Array[Boolean], aw: AlignWeights): Array[Double] = {
    val hq = matVec(aw.wH, q)
    Array.tabulate(memory.length) { s =>
      if (!mask(s)) MaskFill
      else {
        val hm = matVec(aw.wM, memory(s))
        var acc = 0.0; var d = 0
        while (d < hq.length) {
          acc += aw.v(d) * StrictMath.tanh(hq(d) + hm(d)); d += 1
        }
        acc
      }
    }
  }

  /** PBiaffine head (aligner.py:44-77, num_class=1):
    * sim_s = m_s^T Tri q + bi0·m_s + bi1·q + uni. */
  def pbiaffineSim(q: Array[Double], memory: Array[Array[Double]],
      mask: Array[Boolean], aw: AlignWeights): Array[Double] = {
    val tq = matVec(aw.tri, q)
    val qTerm = dot(aw.bi1, q) + aw.uni
    Array.tabulate(memory.length)(s =>
      if (mask(s)) dot(memory(s), tq) + dot(aw.bi0, memory(s)) + qTerm
      else MaskFill)
  }

  /** First-maximum decode over a similarity row (the reference
    * argmaxes the sim tensor; first-seen wins ties like torch). */
  def argmaxAlign(sim: Array[Double]): Int = {
    var best = 0; var i = 1
    while (i < sim.length) { if (sim(i) > sim(best)) best = i; i += 1 }
    best
  }

  /** Query vector for an alias surface: the kernel's token embedding
    * (subword-pooled hash + char-recurrence state), L2-normalized.
    * An exact token match is identical by construction, whatever tag
    * the in-sentence occurrence carries. */
  def queryVec(q: String, w: Weights): Array[Double] =
    embedOf(TriaffineScorer.tokenVec(q, w), w)

  /** Token embedding vectors of one sentence — the "memory" stream
    * (the encoder-embedding block of the kernel's features,
    * L2-normalized; tokenVec returns a per-thread cached array, hence
    * the copy inside normalized). */
  def memoryOf(s: Sentence, w: Weights): Array[Array[Double]] = {
    val n = math.min(s.tokens.length, graft.extract.Tokenizer.maxSentLen)
    Array.tabulate(n)(k => embedOf(TriaffineScorer.tokenVec(s.tokens(k), w), w))
  }

  /** Distributed soft lookup: align each query alias against every
    * sentence, one narrow mapPartitions with the query list broadcast
    * (no shuffle, no join — the alignment is sentence-local). Emits
    * the decoded position per head. */
  def alignTable(sents: Dataset[Sentence], queries: Seq[String],
      aw: AlignWeights = default(), weights: Weights = Weights.default)
      : DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(queries.toArray)
    val baw = spark.sparkContext.broadcast(aw)
    val bw = spark.sparkContext.broadcast(weights)
    sents.mapPartitions { it =>
      val qs = bq.value; val a = baw.value; val w = bw.value
      val qVecs = qs.map(q => queryVec(q, w))
      it.flatMap { s =>
        val mem = memoryOf(s, w)
        if (mem.isEmpty) Iterator.empty
        else {
          val mask = Array.fill(mem.length)(true)
          qs.indices.iterator.map { qi =>
            (s.docId, s.sentId, qs(qi),
              argmaxAlign(alignerSim(qVecs(qi), mem, mask, a)),
              argmaxAlign(pointerSim(qVecs(qi), mem, mask, a)),
              argmaxAlign(pbiaffineSim(qVecs(qi), mem, mask, a)))
          }
        }
      }
    }.toDF("docId", "sentId", "query", "aligner_pos", "pointer_pos",
      "pbiaffine_pos")
  }

  // ------------------------------------------------------------------
  // Gold-dump tables for the driver-graded `align_lookup` oracle (the
  // ann_lsh/ann_ivf pattern: the engine dumps its ENCODINGS and
  // per-query head transforms; DuckDB independently replays the
  // downstream decision arithmetic — the per-position dot products,
  // the mask-free similarity rows, and the first-maximum argmax with
  // its position tie-break — and must land on the same decoded
  // positions). Both tables are dumped UNNESTED (one row per
  // dimension) so the oracle needs no list functions.
  // ------------------------------------------------------------------

  /** Per (sentence, position, dim): the memory embedding component
    * `vec` and the pointer head's memory transform `hm = (W_m m)[d]` —
    * everything position-dependent the three similarity forms read. */
  def memTable(sents: Dataset[Sentence], aw: AlignWeights = default(),
      weights: Weights = Weights.default): DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    val baw = spark.sparkContext.broadcast(aw)
    val bw = spark.sparkContext.broadcast(weights)
    sents.flatMap { s =>
      val a = baw.value; val w = bw.value
      val mem = memoryOf(s, w)
      mem.indices.flatMap { p =>
        val hm = matVec(a.wM, mem(p))
        mem(p).indices.map(d => (s.docId, s.sentId, p, d, mem(p)(d), hm(d)))
      }
    }.toDF("docId", "sentId", "pos", "d", "vec", "hm")
  }

  /** Per (query, dim): the query-side head transforms —
    * `h = ReLU(W q)` (aligner), `hq = W_h q` and the global `v`
    * (pointer), `tqb = (Tri q)[d] + bi0[d]` and the scalar
    * `qterm = bi1·q + uni` (pbiaffine) — so the oracle's similarity
    * per position is sum over d of elementwise products only:
    * aligner = Σ h·vec; pointer = Σ v·tanh(hq+hm);
    * pbiaffine = Σ tqb·vec + qterm. */
  def queryTable(spark: org.apache.spark.sql.SparkSession,
      queries: Seq[String], aw: AlignWeights = default(),
      weights: Weights = Weights.default): DataFrame = {
    import spark.implicits._
    queries.flatMap { q =>
      val qv = queryVec(q, weights)
      val h = matVec(aw.wLin, qv)
      var i = 0
      while (i < h.length) { if (h(i) < 0.0) h(i) = 0.0; i += 1 }
      val hq = matVec(aw.wH, qv)
      val tq = matVec(aw.tri, qv)
      val qterm = dot(aw.bi1, qv) + aw.uni
      qv.indices.map(d =>
        (q, d, h(d), hq(d), tq(d) + aw.bi0(d), aw.v(d), qterm))
    }.toDF("query", "d", "h", "hq", "tqb", "v", "qterm")
  }
}
