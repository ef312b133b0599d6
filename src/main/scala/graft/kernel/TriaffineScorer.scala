package graft.kernel

import graft.core.{Mention, Sentence, TypeDict}

/** Span enumeration + triaffine scoring kernel.
  *
  * Reimplements the reference's scoring cascade semantics
  * (/root/reference/model/parser.py:494-545 stage-1 triaffine scores;
  * /root/reference/model/span_att_v2.py:247-274 per-sentence top-k;
  * :350-407 stage-2 rescoring; :116-161 decode) as deterministic Scala
  * arithmetic over per-token feature vectors:
  *
  *   x_k   = [tag one-hot ; seeded word-hash embedding]      (dim)
  *   h_k   = [x_{k-1} ; x_k ; x_{k+1}]   window fusion       (3*dim)
  *   s1(i,j,r) = b_r + wHead_r·h_i + wTail_r·h_j + single/multi bias
  *             + eps * a_i^T M[i..j] b_j / len                (triaffine)
  *   where a_i = U h_i, b_j = V h_j, M[i..j] = sum_k (W x_k)(W x_k)^T
  *
  * The O(n^3) triple interaction collapses to prefix-summed rank×rank
  * outer products (the Spark-side analog of the reference's opt_einsum
  * contraction ordering, parser.py:268). Decisions are driven by the
  * rule-compiled tag weights; the triaffine term is epsilon-scaled so
  * float noise never crosses the ±5 rule margins.
  *
  * This object is the SINGLE scoring code path: the distributed
  * mapPartitions kernel and the sequential [[ReferenceScorer]] twin both
  * call [[scoreSentence]], so parity is exact by construction
  * (SURVEY §7.4 risk 2).
  */
object TriaffineScorer extends Serializable {

  /** Per-token feature vector. */
  private def features(tok: String, tag: String, w: Weights): Array[Double] = {
    val x = new Array[Double](w.dim)
    x(w.tagIdx.getOrElse(tag, w.tagIdx(Weights.PadTag))) = 1.0
    // seeded word-hash embedding (analog of the frozen word vectors,
    // reference word_embed.py:84-96): deterministic across JVMs.
    val seed = scala.util.hashing.MurmurHash3.stringHash(tok) ^ 7
    val rng = new scala.util.Random(seed)
    var d = 0
    while (d < w.nHashDims) {
      x(w.nTagDims + d) = rng.nextGaussian() * 0.01
      d += 1
    }
    x
  }

  private def padVec(w: Weights): Array[Double] = {
    val x = new Array[Double](w.dim)
    x(w.tagIdx(Weights.PadTag)) = 1.0
    x
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  final case class ScoredSpan(start: Int, endExcl: Int, typeId: Int,
      score: Double)

  /** Score one sentence -> surviving typed spans. Pure & deterministic. */
  def scoreSentence(tokens: IndexedSeq[String], tags: IndexedSeq[String],
      w: Weights): Seq[ScoredSpan] = {
    val n = tokens.length
    if (n == 0) return Nil
    val nt = TypeDict.numTypes + 1
    val pad = padVec(w)
    val x = Array.tabulate(n)(k => features(tokens(k), tags(k), w))
    // window fusion h_k = [x_{k-1}; x_k; x_{k+1}]
    val h = Array.tabulate(n) { k =>
      val v = new Array[Double](w.hDim)
      System.arraycopy(if (k > 0) x(k - 1) else pad, 0, v, 0, w.dim)
      System.arraycopy(x(k), 0, v, w.dim, w.dim)
      System.arraycopy(if (k < n - 1) x(k + 1) else pad, 0, v, 2 * w.dim, w.dim)
      v
    }
    // triaffine factors
    val a = Array.tabulate(n)(i => Array.tabulate(w.rank)(p => dot(w.triU(p), h(i))))
    val b = Array.tabulate(n)(j => Array.tabulate(w.rank)(p => dot(w.triV(p), h(j))))
    val c = Array.tabulate(n)(k => Array.tabulate(w.rank)(p => dot(w.triW(p), x(k))))
    // prefix sums of c c^T  (rank x rank), P(k) = sum_{0..k-1}
    val r2 = w.rank * w.rank
    val prefix = new Array[Array[Double]](n + 1)
    prefix(0) = new Array[Double](r2)
    var k = 0
    while (k < n) {
      val p = prefix(k).clone()
      var u = 0
      while (u < w.rank) {
        var v = 0
        while (v < w.rank) { p(u * w.rank + v) += c(k)(u) * c(k)(v); v += 1 }
        u += 1
      }
      prefix(k + 1) = p
      k += 1
    }
    // head/tail linear scores precomputed per (type, position)
    val headS = Array.tabulate(nt, n)((r, i) => dot(w.wHead(r), h(i)))
    val tailS = Array.tabulate(nt, n)((r, j) => dot(w.wTail(r), h(j)))

    // stage 1: all spans i<=j, bounded length (tri-mask analog,
    // reference parser.py:520-524)
    final case class Cand(i: Int, j: Int, s1: Array[Double], best: Double)
    val cands = scala.collection.mutable.ArrayBuffer[Cand]()
    var i = 0
    while (i < n) {
      var j = i
      val jMax = math.min(n - 1, i + w.maxSpanLen - 1)
      while (j <= jMax) {
        val len = j - i + 1
        // tri = a_i^T M b_j / len with M = prefix(j+1) - prefix(i)
        var tri = 0.0
        var u = 0
        while (u < w.rank) {
          var v = 0
          while (v < w.rank) {
            tri += a(i)(u) * (prefix(j + 1)(u * w.rank + v) -
              prefix(i)(u * w.rank + v)) * b(j)(v)
            v += 1
          }
          u += 1
        }
        tri = tri / len * w.epsilon
        val s1 = new Array[Double](nt)
        var best = Double.NegativeInfinity
        var r = 0
        while (r < nt) {
          var s = w.bias(r) + headS(r)(i) + tailS(r)(j) + tri +
            (if (i == j) w.wSingle(r) else w.wMulti(r))
          if (r == nt - 1) s = 0.0 + tri // NA baseline
          s1(r) = s
          if (r < nt - 1 && s > best) best = s
          r += 1
        }
        cands += Cand(i, j, s1, best)
        j += 1
      }
      i += 1
    }
    // per-sentence top-k by best non-NA stage-1 score (ref: top-30,
    // span_att_v2.py:247-274); deterministic tie-break (start, end)
    val top = cands.sortBy(cd => (-cd.best, cd.i, cd.j)).take(w.topK)
    // stage 2: rescore with span vector (mean inside factor), pick argmax
    top.iterator.flatMap { cd =>
      val len = cd.j - cd.i + 1
      val span = new Array[Double](w.rank)
      var u = 0
      while (u < w.rank) {
        var s = 0.0
        var kk = cd.i
        while (kk <= cd.j) { s += c(kk)(u); kk += 1 }
        span(u) = s / len
        u += 1
      }
      var bestR = nt - 1
      var bestS = cd.s1(nt - 1) + w.epsilon * dot(w.w2(nt - 1), span)
      var r = 0
      while (r < nt - 1) {
        val s2 = cd.s1(r) + w.epsilon * dot(w.w2(r), span)
        if (s2 > bestS) { bestS = s2; bestR = r }
        r += 1
      }
      if (bestR == nt - 1) None
      else Some(ScoredSpan(cd.i, cd.j + 1, bestR, bestS))
    }.toSeq
  }

  /** Sentence -> mentions (adds surface + type name). */
  def mentions(s: Sentence, w: Weights): Seq[Mention] = {
    val toks = s.tokens.toIndexedSeq
    scoreSentence(toks, s.pos.toIndexedSeq, w).map { sp =>
      Mention(s.docId, s.sentId, sp.start, sp.endExcl,
        TypeDict.types(sp.typeId), sp.score,
        toks.slice(sp.start, sp.endExcl).mkString(" "))
    }
  }
}
