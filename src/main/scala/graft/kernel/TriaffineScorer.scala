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
  *   h_k   = [x_{k-1} ; x_k ; x_{k+1} ; ctxPrev ; ctxNext ;
  *            f_k ; g_k]                                      (7*dim)
  *   (ctxPrev/ctxNext = MEAN-POOLED feature vectors of the ENTIRE
  *    adjacent lines — the reference's context-aware encode fuses the
  *    full ltokens/rtokens streams, text_encoder.py:316-390, K5;
  *    f_k = seqDecay*f_{k-1} + x_k and g_k = seqDecay*g_{k+1} + x_k
  *    are whole-line forward/backward recurrences — the fixed-weight
  *    realization of the reference's sequence fusion encoder,
  *    text_encoder.py:112-134, K4: a rule can condition on a token
  *    arbitrarily far away within the line)
  *   s1(i,j,r) = b_r + wHead_r·h_i + wTail_r·h_j + single/multi bias
  *             + wLen_r * (j-i)                               (length)
  *             + eps * a_i^T M[i..j] b_j / len                (triaffine)
  *             + eps * wBi_r * (a_i·b_j)                      (biaffine)
  *   where a_i = U h_i[0:5d], b_j = V h_j[0:5d],
  *   M[i..j] = sum_k (W x_k)(W x_k)^T (the eps-scale factors read
  *   slots 0-4 only; the recurrence slots are consumed by the sparse
  *   rule rows, keeping the per-token factor cost flat)
  *   stage 2: h_span = Σ_z alpha_z c_z with alpha = masked softmax over
  *   z∈[i,j] of (a_i·c_z)(c_z·b_j); s2 = s1 + eps * w2_r·h_span
  *
  * The O(n^3) triple interaction collapses to prefix-summed rank×rank
  * outer products (the Spark-side analog of the reference's opt_einsum
  * contraction ordering, parser.py:268). Decisions are driven by the
  * rule-compiled tag weights; the triaffine term is epsilon-scaled so
  * float noise never crosses the ±5 rule margins.
  *
  * Allocation discipline: executor threads run this kernel millions of
  * times; all scratch arrays live in a per-thread [[Workspace]] sized
  * once to (maxSentLen, dim, rank) — steady-state garbage per sentence
  * is only the emitted spans. This is what makes the stage scale
  * linearly with cores instead of serializing on GC.
  *
  * This object is the SINGLE scoring code path: the distributed
  * mapPartitions kernel and the sequential [[graft.extract.ReferenceScorer]]
  * twin both call [[scoreSentence]], so parity is exact by construction
  * (SURVEY §7.4 risk 2).
  */
object TriaffineScorer extends Serializable {

  private val MaxN = graft.extract.Tokenizer.maxSentLen

  /** Per-thread scratch buffers (no per-sentence allocation). */
  private final class Workspace(w: Weights) {
    // identity of the Weights this workspace's sparse head/tail views
    // were built from — workspace(w) rebuilds on a different instance
    val forWeights: Weights = w
    val nt: Int = TypeDict.numTypes + 1
    val x = Array.ofDim[Double](MaxN, w.dim)
    val h = Array.ofDim[Double](MaxN, w.hDim)
    // cross-line context features (K5): POOLED adjacent-line feature
    // vectors — constant per sentence
    val cp = new Array[Double](w.dim)
    val cn = new Array[Double](w.dim)
    // whole-line recurrence scratch (K4): running fwd/bwd states
    val fwd = new Array[Double](w.dim)
    val bwd = new Array[Double](w.dim)
    val a = Array.ofDim[Double](MaxN, w.rank)
    val b = Array.ofDim[Double](MaxN, w.rank)
    val c = Array.ofDim[Double](MaxN, w.rank)
    val prefix = Array.ofDim[Double](MaxN + 1, w.rank * w.rank)
    val headS = Array.ofDim[Double](nt, MaxN)
    val tailS = Array.ofDim[Double](nt, MaxN)
    // top-k selection (k = w.topK): scores + span coords + s1 vectors
    val kBest = w.topK
    val selScore = new Array[Double](kBest + 1)
    val selI = new Array[Int](kBest + 1)
    val selJ = new Array[Int](kBest + 1)
    val selS1 = Array.ofDim[Double](kBest + 1, nt)
    val span = new Array[Double](w.rank)
    val s1tmp = new Array[Double](nt)
    val att = new Array[Double](MaxN)  // stage-2 attention scratch
    val pad: Array[Double] = {
      val p = new Array[Double](w.dim)
      p(w.tagIdx(Weights.PadTag)) = 1.0
      p
    }
    // Sparse views of the rule-compiled head/tail rows: they carry a
    // handful of nonzeros out of hDim, and skipping exact-0.0 terms is
    // bit-identical (x + 0.0*y == x for finite y). Built once per
    // thread; turns the per-(type, position) hDim dots into ~5 mults.
    private def sparse(rows: Array[Array[Double]])
        : (Array[Array[Int]], Array[Array[Double]]) = {
      val idx = rows.map(r => r.indices.filter(d => r(d) != 0.0).toArray)
      (idx, idx.zip(rows).map { case (is, r) => is.map(r(_)) })
    }
    val (headIdx, headVal) = sparse(w.wHead)
    val (tailIdx, tailVal) = sparse(w.wTail)
    // constant-per-sentence context contribution to the a/b factors
    val aCtx = new Array[Double](w.rank)
    val bCtx = new Array[Double](w.rank)
    // per-token factor projections (x is SPARSE in its tag block: one
    // one-hot among nTagDims dims): pU/pV hold, per token j, the three
    // window-slot projections U_p[slot s]·x_j / V_p[slot s]·x_j laid
    // out [s*rank + p]; a_k then sums three cached projections instead
    // of one dense 3*dim dot — ~1.8x on the kernel's dominant loop.
    val pU = Array.ofDim[Double](MaxN, 3 * w.rank)
    val pV = Array.ofDim[Double](MaxN, 3 * w.rank)
    // pad-token projections, fixed per weights: pad = one-hot at padIdx
    val padIdx: Int = w.tagIdx(Weights.PadTag)
    val padU: Array[Double] = {
      val o = new Array[Double](3 * w.rank)
      var s = 0
      while (s < 3) {
        var p = 0
        while (p < w.rank) {
          o(s * w.rank + p) = w.triU(p)(s * w.dim + padIdx); p += 1
        }
        s += 1
      }
      o
    }
    val padV: Array[Double] = {
      val o = new Array[Double](3 * w.rank)
      var s = 0
      while (s < 3) {
        var p = 0
        while (p < w.rank) {
          o(s * w.rank + p) = w.triV(p)(s * w.dim + padIdx); p += 1
        }
        s += 1
      }
      o
    }
    // nonzero TAG dims per token (normally exactly one); cnt = -1
    // flags a token whose tag block is not sparse (arbitrary cached
    // payload) -> dense fallback for that token
    val tagNzIdx = Array.ofDim[Int](MaxN, 4)
    val tagNzVal = Array.ofDim[Double](MaxN, 4)
    val tagNzCnt = new Array[Int](MaxN)
  }

  private def sparseDot(idx: Array[Int], v: Array[Double],
      h: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < idx.length) { s += v(i) * h(idx(i)); i += 1 }
    s
  }

  private val wsCache = new ThreadLocal[Workspace]
  private def workspace(w: Weights): Workspace = {
    var ws = wsCache.get()
    // rebuild on a DIFFERENT Weights instance: the workspace bakes in
    // the sparse head/tail VALUES, and reusing them for other weights
    // would silently score with stale rows. The hot path passes one
    // broadcast instance per partition, so the rebuild never fires there.
    if (ws == null || (ws.forWeights ne w)) {
      ws = new Workspace(w); wsCache.set(ws)
    }
    ws
  }

  /** Per-thread memo of per-token vectors (word-hash embedding + char-
    * recurrence state): the vocabulary of a code corpus is heavy-tailed,
    * so the vector of a token is computed once per executor thread, not
    * once per occurrence. Bounded to keep executor memory flat at
    * 100 TB scale. */
  // token-vector LRU keyed by the Weights identity it was built under —
  // like Workspace, stale vectors from a previous Weights instance must
  // never be reused (wrong dims AIOOBE, or silently wrong scores)
  private final class EmbedCache(val forWeights: Weights) {
    val map = new java.util.LinkedHashMap[String, Array[Double]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[Double]]): Boolean =
        size() > 65536
    }
  }
  private val embedCacheTL = new ThreadLocal[EmbedCache]
  private def embedCacheFor(w: Weights): java.util.LinkedHashMap[String, Array[Double]] = {
    var ec = embedCacheTL.get()
    if (ec == null || (ec.forWeights ne w)) {
      ec = new EmbedCache(w); embedCacheTL.set(ec)
    }
    ec.map
  }

  /** Subword pieces of a code token: split at case boundaries and
    * underscores (parseTree -> [parse, Tree]; parse_tree ->
    * [parse, tree]). The reference's subword units re-targeted at
    * identifiers. */
  private[kernel] def pieces(tok: String): Array[String] =
    tok.split("(?=[A-Z])|_").filter(_.nonEmpty)

  private def hashInto(s: String, v: Array[Double], scale: Double,
      n: Int): Unit = {
    val rng = new scala.util.Random(
      scala.util.hashing.MurmurHash3.stringHash(s) ^ 7)
    var d = 0
    while (d < n) { v(d) += rng.nextGaussian() * scale; d += 1 }
  }

  /** [subword-pooled word-hash embedding (nHashDims) ; char-recurrence
    * last state (nCharDims)]. The hash part is the analog of the frozen
    * word vectors (reference word_embed.py:84-96), MEAN-POOLED over
    * subword pieces (A4 subword pooling, text_encoder.py:146-163).
    * Pieces hash CASE-SENSITIVELY — like a cased wordpiece vocabulary,
    * `parse` is shared between parseTree and parse_tree but `Tree` and
    * `tree` are distinct entries; the char part
    * is the per-word char-encoder last-state gather (K3/A8, reference
    * text_encoder.py:258-271) as a fixed-decay recurrence
    * s_c = decay*s_{c-1} + charEmbed(c). Deterministic across JVMs. */
  private[kernel] def tokenVec(tok: String, w: Weights): Array[Double] = {
    val cache = embedCacheFor(w)
    var v = cache.get(tok)
    if (v == null) {
      v = new Array[Double](w.nHashDims + w.nCharDims)
      val ps = pieces(tok)
      if (ps.length <= 1) hashInto(tok, v, 0.01, w.nHashDims)
      else {
        // mean pooling over subword pieces (reference subword_aggr=mean)
        var i = 0
        while (i < ps.length) { hashInto(ps(i), v, 0.01, w.nHashDims); i += 1 }
        var d = 0
        while (d < w.nHashDims) { v(d) /= ps.length; d += 1 }
      }
      var c = 0
      while (c < tok.length) {
        val ce = w.charEmbed(tok.charAt(c) % 128)
        var j = 0
        while (j < w.nCharDims) {
          val i = w.nHashDims + j
          v(i) = w.charDecay * v(i) + ce(j)
          j += 1
        }
        c += 1
      }
      cache.put(tok, v)
    }
    v
  }

  private def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  final case class ScoredSpan(start: Int, endExcl: Int, typeId: Int,
      score: Double)

  /** Line-local scoring (no cross-line context) — the pre-K5 surface,
    * still used by property tests and ad-hoc callers. */
  def scoreSentence(tokens: IndexedSeq[String], tags: IndexedSeq[String],
      w: Weights): Seq[ScoredSpan] =
    scoreSentence(tokens, tags,
      IndexedSeq.empty, IndexedSeq.empty, IndexedSeq.empty,
      IndexedSeq.empty, w)

  /** Fill one per-token feature vector
    * [tag one-hot ; word-hash ; char-recurrence]. */
  private def featurize(tok: String, tag: String, out: Array[Double],
      w: Weights): Unit = {
    java.util.Arrays.fill(out, 0.0)
    out(w.tagIdx.getOrElse(tag, w.tagIdx(Weights.PadTag))) = 1.0
    System.arraycopy(tokenVec(tok, w), 0, out, w.nTagDims,
      w.nHashDims + w.nCharDims)
  }

  /** MEAN-POOL a whole line's feature vectors into `out` (the K5 full
    * context: the reference fuses the ENTIRE ltokens/rtokens streams,
    * not endpoint tokens). Empty line -> the PAD vector. Accumulation
    * order is token order — one definition shared by the per-sentence
    * path, the per-file fast path and the encoding cache, so the pooled
    * values are bit-identical everywhere. */
  private[kernel] def poolInto(toks: IndexedSeq[String],
      tags: IndexedSeq[String], out: Array[Double], w: Weights): Unit = {
    val n = math.min(toks.length, MaxN)
    if (n == 0) { System.arraycopy(workspace(w).pad, 0, out, 0, w.dim); return }
    java.util.Arrays.fill(out, 0.0)
    var k = 0
    while (k < n) {
      out(w.tagIdx.getOrElse(tags(k), w.tagIdx(Weights.PadTag))) += 1.0
      val tv = tokenVec(toks(k), w)
      var d = 0
      while (d < w.nHashDims + w.nCharDims) {
        out(w.nTagDims + d) += tv(d); d += 1
      }
      k += 1
    }
    var d = 0
    while (d < w.dim) { out(d) /= n; d += 1 }
  }

  /** Score one sentence -> surviving typed spans. Pure & deterministic
    * (per-thread scratch state never escapes). ltokens/rtokens are the
    * adjacent-line context (reference K5, text_encoder.py:316-390):
    * each line is MEAN-POOLED into every position's fused vector
    * (slots 3/4). */
  def scoreSentence(tokens: IndexedSeq[String], tags: IndexedSeq[String],
      ltokens: IndexedSeq[String], ltags: IndexedSeq[String],
      rtokens: IndexedSeq[String], rtags: IndexedSeq[String],
      w: Weights): Seq[ScoredSpan] = {
    val n = math.min(tokens.length, MaxN)
    if (n == 0) return Nil
    val ws = workspace(w)
    // features x_k = [tag one-hot ; word-hash embedding]
    var k = 0
    while (k < n) {
      featurize(tokens(k), tags(k), ws.x(k), w)
      k += 1
    }
    // cross-line context features (pad when no adjacent line)
    poolInto(ltokens, ltags, ws.cp, w)
    poolInto(rtokens, rtags, ws.cn, w)
    scoreFromWorkspace(n, ws, w)
  }

  /** Frozen-encoder output of one sentence (the S3 cache payload):
    * flat = [x_0 .. x_{n-1} ; ctxPrev ; ctxNext], each `dim` wide.
    * [[scoreEncoded]] consumes it WITHOUT re-encoding — the analog of
    * the reference's per-record HDF5 BERT cache (data_util.py:64-70,
    * 561-567) fetched by key and fed to the scorer. */
  def encodeSentence(tokens: IndexedSeq[String], tags: IndexedSeq[String],
      ltokens: IndexedSeq[String], ltags: IndexedSeq[String],
      rtokens: IndexedSeq[String], rtags: IndexedSeq[String],
      w: Weights): Array[Double] = {
    val n = math.min(tokens.length, MaxN)
    val ws = workspace(w)
    val flat = new Array[Double]((n + 2) * w.dim)
    var k = 0
    while (k < n) {
      featurize(tokens(k), tags(k), ws.x(k), w)
      System.arraycopy(ws.x(k), 0, flat, k * w.dim, w.dim)
      k += 1
    }
    poolInto(ltokens, ltags, ws.cp, w)
    poolInto(rtokens, rtags, ws.cn, w)
    System.arraycopy(ws.cp, 0, flat, n * w.dim, w.dim)
    System.arraycopy(ws.cn, 0, flat, (n + 1) * w.dim, w.dim)
    flat
  }

  /** Score from a cached [[encodeSentence]] payload — bit-identical to
    * [[scoreSentence]] on the same sentence (asserted in tests). */
  def scoreEncoded(flat: Array[Double], w: Weights): Seq[ScoredSpan] = {
    // a cache written under different Weights dims would slice at wrong
    // offsets and yield garbage scores — fail instead
    require(flat.length % w.dim == 0,
      s"cached encoding length ${flat.length} is not a multiple of " +
        s"dim ${w.dim} — cache written under different Weights?")
    val n = flat.length / w.dim - 2
    if (n <= 0) return Nil
    require(n <= MaxN,
      s"cached encoding claims $n tokens > MaxN $MaxN — corrupt payload?")
    val ws = workspace(w)
    var k = 0
    while (k < n) {
      System.arraycopy(flat, k * w.dim, ws.x(k), 0, w.dim)
      k += 1
    }
    System.arraycopy(flat, n * w.dim, ws.cp, 0, w.dim)
    System.arraycopy(flat, (n + 1) * w.dim, ws.cn, 0, w.dim)
    scoreFromWorkspace(n, ws, w)
  }

  /** Full per-class score vectors (stage-1 + attention-rescored
    * stage-2 — the EXACT decode arithmetic, via the same s1Into /
    * attSpanInto helpers the decode loop runs) for EXPLICIT spans.
    *
    * The K11 loss surface (reference model/losses.py:8-156): loss
    * evaluation of a weight bundle against labeled spans needs the
    * whole class distribution, not the decoded argmax — the decode
    * only re-scores its top-k survivors, this scores exactly the
    * spans asked for. Spans are (start, endExcl) like [[Mention]];
    * each returned array has nt entries, NA last (TypeDict.naId).
    * For a span the decode emitted, argmax and max are bit-identical
    * to the ScoredSpan (asserted in LossSpec). */
  def classScores(tokens: IndexedSeq[String], tags: IndexedSeq[String],
      ltokens: IndexedSeq[String], ltags: IndexedSeq[String],
      rtokens: IndexedSeq[String], rtags: IndexedSeq[String],
      w: Weights, spans: Seq[(Int, Int)]): IndexedSeq[Array[Double]] = {
    val n = math.min(tokens.length, MaxN)
    require(n > 0, "classScores on an empty sentence")
    val ws = workspace(w)
    var k = 0
    while (k < n) {
      featurize(tokens(k), tags(k), ws.x(k), w)
      k += 1
    }
    poolInto(ltokens, ltags, ws.cp, w)
    poolInto(rtokens, rtags, ws.cn, w)
    prepareFactors(n, ws, w)
    val nt = ws.nt; val rank = w.rank
    spans.toIndexedSeq.map { case (st, endExcl) =>
      val i = st; val j = endExcl - 1
      require(i >= 0 && i <= j && j < n && j - i + 1 <= w.maxSpanLen,
        s"span ($st, $endExcl) outside the tri-mask for n=$n")
      val out = new Array[Double](nt)
      s1Into(i, j, ws, w, out)
      attSpanInto(i, j, ws, w)
      var r = 0
      while (r < nt) {
        out(r) += w.epsilon * dot(w.w2(r), ws.span, rank)
        r += 1
      }
      out
    }
  }

  /** Fusion + triaffine cascade over already-filled workspace features
    * (ws.x(0..n), ws.cp, ws.cn). */
  /** Fusion + factor preparation over already-filled workspace
    * features: fills ws.h / fwd / bwd / a / b / c / prefix / headS /
    * tailS. Shared verbatim by the decode cascade and
    * [[classScores]] — pure code motion out of the former
    * scoreFromWorkspace body, so the arithmetic (and the frozen
    * golden scores) are untouched. */
  private def prepareFactors(n: Int, ws: Workspace, w: Weights): Unit = {
    val nt = ws.nt
    val rank = w.rank
    // fusion h_k = [x_{k-1}; x_k; x_{k+1}; ctxPrev; ctxNext; f_k; g_k]
    var k = 0
    while (k < n) {
      val h = ws.h(k)
      System.arraycopy(if (k > 0) ws.x(k - 1) else ws.pad, 0, h, 0, w.dim)
      System.arraycopy(ws.x(k), 0, h, w.dim, w.dim)
      System.arraycopy(if (k < n - 1) ws.x(k + 1) else ws.pad, 0, h,
        2 * w.dim, w.dim)
      System.arraycopy(ws.cp, 0, h, 3 * w.dim, w.dim)
      System.arraycopy(ws.cn, 0, h, 4 * w.dim, w.dim)
      k += 1
    }
    // whole-line recurrences (K4): forward f_k = decay*f_{k-1} + x_k
    // into slot 5, backward g_k = decay*g_{k+1} + x_k into slot 6 —
    // O(n*dim), and consumed only by the SPARSE rule rows below, so the
    // sequence channel costs no extra work in the dense factor loops
    java.util.Arrays.fill(ws.fwd, 0.0)
    val dim5 = 5 * w.dim; val dim6 = 6 * w.dim
    k = 0
    while (k < n) {
      val xk = ws.x(k); val f = ws.fwd
      var d = 0
      while (d < w.dim) { f(d) = w.seqDecay * f(d) + xk(d); d += 1 }
      System.arraycopy(f, 0, ws.h(k), dim5, w.dim)
      k += 1
    }
    java.util.Arrays.fill(ws.bwd, 0.0)
    k = n - 1
    while (k >= 0) {
      val xk = ws.x(k); val g = ws.bwd
      var d = 0
      while (d < w.dim) { g(d) = w.seqDecay * g(d) + xk(d); d += 1 }
      System.arraycopy(g, 0, ws.h(k), dim6, w.dim)
      k -= 1
    }
    // triaffine factors + prefix sums of c c^T. The context blocks
    // (dims 3*dim..5*dim of h) are IDENTICAL for every k, so their
    // contribution to a/b is hoisted out of the per-token loop.
    val dim3 = 3 * w.dim
    var p0 = 0
    while (p0 < rank) {
      var su = 0.0; var sv = 0.0
      var d = 0
      while (d < w.dim) {
        su += w.triU(p0)(dim3 + d) * ws.cp(d) +
          w.triU(p0)(dim3 + w.dim + d) * ws.cn(d)
        sv += w.triV(p0)(dim3 + d) * ws.cp(d) +
          w.triV(p0)(dim3 + w.dim + d) * ws.cn(d)
        d += 1
      }
      ws.aCtx(p0) = su; ws.bCtx(p0) = sv
      p0 += 1
    }
    // pass 1 — per-token factor projections, exploiting x's sparse tag
    // block (one one-hot among nTagDims dims; dense hash+char tail).
    // Projections are computed once per TOKEN and reused by the three
    // window positions that see it, instead of re-dotting the full
    // 3*dim window per position.
    val nTag = w.nTagDims
    k = 0
    while (k < n) {
      val xk = ws.x(k)
      // tag-block nonzeros of this token (normally exactly one)
      var cnt = 0
      var d = 0
      while (d < nTag && cnt >= 0) {
        if (xk(d) != 0.0) {
          if (cnt < 4) {
            ws.tagNzIdx(k)(cnt) = d; ws.tagNzVal(k)(cnt) = xk(d); cnt += 1
          } else cnt = -1 // dense fallback
        }
        d += 1
      }
      ws.tagNzCnt(k) = cnt
      val pUk = ws.pU(k); val pVk = ws.pV(k)
      var p = 0
      while (p < rank) {
        val up = w.triU(p); val vp = w.triV(p); val wp = w.triW(p)
        var s = 0
        while (s < 3) {
          val off = s * w.dim
          var suU = 0.0; var suV = 0.0
          if (cnt >= 0) {
            var i = 0
            while (i < cnt) {
              val ti = off + ws.tagNzIdx(k)(i); val tv = ws.tagNzVal(k)(i)
              suU += up(ti) * tv; suV += vp(ti) * tv; i += 1
            }
            d = nTag
            while (d < w.dim) {
              val xv = xk(d)
              suU += up(off + d) * xv; suV += vp(off + d) * xv
              d += 1
            }
          } else {
            d = 0
            while (d < w.dim) {
              val xv = xk(d)
              suU += up(off + d) * xv; suV += vp(off + d) * xv
              d += 1
            }
          }
          pUk(s * rank + p) = suU; pVk(s * rank + p) = suV
          s += 1
        }
        // inside factor c_k = W x_k with the same sparsity
        var sc = 0.0
        if (cnt >= 0) {
          var i = 0
          while (i < cnt) {
            sc += wp(ws.tagNzIdx(k)(i)) * ws.tagNzVal(k)(i); i += 1
          }
          d = nTag
          while (d < w.dim) { sc += wp(d) * xk(d); d += 1 }
        } else {
          d = 0
          while (d < w.dim) { sc += wp(d) * xk(d); d += 1 }
        }
        ws.c(k)(p) = sc
        p += 1
      }
      k += 1
    }
    // pass 2 — assemble a_k/b_k from the three window projections
    // (+ the hoisted constant context term) and build the prefix sums
    java.util.Arrays.fill(ws.prefix(0), 0.0)
    k = 0
    while (k < n) {
      val prevU = if (k > 0) ws.pU(k - 1) else ws.padU
      val prevV = if (k > 0) ws.pV(k - 1) else ws.padV
      val nextU = if (k < n - 1) ws.pU(k + 1) else ws.padU
      val nextV = if (k < n - 1) ws.pV(k + 1) else ws.padV
      val selfU = ws.pU(k); val selfV = ws.pV(k)
      var p = 0
      while (p < rank) {
        ws.a(k)(p) = prevU(p) + selfU(rank + p) + nextU(2 * rank + p) +
          ws.aCtx(p)
        ws.b(k)(p) = prevV(p) + selfV(rank + p) + nextV(2 * rank + p) +
          ws.bCtx(p)
        p += 1
      }
      val prev = ws.prefix(k); val cur = ws.prefix(k + 1); val ck = ws.c(k)
      var u = 0
      while (u < rank) {
        val cu = ck(u)
        var v = 0
        while (v < rank) {
          cur(u * rank + v) = prev(u * rank + v) + cu * ck(v)
          v += 1
        }
        u += 1
      }
      k += 1
    }
    // head/tail linear scores per (type, position) — sparse rows
    var r = 0
    while (r < nt) {
      val hi = ws.headIdx(r); val hv = ws.headVal(r)
      val ti = ws.tailIdx(r); val tv = ws.tailVal(r)
      var i = 0
      while (i < n) {
        ws.headS(r)(i) = sparseDot(hi, hv, ws.h(i))
        ws.tailS(r)(i) = sparseDot(ti, tv, ws.h(i))
        i += 1
      }
      r += 1
    }
  }

  /** Stage-1 class scores for span (i, j) INCLUSIVE j, written into
    * `out` (length nt); returns the best non-NA score (the top-k
    * selection key). Exact arithmetic of the decode loop — shared
    * verbatim with [[classScores]]. */
  private def s1Into(i: Int, j: Int, ws: Workspace, w: Weights,
      out: Array[Double]): Double = {
    val rank = w.rank; val nt = ws.nt
    val len = j - i + 1
    var tri = 0.0
    val pj = ws.prefix(j + 1); val pi = ws.prefix(i)
    val ai = ws.a(i); val bj = ws.b(j)
    var u = 0
    while (u < rank) {
      val au = ai(u)
      var v = 0
      while (v < rank) {
        tri += au * (pj(u * rank + v) - pi(u * rank + v)) * bj(v)
        v += 1
      }
      u += 1
    }
    tri = tri / len * w.epsilon
    // biaffine head-tail interaction (K9 aux scorer, reference
    // parser.py:84-148): low-rank a_i·b_j, per-type weighted
    val bi = dot(ai, bj, rank) * w.epsilon
    var best = Double.NegativeInfinity
    var r = 0
    while (r < nt) {
      var s = 0.0
      if (r == nt - 1) s = 0.0 + tri // NA baseline
      else {
        s = w.bias(r) + ws.headS(r)(i) + ws.tailS(r)(j) + tri +
          bi * w.wBi(r) + w.wLen(r) * (j - i) +
          (if (i == j) w.wSingle(r) else w.wMulti(r))
        if (s > best) best = s
      }
      out(r) = s
      r += 1
    }
    best
  }

  /** Attention-pooled stage-2 span vector for (si, sj) INCLUSIVE sj,
    * written into ws.span: masked softmax over inside tokens
    * z ∈ [x, y] (cells outside the span are excluded by construction —
    * the reference masks them to -1e6 before the softmax,
    * parser.py:520-525) of att_z = (a_x·c_z)(c_z·b_y), then
    * h_span = Σ_z alpha_z c_z (the reference's span_att_v2.py:372).
    * Shared verbatim by the decode rescoring and [[classScores]]. */
  private def attSpanInto(si: Int, sj: Int, ws: Workspace,
      w: Weights): Unit = {
    val rank = w.rank
    val len = sj - si + 1
    val ai = ws.a(si); val bj = ws.b(sj)
    var maxA = Double.NegativeInfinity
    var kk = si
    while (kk <= sj) {
      val ck = ws.c(kk)
      val av = dot(ai, ck, rank) * dot(ck, bj, rank)
      ws.att(kk - si) = av
      if (av > maxA) maxA = av
      kk += 1
    }
    var denom = 0.0
    kk = 0
    while (kk < len) {
      val e = StrictMath.exp(ws.att(kk) - maxA)
      ws.att(kk) = e; denom += e
      kk += 1
    }
    val span = ws.span
    var u = 0
    while (u < rank) {
      var acc = 0.0
      kk = 0
      while (kk < len) { acc += ws.att(kk) * ws.c(si + kk)(u); kk += 1 }
      span(u) = acc / denom
      u += 1
    }
  }

  private def scoreFromWorkspace(n: Int, ws: Workspace,
      w: Weights): Seq[ScoredSpan] = {
    val nt = ws.nt
    val rank = w.rank
    prepareFactors(n, ws, w)

    // stage 1 + streaming top-k selection (k small: insertion keeps the
    // selection sorted by (score desc, i asc, j asc); iteration order is
    // (i asc, j asc) so equal-score ties keep first-seen order — the
    // exact semantics of sortBy((-best, i, j)).take(k))
    var selN = 0
    var i = 0
    while (i < n) {
      var j = i
      val jMax = math.min(n - 1, i + w.maxSpanLen - 1)
      while (j <= jMax) {
        val s1 = ws.s1tmp
        val best = s1Into(i, j, ws, w, s1)
        // streaming top-k insert (strict > against the current worst)
        if (selN < ws.kBest || best > ws.selScore(selN - 1)) {
          var pos = selN
          if (selN < ws.kBest) selN += 1
          // shift up while strictly better than the element above
          while (pos > 0 && best > ws.selScore(pos - 1)) {
            if (pos < ws.kBest) {
              ws.selScore(pos) = ws.selScore(pos - 1)
              ws.selI(pos) = ws.selI(pos - 1)
              ws.selJ(pos) = ws.selJ(pos - 1)
              System.arraycopy(ws.selS1(pos - 1), 0, ws.selS1(pos), 0, nt)
            }
            pos -= 1
          }
          if (pos < ws.kBest) {
            ws.selScore(pos) = best
            ws.selI(pos) = i
            ws.selJ(pos) = j
            System.arraycopy(s1, 0, ws.selS1(pos), 0, nt)
          }
        }
        j += 1
      }
      i += 1
    }

    // stage 2: rescore survivors with an ATTENTION-pooled span vector,
    // argmax decode. Attention = masked softmax over inside tokens
    // z ∈ [x, y] (cells outside the span are excluded by construction —
    // the reference masks them to -1e6 before the softmax,
    // parser.py:520-525) of att_z = (a_x·c_z)(c_z·b_y), then
    // h_span = Σ_z alpha_z c_z (the reference's span_att_v2.py:372).
    val out = Vector.newBuilder[ScoredSpan]
    var s = 0
    while (s < selN) {
      val si = ws.selI(s); val sj = ws.selJ(s)
      attSpanInto(si, sj, ws, w)
      val span = ws.span
      val s1 = ws.selS1(s)
      var bestR = nt - 1
      var bestS = s1(nt - 1) + w.epsilon * dot(w.w2(nt - 1), span, rank)
      var r = 0
      while (r < nt - 1) {
        val s2 = s1(r) + w.epsilon * dot(w.w2(r), span, rank)
        if (s2 > bestS) { bestS = s2; bestR = r }
        r += 1
      }
      if (bestR != nt - 1) out += ScoredSpan(si, sj + 1, bestR, bestS)
      s += 1
    }
    // emit in (start, end) order like the reference's span sort
    // (span_att_v2.py:134-140)
    out.result().sortBy(sp => (sp.start, sp.endExcl))
  }

  /** Decode scored spans to mentions (surface + type name + next
    * token) — shared by the direct and cached-encoding paths. */
  def toMentions(docId: String, sentId: Int, toks: IndexedSeq[String],
      sps: Seq[ScoredSpan]): Seq[Mention] =
    sps.map { sp =>
      Mention(docId, sentId, sp.start, sp.endExcl,
        TypeDict.types(sp.typeId), sp.score,
        toks.slice(sp.start, sp.endExcl).mkString(" "),
        if (sp.endExcl < toks.length) toks(sp.endExcl) else "")
    }

  /** Sentence -> mentions (adds surface + type name + next token). */
  def mentions(s: Sentence, w: Weights): Seq[Mention] = {
    val toks = s.tokens.toIndexedSeq
    toMentions(s.docId, s.sentId, toks,
      scoreSentence(toks, s.pos.toIndexedSeq,
        s.ltokens.toIndexedSeq, s.lpos.toIndexedSeq,
        s.rtokens.toIndexedSeq, s.rpos.toIndexedSeq, w))
  }

  /** Per-FILE fast path: score all of one file's sentences sharing the
    * pooled line vectors. A sentence's ltokens/rtokens ARE the adjacent
    * sentence's own tokens (same truncation — Tokenizer.sentences), so
    * each line is pooled exactly ONCE and reused as its neighbors'
    * cp/cn; the per-sentence path pools each adjacent line again (3x
    * the pooling work per file). Bit-identical to mapping [[mentions]]
    * over the sentences (same poolInto / scoreFromWorkspace arithmetic;
    * asserted against the ReferenceScorer twin, which keeps the slow
    * path). */
  def mentionsForFile(sents: Seq[Sentence], w: Weights): Seq[Mention] = {
    if (sents.isEmpty) return Nil
    val ws = workspace(w)
    // one pooled vector per non-blank line, keyed by raw line index
    val pools = new java.util.HashMap[Int, Array[Double]]()
    sents.foreach { s =>
      val out = new Array[Double](w.dim)
      poolInto(s.tokens.toIndexedSeq, s.pos.toIndexedSeq, out, w)
      pools.put(s.sentId, out)
    }
    val out = Seq.newBuilder[Mention]
    sents.foreach { s =>
      val toks = s.tokens.toIndexedSeq
      val n = math.min(toks.length, MaxN)
      if (n > 0) {
        var k = 0
        while (k < n) { featurize(toks(k), s.pos(k), ws.x(k), w); k += 1 }
        // adjacency rule mirrors Tokenizer.sentences: ltokens nonEmpty
        // iff the raw line sentId-1 is a (non-blank) sentence. The
        // poolInto fallback keeps callers passing a PARTIAL sentence
        // list correct (pool computed directly, just not shared).
        val cp = if (s.ltokens.nonEmpty) pools.get(s.sentId - 1) else null
        if (cp != null) System.arraycopy(cp, 0, ws.cp, 0, w.dim)
        else poolInto(s.ltokens.toIndexedSeq, s.lpos.toIndexedSeq, ws.cp, w)
        val cn = if (s.rtokens.nonEmpty) pools.get(s.sentId + 1) else null
        if (cn != null) System.arraycopy(cn, 0, ws.cn, 0, w.dim)
        else poolInto(s.rtokens.toIndexedSeq, s.rpos.toIndexedSeq, ws.cn, w)
        out ++= toMentions(s.docId, s.sentId, toks,
          scoreFromWorkspace(n, ws, w))
      }
    }
    out.result()
  }
}
