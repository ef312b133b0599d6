package graft

import graft.core.{CorpusGen, DocId, Vocab}
import graft.extract.Tokenizer
import graft.kernel.{Aligner, Weights}

/** K10 aligner heads: soft-lookup decision-bearing tests (exact token
  * match wins the dot and biaffine heads), reference mask semantics,
  * and distributed == local parity of the alignment table. */
class AlignerSpec extends SparkSpec {

  private val w = Weights.default
  private val aw = Aligner.default()

  private def sentencesOf(id: Long) = {
    val g = CorpusGen.file(id)
    Tokenizer.sentences(DocId.of(g.source.repo, g.source.path),
      g.source.content)
  }

  test("dot and biaffine heads align an exact token match (soft lookup)") {
    var checked = 0
    var dotWins = 0
    (0L until 10L).foreach { id =>
      val g = CorpusGen.file(id)
      val sentsById = sentencesOf(id).map(s => s.sentId -> s).toMap
      // every gold identifier is a planted query with a known position
      g.mentions.filter(m => m.entType == "identifier").foreach { m =>
        val s = sentsById(m.sentId)
        val mem = Aligner.memoryOf(s, w)
        val mask = Array.fill(mem.length)(true)
        val q = mem(m.start).clone() // the exact token vector
        // the biaffine head (identity-anchored bilinear core) is the
        // strict soft lookup: any occurrence of the token wins outright
        val pb = Aligner.argmaxAlign(Aligner.pbiaffineSim(q, mem, mask, aw))
        assert(s.tokens(pb) == s.tokens(m.start),
          s"file $id sent ${m.sentId}: pbiaffine aligned " +
            s"'${s.tokens(pb)}' at $pb, wanted '${s.tokens(m.start)}'")
        // the ReLU-dot head discards the query's negative half, so
        // with a fixed core no exact-retrieval guarantee exists (the
        // reference feeds it LEARNED decoder states, not raw
        // embeddings — the learning is what aims ReLU(Wq) at the
        // target): the match must rank in the top 5 everywhere and
        // win outright in the large majority of plants (deterministic
        // corpus — these are fixed facts, not flaky statistics)
        val ds = Aligner.alignerSim(q, mem, mask, aw)
        val rank = ds.count(_ > ds(m.start))
        assert(rank < 5,
          s"file $id sent ${m.sentId}: dot head ranks the match $rank-th")
        if (s.tokens(Aligner.argmaxAlign(ds)) == s.tokens(m.start))
          dotWins += 1
        checked += 1
      }
    }
    assert(checked > 50, s"only $checked alignments checked")
    assert(dotWins * 4 >= checked * 3,
      s"dot head won only $dotWins/$checked exact matches")
  }

  test("mask semantics match the reference (-1e6 fill, never decoded)") {
    val s = sentencesOf(3L).maxBy(_.tokens.length)
    val mem = Aligner.memoryOf(s, w)
    val mask = Array.fill(mem.length)(true)
    val q = mem(1).clone()
    Seq[(Array[Double], Array[Array[Double]], Array[Boolean],
        Aligner.AlignWeights) => Array[Double]](
      Aligner.alignerSim, Aligner.pointerSim, Aligner.pbiaffineSim)
      .foreach { head =>
        val open = head(q, mem, mask, aw)
        val best = Aligner.argmaxAlign(open)
        val masked = mask.clone(); masked(best) = false
        val sim = head(q, mem, masked, aw)
        assert(sim(best) == Aligner.MaskFill)
        assert(Aligner.argmaxAlign(sim) != best || mem.length == 1)
        // unmasked positions are untouched by masking others
        sim.indices.filter(_ != best).foreach(i => assert(sim(i) == open(i)))
      }
  }

  test("heads and weights are deterministic") {
    val a1 = Aligner.default(); val a2 = Aligner.default()
    assert(a1.wLin.flatten.toSeq == a2.wLin.flatten.toSeq &&
      a1.v.toSeq == a2.v.toSeq && a1.uni == a2.uni)
    val s = sentencesOf(5L).head
    val mem = Aligner.memoryOf(s, w)
    val mask = Array.fill(mem.length)(true)
    val q = mem(0).clone()
    assert(Aligner.pointerSim(q, mem, mask, a1).toSeq ==
      Aligner.pointerSim(q, mem, mask, a2).toSeq)
  }

  test("align_lookup decode margins dwarf cross-engine float noise") {
    // the oracle recomputes each similarity as an UNORDERED SQL sum of
    // the same per-dimension products (plus an exp-based tanh), so its
    // values can drift from the engine's left-to-right sums by ~1e-15.
    // A similarity row is a per-POSITION function of the token alone,
    // so the worst-case argmax margin over ANY sentence of the graded
    // slice is the minimum STRICT gap between two distinct tokens'
    // scores (exact ties — identical tokens — tie-break by position
    // identically in both engines). Pin that floor at 1e-9: a million
    // times the summation-order noise.
    val queries = graft.queries.KgQueries.AlignQueries
    val toks = (0L until 1500L).flatMap(id =>
      sentencesOf(id).flatMap(_.tokens.take(Tokenizer.maxSentLen))).distinct
    assert(toks.size > 50, s"only ${toks.size} distinct tokens")
    val mems = toks.map(t => Aligner.memoryOf(
      graft.core.Sentence("d", 0, Vector(t), Vector("X"),
        Vector.empty, Vector.empty, Vector.empty, Vector.empty), w)(0))
    var minGap = Double.MaxValue
    queries.foreach { qs =>
      val q = Aligner.queryVec(qs, w)
      val mask = Array(true)
      Seq[(Array[Double], Array[Array[Double]], Array[Boolean],
          Aligner.AlignWeights) => Array[Double]](
        Aligner.alignerSim, Aligner.pointerSim, Aligner.pbiaffineSim)
        .foreach { head =>
          val scores = mems.map(m => head(q, Array(m), mask, aw)(0)).sorted
          var i = 1
          while (i < scores.length) {
            val gap = scores(i) - scores(i - 1)
            if (gap > 0 && gap < minGap) minGap = gap
            i += 1
          }
        }
    }
    assert(minGap > 1e-9,
      s"top-2 margin $minGap too small for an integer-exact decode")
  }

  test("distributed alignment table == local recompute, exactly") {
    import spark.implicits._
    val queries = Vocab.idents.take(4)
    val sents = graft.extract.Extract.sentences(
      graft.extract.Extract.corpus(spark, 12))
    val rows = Aligner.alignTable(sents, queries, aw, w).collect()
    assert(rows.nonEmpty)
    val local = (0L until 12L).flatMap { id =>
      sentencesOf(id).flatMap { s =>
        val mem = Aligner.memoryOf(s, w)
        val mask = Array.fill(mem.length)(true)
        queries.map { q =>
          val out = Aligner.queryVec(q, w)
          (s.docId, s.sentId, q,
            Aligner.argmaxAlign(Aligner.alignerSim(out, mem, mask, aw)),
            Aligner.argmaxAlign(Aligner.pointerSim(out, mem, mask, aw)),
            Aligner.argmaxAlign(Aligner.pbiaffineSim(out, mem, mask, aw)))
        }
      }
    }.toSet
    val dist = rows.map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    assert(dist == local,
      s"missing=${(local -- dist).take(3)} extra=${(dist -- local).take(3)}")
    assert(rows.length == local.size)
    // the soft lookup pays off end-to-end: whenever the query token
    // occurs in the sentence, the strict (biaffine) head decodes an
    // occurrence of it
    val tokensBySent = (0L until 12L).flatMap(id =>
      sentencesOf(id).map(s => (s.docId, s.sentId) -> s.tokens)).toMap
    var hits = 0
    rows.foreach { r =>
      val toks = tokensBySent((r.getString(0), r.getInt(1)))
      if (toks.take(Tokenizer.maxSentLen).contains(r.getString(2))) {
        assert(toks(r.getInt(5)) == r.getString(2),
          s"query ${r.getString(2)} in ${r.getString(0)}:${r.getInt(1)} " +
            s"aligned to '${toks(r.getInt(5))}'")
        hits += 1
      }
    }
    assert(hits > 5, s"only $hits in-sentence queries — fixture too weak")
  }
}
