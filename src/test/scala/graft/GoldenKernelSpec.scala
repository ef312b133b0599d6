package graft

import graft.core.CorpusGen
import graft.extract.Tokenizer
import graft.kernel.{TriaffineScorer, Weights}
import org.scalatest.funsuite.AnyFunSuite

/** Frozen numeric scores for fixed sentences (bit-exact doubles).
  *
  * The rule-compiled weights carry >=5 margins, so the epsilon-scaled
  * triaffine term (K6/K8 arithmetic, reference
  * /root/reference/model/parser.py:212-290) is decision-inert: the
  * parity suites can never catch a bug in the contraction itself. This
  * golden test pins the exact low-order digits each span score gets
  * from the triaffine + stage-2 terms — ANY perturbation of the
  * contraction (loop order, prefix-sum rewrite, factor change) flips
  * the frozen values and fails here.
  *
  * Frozen for the round-3 kernel: pooled-line context (K5 full),
  * whole-line fwd/bwd recurrences (K4), wLen length term. file(1)
  * covers every construct: full api_symbol (bwd-decided),
  * documented_fn (pooled-cp-decided), annotation (pooled-cn-decided),
  * 1- and 2-param defs with param_decl (fwd-decided) at both i=3 and
  * i=7 (distinct fwd decays: 17.72 vs 12.95).
  */
class GoldenKernelSpec extends AnyFunSuite {

  test("all span scores of CorpusGen.file(1) are bit-exact") {
    val w = Weights.default
    val g = CorpusGen.file(1L)
    val docId = s"${g.source.repo}/${g.source.path}"
    val got = TriaffineScorer.mentionsForFile(
      Tokenizer.sentences(docId, g.source.content), w)
      .map(m => (m.sentId, m.start, m.end, m.entType, m.score))
    val expected = Seq(
      (1, 1, 6, "api_symbol", 11.184365630208967),
      (3, 1, 6, "api_symbol", 11.184364312714019),
      (5, 2, 3, "doc_entity", 5.00000266126938),
      (6, 0, 2, "documented_fn", 15.000002504714562),
      (6, 1, 2, "function", 9.999995709363173),
      (6, 1, 9, "signature", 4.999998868694552),
      (6, 3, 4, "identifier", 15.00000301008094),
      (6, 3, 6, "param_decl", 17.721258483226563),
      (6, 5, 6, "type_ref", 5.000016360510552),
      (6, 8, 9, "type_ref", 5.000017775013433),
      (8, 2, 3, "doc_entity", 5.0000011974511605),
      (9, 1, 2, "annotation", 7.000009477529564),
      (10, 1, 2, "function", 9.999996361915136),
      (10, 1, 13, "signature", 4.999998348226843),
      (10, 3, 4, "identifier", 15.00000322561704),
      (10, 3, 6, "param_decl", 17.72125985159453),
      (10, 5, 6, "type_ref", 5.000014968107581),
      (10, 7, 8, "identifier", 15.000003339890622),
      (10, 7, 10, "param_decl", 12.950128428576566),
      (10, 9, 10, "type_ref", 5.000017456461073),
      (10, 12, 13, "type_ref", 5.000014986091117))
    assert(got.size == expected.size, s"got: $got")
    got.zip(expected).foreach { case (a, e) =>
      assert((a._1, a._2, a._3, a._4) == (e._1, e._2, e._3, e._4), s"span: $a")
      assert(a._5 == e._5,
        f"score drift ${a._4}: got ${a._5}%.17g want ${e._5}%.17g " +
          "(triaffine contraction perturbed?)")
    }
    // the per-sentence slow path must produce the SAME bit-exact scores
    // (fast path shares pooled vectors; slow path re-pools per line)
    val slow = Tokenizer.sentences(docId, g.source.content)
      .flatMap(s => TriaffineScorer.mentions(s, w))
      .map(m => (m.sentId, m.start, m.end, m.entType, m.score))
    assert(slow == got, "per-file fast path diverged from per-sentence path")
  }
}
