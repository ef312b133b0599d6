package graft

import graft.core.CorpusGen
import graft.extract.Tokenizer
import graft.kernel.{TriaffineScorer, Weights}
import org.scalatest.funsuite.AnyFunSuite

/** Frozen numeric scores for fixed sentences (bit-exact doubles).
  *
  * The rule-compiled weights carry ±5 margins, so the epsilon-scaled
  * triaffine term (K6/K8 arithmetic, reference
  * /root/reference/model/parser.py:212-290) is decision-inert: the
  * parity suites can never catch a bug in the contraction itself. This
  * golden test pins the exact low-order digits each span score gets
  * from the triaffine + stage-2 terms — ANY perturbation of the
  * contraction (loop order, prefix-sum rewrite, factor change) flips
  * the frozen values and fails here.
  */
class GoldenKernelSpec extends AnyFunSuite {

  test("span scores of CorpusGen.file(5) sentences 4-5 are bit-exact") {
    val w = Weights.default
    val g = CorpusGen.file(5L)
    val docId = s"${g.source.repo}/${g.source.path}"
    val got = Tokenizer.sentences(docId, g.source.content)
      .filter(s => s.sentId == 4 || s.sentId == 5)
      .flatMap(s => TriaffineScorer.mentions(s, w))
      .map(m => (m.sentId, m.start, m.end, m.entType, m.score))
    val expected = Seq(
      (4, 1, 2, "annotation", 10.000013240365895),
      (5, 1, 2, "function", 9.999995984141407),
      (5, 1, 9, "signature", 4.999997151944592),
      (5, 3, 4, "identifier", 15.000002077278662),
      (5, 5, 6, "type_ref", 5.000014117279009),
      (5, 8, 9, "type_ref", 5.000018767008297))
    assert(got.size == expected.size, s"got: $got")
    got.zip(expected).foreach { case (a, e) =>
      assert((a._1, a._2, a._3, a._4) == (e._1, e._2, e._3, e._4), s"span: $a")
      assert(a._5 == e._5,
        f"score drift ${a._4}: got ${a._5}%.17g want ${e._5}%.17g " +
          "(triaffine contraction perturbed?)")
    }
  }
}
