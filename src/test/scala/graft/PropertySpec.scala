package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY §5), run by sbt's native ScalaCheck framework:
  * IoU laws mirroring /root/reference/span_utils.py:43-48, streaming
  * top-k == sort-take oracle, SpanGen counting law, kernel determinism. */
object GraftProps extends Properties("graft") {

  // interval IoU exactly as the reference defines it
  def iou(s1: Int, e1: Int, s2: Int, e2: Int): Double = {
    val inter = 1 + math.min(e1, e2) - math.max(s1, s2)
    if (inter <= 0) 0.0
    else inter.toDouble / (1 + math.max(e1, e2) - math.min(s1, s2))
  }

  val span: Gen[(Int, Int)] = for {
    s <- Gen.choose(0, 50); len <- Gen.choose(0, 20)
  } yield (s, s + len)

  property("iou bounded + reflexive + symmetric") = forAll(span, span) {
    (a, b) =>
      val v = iou(a._1, a._2, b._1, b._2)
      v >= 0.0 && v <= 1.0 &&
        iou(a._1, a._2, a._1, a._2) == 1.0 &&
        v == iou(b._1, b._2, a._1, a._2)
  }

  // drives the PRODUCTION aggregator (graft.ops.TopK.topKAgg): reduce
  // per element over a random partition split, then merge — pure local
  // calls, no Spark job per case. A test-local reimplementation here
  // would stay green through any regression in the shipped code.
  property("TopK aggregator (reduce+merge over random split) == sort-take") =
    forAll(Gen.listOfN(60, Gen.choose(-100, 100)), Gen.choose(0, 60)) {
      (xs, cut) =>
        val k = 10
        val agg = graft.ops.TopK.topKAgg(k)
        val rows = xs.zipWithIndex.map { case (s, i) =>
          (0L, s.toDouble, i.toLong)
        }
        val (l, r) = rows.splitAt(cut)
        def fold(part: Seq[(Long, Double, Long)]) =
          part.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
        val got = agg.finish(agg.merge(fold(l), fold(r)))
        val oracle = rows.map(x => (x._2, x._3))
          .sortBy { case (s, id) => (-s, id) }.take(k)
        got == oracle
    }

  property("SpanGen emits exactly the tri-masked cells") =
    forAll(Gen.choose(0, 40), Gen.choose(1, 20)) { (n, ml) =>
      val gen = graft.functions.SpanGen(
        org.apache.spark.sql.catalyst.expressions.Literal(n),
        org.apache.spark.sql.catalyst.expressions.Literal(ml))
      val rows = gen.eval(null).iterator.toVector
      val expected = (for {
        i <- 0 until n; j <- i until math.min(n, i + ml)
      } yield (i, j)).toVector
      rows.map(r => (r.getInt(0), r.getInt(1))) == expected
    }

  property("kernel deterministic, spans valid + tri-masked") = {
    val toks = Vector("def", "fooBar", "(", "x", ":", "Int", ")", ":",
      "Long", "=", "{")
    val tags = toks.map(graft.extract.Tokenizer.tagOf)
    val w = graft.kernel.Weights.default
    val a = graft.kernel.TriaffineScorer.scoreSentence(toks, tags, w)
    val b = graft.kernel.TriaffineScorer.scoreSentence(toks, tags, w)
    Prop(a == b && a.nonEmpty && a.forall(sp =>
      sp.start < sp.endExcl && sp.endExcl <= toks.length &&
        sp.endExcl - sp.start <= w.maxSpanLen))
  }
}
