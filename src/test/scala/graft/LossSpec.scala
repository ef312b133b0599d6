package graft

import graft.core.{CorpusGen, DocId, TypeDict}
import graft.evalm.Losses
import graft.extract.Tokenizer
import graft.kernel.{TriaffineScorer, Weights}

/** K11 loss zoo: classScores decode-parity, scalar-loss identities,
  * and distributed == local recompute of the full per-cell loss table. */
class LossSpec extends SparkSpec {

  private val w = Weights.default

  private def sentencesOf(id: Long) = {
    val g = CorpusGen.file(id)
    Tokenizer.sentences(DocId.of(g.source.repo, g.source.path),
      g.source.content)
  }

  test("classScores reproduces the decode argmax and score bit-exactly") {
    var checked = 0
    (0L until 40L).foreach { id =>
      sentencesOf(id).foreach { s =>
        val decoded = TriaffineScorer.scoreSentence(
          s.tokens.toIndexedSeq, s.pos.toIndexedSeq,
          s.ltokens.toIndexedSeq, s.lpos.toIndexedSeq,
          s.rtokens.toIndexedSeq, s.rpos.toIndexedSeq, w)
        if (decoded.nonEmpty) {
          val vecs = TriaffineScorer.classScores(
            s.tokens.toIndexedSeq, s.pos.toIndexedSeq,
            s.ltokens.toIndexedSeq, s.lpos.toIndexedSeq,
            s.rtokens.toIndexedSeq, s.rpos.toIndexedSeq, w,
            decoded.map(sp => (sp.start, sp.endExcl)))
          decoded.zip(vecs).foreach { case (sp, v) =>
            // replicate the decode tie-break: NA first, then types in
            // order, replaced only on strictly greater
            var bestR = v.length - 1
            var bestS = v(bestR)
            var r = 0
            while (r < v.length - 1) {
              if (v(r) > bestS) { bestS = v(r); bestR = r }
              r += 1
            }
            assert(bestR == sp.typeId && bestS == sp.score,
              s"file $id sent ${s.sentId} span (${sp.start},${sp.endExcl}): " +
                s"decode=(${sp.typeId},${sp.score}) classScores=($bestR,$bestS)")
            checked += 1
          }
        }
      }
    }
    assert(checked > 200, s"only $checked decoded spans checked")
  }

  test("scalar losses satisfy their defining identities") {
    val v = Array(1.5, -0.25, 3.0, 0.0, 2.25)
    val uniform = Array.fill(7)(0.42)
    // CE of a uniform distribution is log C
    assert(math.abs(Losses.ce(uniform, 3) - StrictMath.log(7.0)) < 1e-12)
    (0 until v.length).foreach { lab =>
      // focal with gamma = 0 degenerates to CE
      assert(math.abs(Losses.focal(v, lab, gamma = 0.0) -
        Losses.ce(v, lab)) < 1e-12)
      // label smoothing with alpha = 0 degenerates to CE
      assert(math.abs(Losses.smoothed(v, lab, alpha = 0.0) -
        Losses.ce(v, lab)) < 1e-12)
      // LDAM with zero margins and s = 1 degenerates to CE
      assert(math.abs(Losses.ldam(v, lab,
        Array.fill(v.length)(0.0), s = 1.0) - Losses.ce(v, lab)) < 1e-12)
    }
    // degenerate 1-class distribution: logSoftmax is 0 and the
    // smoothing mass has no off-class — loss is exactly 0, not
    // alpha*scores(0) (regression: the closed form assumed mass 1)
    assert(Losses.smoothed(Array(5.0), 0) == 0.0)
    // BCE-with-logits == -log sigmoid(±x)
    val na = v.length - 1
    val x = v(na)
    assert(math.abs(Losses.naBce(v, na, na) -
      (-StrictMath.log(1.0 / (1.0 + StrictMath.exp(-x))))) < 1e-12)
    assert(math.abs(Losses.naBce(v, 0, na) -
      (-StrictMath.log(1.0 - 1.0 / (1.0 + StrictMath.exp(-x))))) < 1e-12)
    // entity-CE is CE over the non-NA prefix
    assert(Losses.entCe(v, 1, na) == Losses.ce(v.take(na), 1))
    // LDAM margins: scaled to maxM at the rarest class, monotone in
    // inverse count
    val m = Losses.ldamMargins(Array(100L, 1L, 10000L), maxM = 0.5)
    assert(math.abs(m(1) - 0.5) < 1e-12 && m(0) > m(2))
  }

  test("distributed per-cell loss table == local recompute, exactly") {
    val nFiles = 6L
    val rows = Losses.evalCorpus(spark, nFiles, w).collect()
    assert(rows.nonEmpty)
    // local recompute from scratch: same cells, same kernel entry
    val bySent = rows.groupBy(r => (r.getString(0), r.getInt(1)))
    var pos = 0; var neg = 0
    (0L until nFiles).foreach { id =>
      sentencesOf(id).foreach { s =>
        bySent.get((s.docId, s.sentId)).foreach { rs =>
          val cells = rs.map(r => (r.getInt(2), r.getInt(3)))
          val vecs = TriaffineScorer.classScores(
            s.tokens.toIndexedSeq, s.pos.toIndexedSeq,
            s.ltokens.toIndexedSeq, s.lpos.toIndexedSeq,
            s.rtokens.toIndexedSeq, s.rpos.toIndexedSeq, w,
            cells.toSeq)
          rs.zip(vecs).foreach { case (r, v) =>
            val lab = r.getInt(4)
            assert(r.getDouble(5) == Losses.ce(v, lab))
            assert(r.getDouble(6) == Losses.focal(v, lab))
            assert(r.getDouble(7) == Losses.smoothed(v, lab))
            assert(r.getDouble(8) == Losses.ldam(v, lab,
              Array.fill(v.length)(0.0), s = 30.0))
            assert(r.getDouble(9) == Losses.naBce(v, lab, TypeDict.naId))
            if (lab != TypeDict.naId) {
              assert(r.getDouble(10) == Losses.entCe(v, lab, TypeDict.naId))
              // calibration: the gold class wins the distribution
              // (P/R = 1.0 is pinned elsewhere; this is the loss-side
              // view of the same fact)
              assert(v(lab) == v.max,
                s"gold cell not argmax: label=$lab scores=${v.mkString(",")}")
              pos += 1
            } else neg += 1
          }
        }
      }
    }
    assert(pos > 20 && neg > 50,
      s"cell mix not exercised: pos=$pos neg=$neg")
    // monitoring sanity: mean CE over gold-labeled cells is small
    // (the winning class concentrates the softmax on a calibrated
    // bundle; 1.0 is a loose ceiling far below the ~2.3 of a uniform
    // 10-class distribution)
    val posCe = rows.filter(_.getBoolean(11)).map(_.getDouble(5))
    assert(posCe.sum / posCe.length < 1.0,
      s"mean gold-cell CE ${posCe.sum / posCe.length} — bundle not calibrated")
    // the summary is one row of finite reductions
    val sum = Losses.summary(
      Losses.evalCorpus(spark, nFiles, w)).collect()(0)
    (0 until 5).foreach(i =>
      assert(!sum.getDouble(i).isNaN && !sum.getDouble(i).isInfinite))
  }
}
