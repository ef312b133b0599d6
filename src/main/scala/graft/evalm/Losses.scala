package graft.evalm

import graft.core.{SourceFileHashed, TypeDict}
import graft.extract.Extract
import graft.kernel.{TriaffineScorer, Weights}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** K11 loss zoo (reference model/losses.py:8-156) re-targeted at the
  * engine's inference-time job: MONITORING a weight bundle against a
  * labeled corpus. The reference minimizes these losses to train; an
  * extraction engine evaluates the same quantities to answer "how
  * calibrated is bundle W on labeled data D" — e.g. before promoting
  * an EMA bundle (K13) or accepting a resumed snapshot — so the zoo
  * earns an inference-time surface without any training loop.
  *
  * All losses are computed from the SAME per-span class distribution
  * the decode argmaxes over ([[TriaffineScorer.classScores]] — exact
  * decode arithmetic, shared helpers). Implemented: weighted CE,
  * focal, label-smoothed CE, LDAM, and the two-stage NA-vs-entity
  * loss. The reference's 'dice' config name is dead code (no DiceLoss
  * is defined anywhere in the reference — create_loss_function would
  * NameError on it), so it is deliberately not mirrored.
  *
  * The distributed surface emits PER-SPAN rows (pure function of
  * sentence + cell + bundle — deterministic and order-independent);
  * the reductions in [[summary]] are one aggregate over them, so the
  * heavy kernel work parallelizes like the extraction hot path:
  * factor preparation once per sentence, O(rank^2) per labeled cell.
  */
object Losses {

  /** Numerically-stabilized log softmax at one index (the standard
    * max-shift; matches torch log_softmax semantics). */
  def logSoftmax(scores: Array[Double], label: Int): Double = {
    var m = Double.NegativeInfinity
    var i = 0
    while (i < scores.length) { if (scores(i) > m) m = scores(i); i += 1 }
    var z = 0.0
    i = 0
    while (i < scores.length) { z += StrictMath.exp(scores(i) - m); i += 1 }
    scores(label) - m - StrictMath.log(z)
  }

  /** Cross-entropy -log p_label (losses.py nn.CrossEntropyLoss; class
    * weights are applied in [[summary]] — the per-span value is the
    * plain NLL). */
  def ce(scores: Array[Double], label: Int): Double =
    -logSoftmax(scores, label)

  /** Focal loss -(1-p)^gamma log p (losses.py FocalLoss.forward;
    * the per-class alpha is a scalar factor by label, applied in
    * [[summary]]). */
  def focal(scores: Array[Double], label: Int, gamma: Double = 2.0): Double = {
    val lp = logSoftmax(scores, label)
    -StrictMath.pow(1.0 - StrictMath.exp(lp), gamma) * lp
  }

  /** Label-smoothed CE (losses.py LabelSmoothCrossEntropyLoss,
    * weight=None path): true_dist = alpha/(C-1) everywhere except
    * confidence 1-alpha at the label; loss = -sum(true_dist * logp).
    * Since sum(true_dist) = 1 this is logZ - sum(true_dist * scores)
    * — one normalization pass, not one per class. */
  def smoothed(scores: Array[Double], label: Int,
      alpha: Double = 0.1): Double = {
    val c = scores.length
    // degenerate 1-class distribution: logSoftmax is 0 and the
    // smoothing mass alpha has no off-class to land on, so the loss
    // is exactly -(1-alpha)*0 = 0 (the closed form below would
    // instead return alpha*scores(0) because it assumes dist mass 1)
    if (c == 1) return 0.0
    val off = alpha / (c - 1)
    var m = Double.NegativeInfinity
    var i = 0
    while (i < c) { if (scores(i) > m) m = scores(i); i += 1 }
    var z = 0.0
    var ds = 0.0
    i = 0
    while (i < c) {
      z += StrictMath.exp(scores(i) - m)
      ds += (if (i == label) 1.0 - alpha else off) * scores(i)
      i += 1
    }
    m + StrictMath.log(z) - ds
  }

  /** LDAM (losses.py LDAMLoss): subtract the per-class margin at the
    * target index only, scale all logits by s, then CE. Margins from
    * class counts: m_c = count_c^(-1/4) rescaled so max(m) = maxM. */
  def ldamMargins(clsCounts: Array[Long], maxM: Double = 0.5): Array[Double] = {
    val raw = clsCounts.map(n => 1.0 / StrictMath.pow(math.max(n, 1L).toDouble, 0.25))
    val mx = raw.max
    raw.map(_ * maxM / mx)
  }

  def ldam(scores: Array[Double], label: Int, margins: Array[Double],
      s: Double = 30.0): Double = {
    val adj = new Array[Double](scores.length)
    var r = 0
    while (r < scores.length) {
      adj(r) = s * (if (r == label) scores(r) - margins(label) else scores(r))
      r += 1
    }
    ce(adj, label)
  }

  /** Binary NA-vs-entity term of the two-stage loss (losses.py
    * TwoLoss): BCE-with-logits on the NA logit against (label == NA),
    * in the stable max-form torch uses. */
  def naBce(scores: Array[Double], label: Int, naId: Int): Double = {
    val x = scores(naId)
    val y = if (label == naId) 1.0 else 0.0
    math.max(x, 0.0) - x * y + StrictMath.log1p(StrictMath.exp(-math.abs(x)))
  }

  /** Entity-class CE over the non-NA logits (TwoLoss's second term;
    * only defined for entity-labeled cells). */
  def entCe(scores: Array[Double], label: Int, naId: Int): Double = {
    require(label != naId, "entCe is defined only for entity cells")
    ce(scores.take(naId), label)
  }

  /** Per-cell losses for a labeled span table, distributed.
    *
    * `labels`: (docId, sentId, start, end, label) with exclusive end
    * and label in [0, TypeDict.naId]. Cells are grouped per sentence
    * relationally and scored in one mapPartitions over the joined
    * rows — factor preparation runs once per sentence whatever the
    * cell count (the kernel's Workspace is per-thread, zero
    * steady-state allocation). Output adds one double column per
    * loss; every value is a pure function of (sentence, cell, bundle),
    * so the result is exact under any partitioning. */
  def spanLosses(files: Dataset[SourceFileHashed], labels: DataFrame,
      weights: Weights = Weights.default, gamma: Double = 2.0,
      smoothAlpha: Double = 0.1, ldamM: Array[Double] = null,
      ldamS: Double = 30.0): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(weights)
    val naId = TypeDict.naId
    val margins =
      if (ldamM != null) ldamM
      else Array.fill(TypeDict.numTypes + 1)(0.0)
    val bm = spark.sparkContext.broadcast(margins)
    val cells = labels
      .groupBy(col("docId"), col("sentId"))
      .agg(collect_list(struct(col("start"), col("end"), col("label")))
        .as("cells"))
    Extract.sentences(files).toDF()
      .join(cells, Seq("docId", "sentId"))
      .select(col("docId"), col("sentId"), col("tokens"), col("pos"),
        col("ltokens"), col("lpos"), col("rtokens"), col("rpos"),
        col("cells"))
      .as[(String, Int, Seq[String], Seq[String], Seq[String], Seq[String],
        Seq[String], Seq[String], Seq[(Int, Int, Int)])]
      .mapPartitions { it =>
        val w = bw.value; val m = bm.value
        it.flatMap { case (docId, sentId, toks, tags, lt, lg, rt, rg, cs) =>
          val sc = TriaffineScorer.classScores(toks.toIndexedSeq,
            tags.toIndexedSeq, lt.toIndexedSeq, lg.toIndexedSeq,
            rt.toIndexedSeq, rg.toIndexedSeq, w,
            cs.map(c => (c._1, c._2)))
          cs.zip(sc).map { case ((s0, e0, lab), v) =>
            (docId, sentId, s0, e0, lab,
              ce(v, lab), focal(v, lab, gamma), smoothed(v, lab, smoothAlpha),
              ldam(v, lab, m, ldamS), naBce(v, lab, naId),
              if (lab != naId) entCe(v, lab, naId) else 0.0,
              lab != naId)
          }
        }
      }
      .toDF("docId", "sentId", "start", "end", "label",
        "ce", "focal", "smooth", "ldam", "na_bce", "ent_ce", "is_entity")
  }

  /** The reference's reductions over per-cell rows: weighted-CE mean
    * (entity weight 1, NA weight naWeight — torch's weighted
    * CrossEntropyLoss normalizes by the sum of applied weights),
    * alpha-weighted focal mean, plain means for smooth/ldam, and the
    * two-stage total binaryWeight * mean(na_bce) + mean(ent_ce over
    * entity cells). One aggregate; emits a single row. */
  def summary(perSpan: DataFrame, naWeight: Double = 1.0,
      focalAlpha: Double = 0.75, binaryWeight: Double = 1.0): DataFrame = {
    val wCol = when(col("is_entity"), lit(1.0)).otherwise(lit(naWeight))
    val aCol = when(col("is_entity"), lit(focalAlpha))
      .otherwise(lit(1.0 - focalAlpha))
    perSpan.agg(
      (sum(col("ce") * wCol) / sum(wCol)).as("ce"),
      avg(col("focal") * aCol).as("focal"),
      avg(col("smooth")).as("smooth"),
      avg(col("ldam")).as("ldam"),
      (lit(binaryWeight) * avg(col("na_bce")) +
        // no entity cells -> the label term is 0.0, like TwoLoss
        coalesce(
          sum(when(col("is_entity"), col("ent_ce")).otherwise(lit(0.0))) /
            nullif(sum(when(col("is_entity"), lit(1L)).otherwise(lit(0L))),
              lit(0L)),
          lit(0.0)))
        .as("two"))
  }

  /** Convenience: the reference's actual training-cell set for a
    * corpus slice — every gold span with its type id plus the K12
    * negative sample (hard negatives + kept easy negatives) as NA
    * cells, produced by THE shared sampler core
    * ([[graft.queries.KgQueries.sampleCells]] — the same code the
    * driver grades, so the monitoring cell set cannot drift from it;
    * here fed from the closed-form gold to stay label-faithful). The
    * monitoring loss of bundle `w` on its own corpus. */
  def evalCorpus(spark: org.apache.spark.sql.SparkSession, nFiles: Long,
      weights: Weights = Weights.default): DataFrame = {
    val files = Extract.corpus(spark, nFiles)
    val gold = graft.Pipeline.goldMentions(spark, nFiles)
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("entType"))
      .distinct()
      // gold is read by both the positive cells and the sampler —
      // materialize once instead of re-running the generator twice
      .localCheckpoint()
    val posCells = gold
      .withColumn("label",
        element_at(typedLit(TypeDict.typeToId), col("entType")))
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("label"))
    val negCells = graft.queries.KgQueries.sampleCells(
        graft.Pipeline.goldSentences(spark, nFiles),
        gold.select(col("docId"), col("sentId"), col("start"), col("end")))
      .filter(col("role") =!= "pos")
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        lit(TypeDict.naId).as("label"))
    spanLosses(files, posCells.unionByName(negCells), weights)
  }

  /** The graded integer projection of a per-cell loss row: each loss
    * floored at 1e9 resolution (`floor(x * 1e9)` — Spark's floor(double)
    * and JVM Math.floor agree exactly, and LossSpec pins the underlying
    * doubles bit-exact between the distributed table and the twin, so
    * the floors can never straddle a boundary differently). */
  val LossScale = 1e9

  /** SEQUENTIAL TWIN of [[evalCorpus]] — same cell set, same kernel
    * entry, same loss arithmetic, no Spark (the ReferenceScorer
    * pattern: one shared code path per stage, driver-side loops for
    * the rest). This is the GOLD side of the driver-graded
    * `loss_cells` row: Verify dumps this table to parquet and the
    * oracle is a plain ordered select over it, so the distributed
    * spanLosses plan is integer-exactly hash-compared against a
    * single-threaded recompute. */
  def twinCells(nFiles: Long, weights: Weights = Weights.default)
      : Seq[(String, Int, Int, Int, Int,
        Long, Long, Long, Long, Long, Long)] = {
    // DELIBERATELY independent re-derivation of the md5-60bit family
    // (hex-string parse here vs byte shifting in HashSigs, SQL md5()
    // in TextOps): the twin is the gold side of a driver-graded hash
    // compare, so sharing the implementation would let a bug in the
    // shared code pass unnoticed; drift fails the compare loudly.
    def md5h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val naId = TypeDict.naId
    val files = (0L until nFiles).map(graft.core.CorpusGen.file)
    // the same distinct the distributed side applies to gold mentions
    val goldCells = files.flatMap(_.mentions)
      .map(m => (m.docId, m.sentId, m.start, m.end, m.entType)).distinct
    val posBySent = goldCells.groupBy(c => (c._1, c._2))
      .map { case (k, cs) => k -> cs.map(c => (c._3, c._4)).toSet }
    // K12 sampler, local mirror (KgQueries.sampleCells semantics —
    // NegSampleSpec pins the distributed side against this same rule)
    val negCells = files.flatMap(_.sents).flatMap { s =>
      val ps = posBySent.getOrElse((s.docId, s.sentId),
        Set.empty[(Int, Int)])
      val univ = for {
        st <- 0 until s.n
        e <- (st + 1) to math.min(s.n, st + 16)
      } yield (st, e)
      val roled = univ.map { case (st, e) =>
        val isPos = ps.contains((st, e))
        val near = ps.exists { case (gs, ge) =>
          (st - gs).abs + (e - ge).abs <=
            graft.queries.KgQueries.HardNegDist }
        (st, e, if (isPos) "pos" else if (near) "hard_neg" else "easy_neg")
      }
      val posCnt = roled.count(_._3 == "pos").toLong
      val easyCnt = roled.count(_._3 == "easy_neg").toLong
      roled.collect {
        case (st, e, role)
          if role != "pos" &&
            (role != "easy_neg" ||
              (md5h60(s"${s.docId}#${s.sentId}#$st#$e#42") % 1000000L) *
                (easyCnt * 1000000L + 1L) <= posCnt * 1000000000000L) =>
          (s.docId, s.sentId, st, e, naId)
      }
    }
    val cells = goldCells.map(c =>
      (c._1, c._2, c._3, c._4, TypeDict.typeToId(c._5))) ++ negCells
    val bySent = cells.groupBy(c => (c._1, c._2))
    def e9(x: Double): Long = math.floor(x * LossScale).toLong
    val margins = Array.fill(TypeDict.numTypes + 1)(0.0)
    files.flatMap { g =>
      graft.extract.Tokenizer.sentences(
        graft.core.DocId.of(g.source.repo, g.source.path),
        g.source.content).flatMap { s =>
        val cs = bySent.getOrElse((s.docId, s.sentId), Seq.empty)
        if (cs.isEmpty) Seq.empty
        else {
          val sc = TriaffineScorer.classScores(s.tokens.toIndexedSeq,
            s.pos.toIndexedSeq, s.ltokens.toIndexedSeq,
            s.lpos.toIndexedSeq, s.rtokens.toIndexedSeq,
            s.rpos.toIndexedSeq, weights, cs.map(c => (c._3, c._4)))
          cs.zip(sc).map { case ((docId, sentId, st, e, lab), v) =>
            (docId, sentId, st, e, lab,
              e9(ce(v, lab)), e9(focal(v, lab)), e9(smoothed(v, lab)),
              e9(ldam(v, lab, margins)), e9(naBce(v, lab, naId)),
              e9(if (lab != naId) entCe(v, lab, naId) else 0.0))
          }
        }
      }
    }
  }
}
