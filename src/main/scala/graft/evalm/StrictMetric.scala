package graft.evalm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strict span-level P/R/F1 (reference /root/reference/evaluation.py:69-103):
  * a prediction is correct iff (docId, sentId, start, end, entType)
  * matches a gold row exactly. Pure DataFrame aggregation. The
  * full-outer match join SHUFFLES both sides on the match key: the gold
  * side is corpus-proportional (never a legitimate broadcast at data
  * scale), and a broadcast hash join cannot execute a full-outer
  * build side anyway — Spark would silently ignore the hint.
  * (SURVEY §2.3 J1, §2.4 A1). */
object StrictMetric {

  private val keys = Seq("docId", "sentId", "start", "end", "entType")

  final case class Prf(correct: Long, npred: Long, ngold: Long,
      p: Double, r: Double, f1: Double)

  /** pred/gold must both contain the five key columns. Single pass:
    * full-outer join on the match key + one aggregate (the plan runs
    * the expensive pred side exactly once). */
  def prf(pred: DataFrame, gold: DataFrame,
      broadcastGold: Boolean = false): Prf = {
    val p = pred.select(keys.map(col): _*).dropDuplicates(keys)
      .withColumn("isP", lit(1L))
    val g0 = gold.select(keys.map(col): _*).dropDuplicates(keys)
      .withColumn("isG", lit(1L))
    val g = if (broadcastGold) broadcast(g0) else g0
    fromJoined(p.join(g, keys, "full_outer"))
  }

  private def fromJoined(j: DataFrame): Prf = {
    val r = j.agg(
      sum(when(col("isP") === 1 && col("isG") === 1, 1L).otherwise(0L)),
      sum(coalesce(col("isP"), lit(0L))),
      sum(coalesce(col("isG"), lit(0L)))).head()
    val correct = r.getLong(0); val npred = r.getLong(1)
    val ngold = r.getLong(2)
    val prec = if (npred == 0) 0.0 else correct.toDouble / npred
    val rec = if (ngold == 0) 0.0 else correct.toDouble / ngold
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    Prf(correct, npred, ngold, prec, rec, f1)
  }

  /** Same as a one-row DataFrame (for SparkEntry). */
  def prfDf(spark: SparkSession, pred: DataFrame, gold: DataFrame): DataFrame = {
    import spark.implicits._
    val m = prf(pred, gold)
    Seq((m.correct, m.npred, m.ngold, m.p, m.r, m.f1))
      .toDF("correct", "npred", "ngold", "precision", "recall", "f1")
  }

  /** Triple-level strict match on (subj, pred, obj, docId). */
  def triplePrf(predT: DataFrame, goldT: DataFrame): Prf = {
    val k = Seq("subj", "pred", "obj", "docId")
    val p = predT.select(k.map(col): _*).dropDuplicates(k)
      .withColumn("isP", lit(1L))
    val g = goldT.select(k.map(col): _*).dropDuplicates(k)
      .withColumn("isG", lit(1L))
    fromJoined(p.join(g, k, "full_outer"))
  }
}
