package graft

import graft.ops.ScatterAdd
import org.apache.spark.sql.functions._

/** F14 scatter-add: distributed groupBy-scatter == local dense-tensor
  * mutation with the reference's row-major coefficient scheme. */
class ScatterAddSpec extends SparkSpec {

  test("scatter-add == local dense-tensor scatter (3-dim, ref coefs)") {
    import spark.implicits._
    // every (i, j, k) cell touched 1-3 times with distinct values
    val rows = for {
      i <- 0 until 2; j <- 0 until 3; k <- 0 until 4
      r <- 0 to (i + j + k) % 3
    } yield (i, j, k, (i * 7 + j * 3 + k + r).toLong)
    val df = rows.toDF("i", "j", "k", "v").repartition(4)
    val out = ScatterAdd.scatterAdd(df,
      Seq((col("i"), 2), (col("j"), 3), (col("k"), 4)), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the reference's mutation, verbatim: coef = (12, 4, 1) from the
    // trailing sizes (span_utils.py:56-60)
    val dense = new Array[Long](24)
    rows.foreach { case (i, j, k, v) => dense(i * 12 + j * 4 + k) += v }
    assert(out == dense.zipWithIndex
      .map { case (v, idx) => idx.toLong -> v }.toMap)
  }

  test("out-of-range index fails loudly (the reference corrupts a neighbor)") {
    import spark.implicits._
    val df = Seq((5, 1L)).toDF("i", "v")
    val e = intercept[Exception] {
      ScatterAdd.scatterAdd(df, Seq((col("i"), 4)), col("v")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("scatter index out of range"),
      s"unexpected failure: ${msgs(e)}")
  }
}
