package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F14 — index-scatter add (reference span_utils.py:50-64,
  * `tensor_idx_add`): accumulate per-row values into the cells of a
  * dense n-dimensional tensor addressed by an index tuple.
  *
  * The reference flattens the index with row-major coefficients built
  * from the trailing dimension sizes and mutates
  * `src.reshape(-1)[flat] += value`. Relationally the SAME flat index
  * is a codegen'd column and the adds are a groupBy sum — map-side
  * partial aggregation IS the scatter combine, so the op scales with
  * one shuffle of (cell, partial) pairs instead of a shared mutable
  * tensor. Only touched cells materialize (the zeros of a
  * 100 TB-scale tensor never exist; readers join against the result,
  * which is how the reference consumes the counts it builds with
  * this, span_utils.py's top-k membership use — SURVEY §2.7 note
  * "membership = join").
  */
object ScatterAdd {

  /** Row-major flat index of an n-dim cell: coefficients from the
    * trailing sizes, exactly the reference's `coef` loop
    * (span_utils.py:56-60). `dims` = (index column, dimension size)
    * per axis. Out-of-range indices raise (the reference silently
    * corrupts a neighboring cell — a distributed job wants the
    * loud version). */
  def flatIdx(dims: Seq[(Column, Int)]): Column = {
    require(dims.nonEmpty, "flatIdx needs at least one dimension")
    require(dims.forall(_._2 > 0), "dimension sizes must be positive")
    val coefs = dims.map(_._2).scanRight(1L)((n, acc) => n * acc).tail
    dims.zip(coefs).map { case ((c, n), k) =>
      val idx = c.cast("long")
      val checked = when(idx >= 0 && idx < n, idx).otherwise(raise_error(
        concat(lit(s"scatter index out of range [0, $n): "),
          idx.cast("string"))))
      checked * lit(k)
    }.reduce(_ + _)
  }

  /** Scatter-add `valueCol` into the tensor cells addressed by `dims`:
    * one groupBy on the flat index (partial aggregation = the scatter
    * combine). Returns (flat_idx, total) for touched cells. */
  def scatterAdd(df: DataFrame, dims: Seq[(Column, Int)],
      valueCol: Column): DataFrame =
    df.groupBy(flatIdx(dims).as("flat_idx"))
      .agg(sum(valueCol).as("total"))
}
