package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass per-group top-k as a typed Aggregator (SURVEY §2.10:
  * the scale path for the reference's per-sentence top-30,
  * span_att_v2.py:247-274).
  *
  * The window-function top-k (`row_number() <= k`) must shuffle and
  * SORT every row of each group; this Aggregator keeps only a k-sized
  * bounded buffer per group, combines map-side (partial aggregation
  * before the shuffle), and never materializes the full group — the
  * difference between O(n log n) sort-spill and O(n log k) streaming
  * at a 100 TB group. Equivalence with the window version is asserted
  * in tests.
  *
  * Rows are (groupKey, sortKey, payload); ordering is (sortKey DESC,
  * payload ASC) with a deterministic tie-break, matching
  * `Window.orderBy(desc(score), asc(payload))`.
  */
object TopK {

  type Row3 = (Long, Double, Long) // (group, score, payload id)

  final case class Buf(var items: List[(Double, Long)])

  def topKAgg(k: Int): Aggregator[Row3, Buf, Seq[(Double, Long)]] =
    new Aggregator[Row3, Buf, Seq[(Double, Long)]] {
      private def insert(items: List[(Double, Long)],
          v: (Double, Long)): List[(Double, Long)] = {
        // single-pass ordered insert into the already-(-score, id)-
        // sorted list, bounded at k — re-sorting the whole buffer per
        // input row would be O(k log k) each and dominate the
        // aggregation at scale (reduce runs once per row; the rare
        // merge below may still sort)
        val (before, after) = items.span { case (s, id) =>
          s > v._1 || (s == v._1 && id < v._2)
        }
        (before ::: v :: after).take(k)
      }
      def zero: Buf = Buf(Nil)
      def reduce(b: Buf, r: Row3): Buf = {
        b.items = insert(b.items, (r._2, r._3)); b
      }
      def merge(a: Buf, b: Buf): Buf = {
        a.items = (a.items ++ b.items)
          .sortBy { case (s, id) => (-s, id) }.take(k)
        a
      }
      def finish(b: Buf): Seq[(Double, Long)] = b.items
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** df(group: long, score: double, id: long) -> (group, rank, id)
    * via the streaming aggregator. */
  def topKPerGroup(df: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Row3]
      .groupByKey(_._1)
      .agg(topKAgg(k).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.zipWithIndex.map { case ((s, id), i) => (g, i + 1, id) }
      }
      .toDF("group", "rank", "id")
  }
}
