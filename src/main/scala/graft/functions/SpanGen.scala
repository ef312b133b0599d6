package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native Catalyst Generator for span enumeration — the reference's
  * span-grid generation (/root/reference/data_util.py:326-333) as a
  * UDTF: `spans(n, maxLen)` emits one (start, end) row per valid
  * upper-triangular cell with end - start < maxLen (INCLUSIVE end,
  * like the kernel's tri-mask).
  *
  * This is the one custom expression SURVEY §7.3 allows itself: the
  * composable alternative (`explode(sequence()) x 2`) materializes an
  * intermediate integer array per row and runs two Generate stages;
  * this Generator streams the pairs directly. Registered per-session
  * via [[SpanFunctions.register]]; results are oracle-checked against
  * the double-explode formulation.
  */
case class SpanGen(n: Expression, maxLen: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(n, maxLen)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = children.forall(c => c.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"spans(n, maxLen) requires integral arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val nAny = n.eval(input)
    val mAny = maxLen.eval(input)
    if (nAny == null || mAny == null) return Nil
    val nv = nAny.asInstanceOf[Number].intValue()
    val ml = mAny.asInstanceOf[Number].intValue()
    if (nv <= 0 || ml <= 0) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 0
      def hasNext: Boolean = i < nv
      def next(): InternalRow = {
        val row = InternalRow(i, j)
        j += 1
        if (j >= nv || j - i >= ml) { i += 1; j = i }
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpanGen =
    copy(n = newChildren(0), maxLen = newChildren(1))
}

object SpanFunctions {
  /** Register `spans` for SQL/selectExpr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "spans", { exprs =>
        require(exprs.length == 2,
          s"spans(n, maxLen) takes 2 arguments, got ${exprs.length}")
        SpanGen(exprs.head, exprs(1))
      }, "scala_udf")
}
