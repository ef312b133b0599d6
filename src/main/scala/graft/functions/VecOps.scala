package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass vector kernels for the similarity operators, as native
  * Catalyst expressions — same rationale as HashSigs: the lambda
  * higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback, paying an interpreted lambda dispatch + boxing per
  * element; a cosine over dim-d vectors costs 3 separate HOF passes
  * (a·b, a·a, b·b ≈ 6d boxed evaluations). The fused kernel does all
  * three accumulations in ONE tight JVM loop per row.
  *
  * Float parity: each of the three sums accumulates LEFT-TO-RIGHT in
  * double precision, exactly like the HOF `aggregate` fold and the
  * DuckDB oracle's list evaluation order, then combines as
  * a·b / (sqrt(a·a) * sqrt(b·b)) — bit-identical to the formulation it
  * replaces (parity test in OpsSpec). Null parity with `zip_with`:
  * length mismatch or a null element yields NULL (zip_with pads the
  * shorter side with nulls, and null poisons the product sum).
  */
object VecKernels {

  /** Fused cosine similarity; null (boxed) on length mismatch or null
    * element, mirroring the HOF formulation. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }
}

/** cosine(a, b) over array<double>, fused single pass. Rejects any
  * other element type at analysis (callers cast array<float> vectors
  * with `.cast("array<double>")`, which also pins the widening
  * semantics in the plan instead of hiding it in the kernel). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecKernels.cosine($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Register the vector kernels for call_function/SQL use in this
    * session (same temp-function surface as the signature kernels). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", {
        case Seq(a, b) => CosineSim(a, b)
        case exprs => throw new IllegalArgumentException(
          s"cosine_sim(a, b) takes 2 arguments, got ${exprs.length}")
      }, "scala_udf")
  }
}
