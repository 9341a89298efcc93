package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector arithmetic over array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is CodegenFallback in Spark — every row allocates lambda frames and
  * evaluates interpreted, and it breaks the surrounding whole-stage
  * codegen span. These expressions are the extension-ladder tier-(b)
  * replacement (custom Expression > UDF): one fused loop per row,
  * shared between the interpreted and generated paths via static
  * helpers (NOT named `eval` — see RollingHash's janino forwarder
  * note), null-safe via nullSafeEval/defineCodeGen.
  *
  * Accumulation order is left-to-right per accumulator — bit-identical
  * to the HOF formulation it replaces, so frozen oracles stay valid.
  * Lengths may differ (min is used); element-level nulls are not
  * supported (embedding vectors are dense).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<DOUBLE> inputs, got ${l.sql}, ${r.sql}")
    }

  /** Fully-qualified static helper the generated code calls. */
  protected def helper: String

  override protected def nullSafeEval(a: Any, b: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$helper($a, $b)")
}

/** dot(a, b) = Σ a_i · b_i */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def helper: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), 0.0 when either norm is 0. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override protected def helper: String = "cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** l2sq(a, b) = Σ (a_i − b_i)² */
case class L2Squared(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def helper: String = "l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared =
    copy(left = l, right = r)
}

object VectorOps {

  /** Static evaluators shared by interpreted + generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val na = math.sqrt(sa)
    val nb = math.sqrt(sb)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val t = a.getDouble(i) - b.getDouble(i); s += t * t; i += 1 }
    s
  }

  // ---- Column-level entry points ----
  import org.apache.spark.sql.graftbridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def vec_cosine(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def vec_l2sq(a: Column, b: Column): Column =
    column(L2Squared(expression(a), expression(b)))

  /** SQL registration: SELECT vec_cosine(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2sq",
      es => L2Squared(es.head, es(1)), "scala_udf")
  }
}
