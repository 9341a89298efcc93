package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd vector expressions — see graft.functions.VectorOps
  * for the column API, the shared static evaluators, and the design
  * rationale. These classes live under org.apache.spark.sql because
  * `ImplicitCastInputTypes`' signature mentions the private[sql]
  * `AbstractDataType` (the same reason graftbridge exists): declaring
  * inputTypes = ARRAY<DOUBLE> lets the analyzer implicitly cast
  * ARRAY<FLOAT> inputs (the raw `embedding` column) instead of failing
  * analysis.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  // even non-null arrays produce null when an ELEMENT is null
  override def nullable: Boolean = true

  /** graft.functions.VectorOps static helper the generated code calls. */
  protected def helper: String

  override protected def nullSafeEval(a: Any, b: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecOpRes")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorOps.$helper($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** dot(a, b) = Σ a_i · b_i */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def helper: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), 0.0 when either norm is 0. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override protected def helper: String = "cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** l2sq(a, b) = Σ (a_i − b_i)² */
case class L2Squared(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def helper: String = "l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared =
    copy(left = l, right = r)
}

/** All `tables` packed LSH bucket keys of a vector — see
  * graft.functions.LshOps for the sign-matrix design rationale. The
  * sign matrix is a codegen reference object, NOT literals: plan size
  * stays O(1) in tables·bits·dim.
  */
case class LshBuckets(child: Expression, dim: Int, bits: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val signs: Array[Double] =
    graft.functions.LshOps.signMatrix(dim, bits, tables)

  override protected def nullSafeEval(v: Any): Any =
    graft.functions.LshOps.buckets(v.asInstanceOf[ArrayData], signs, dim, bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshOps.buckets($a, $signsRef, $dim, $bits, $tables);")
  }

  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}
