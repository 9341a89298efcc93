package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit Karp-Rabin rolling polynomial
  * hash of a string — the document-fingerprinting primitive (content-
  * defined chunking / incremental near-dup keys). Implemented as a
  * codegen'd `UnaryExpression` (preference tier (b) of the extension
  * ladder: faster than a Scala UDF, stays inside whole-stage codegen,
  * null-safe for free via nullSafeEval/doGenCode).
  *
  * hash(s) = sum_{i} s[i] * B^(n-1-i)  mod 2^64,  B = 1000003.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    RollingHash.hash64(s)
  }

  // NOTE: the companion method must NOT be named `eval` — the case
  // class inherits Expression.eval, so scalac suppresses the static
  // forwarder on a name clash and janino then fails to resolve the
  // call, silently degrading every use to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val B = 1000003L

  /** Static evaluator shared by interpreted + generated code paths. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Column-level entry point (Spark 4: Column wraps a ColumnNode;
    * ExpressionUtils bridges catalyst Expression <-> Column).
    */
  def rolling_hash64(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      RollingHash(org.apache.spark.sql.graftbridge.expression(c)))

  /** SQL registration: SELECT rolling_hash64(text) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash(exprs.head), "scala_udf")
}
