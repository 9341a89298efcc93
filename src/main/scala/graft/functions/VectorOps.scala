package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftvec.{CosineSim, DotProduct, L2Squared}

/** Native codegen'd vector arithmetic over array<double> columns
  * (array<float> inputs are implicitly cast by the analyzer — the
  * expression classes live in org.apache.spark.sql.graftvec because
  * ImplicitCastInputTypes mentions the private[sql] AbstractDataType).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is CodegenFallback in Spark — every row allocates lambda frames and
  * evaluates interpreted, and it breaks the surrounding whole-stage
  * codegen span. These expressions are the extension-ladder tier-(b)
  * replacement (custom Expression > UDF): one fused loop per row,
  * shared between the interpreted and generated paths via the static
  * helpers below (NOT named `eval` — see RollingHash's janino
  * forwarder note).
  *
  * Accumulation order is left-to-right per accumulator — bit-identical
  * to the HOF formulation it replaces, so frozen oracles stay valid.
  * A LENGTH MISMATCH yields null (zip_with pads the short side with
  * nulls, so the HOF formulation also returned null — the earlier
  * min-length scan silently truncated dim-mismatched embeddings to a
  * finite similarity; advisor finding, round 2). A null ELEMENT in the
  * scanned range also yields null, matching zip_with/aggregate's null
  * propagation (helpers return boxed Double; codegen branches on it).
  */
object VectorOps {

  /** Static evaluators shared by interpreted + generated code. Boxed
    * Double: null result when a scanned element is null.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i); i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val na = math.sqrt(sa)
    val nb = math.sqrt(sb)
    java.lang.Double.valueOf(if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb))
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getDouble(i) - b.getDouble(i); s += t * t; i += 1
    }
    java.lang.Double.valueOf(s)
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
