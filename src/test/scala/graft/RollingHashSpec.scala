package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd expression: interpreted == generated == reference. */
class RollingHashSpec extends SparkSuite {
  import spark.implicits._

  private def ref(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * RollingHash.B + (b & 0xffL))

  test("column result matches reference implementation") {
    val inputs = Seq("", "a", "hello world", "Alice Abram was born", "ünïcödé ✓")
    val got = inputs.toDF("s")
      .select(RollingHash.rolling_hash64($"s")).collect().map(_.getLong(0))
    assert(got.toSeq === inputs.map(ref))
  }

  test("static eval matches reference (codegen path shares it)") {
    for (s <- Seq("x", "abc def", "12345"))
      assert(RollingHash.hash64(UTF8String.fromString(s)) === ref(s))
  }

  test("null-safe and SQL-registered") {
    RollingHash.register(spark)
    val r = Seq[(Integer, String)]((1, "abc"), (2, null)).toDF("i", "s")
      .selectExpr("rolling_hash64(s) AS h").collect()
    assert(r(0).getLong(0) === ref("abc"))
    assert(r(1).isNullAt(0))
  }

  test("works inside whole-stage codegen over the documents table") {
    val df = graft.operators.TextAnalysis
      .rollingFingerprint(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500)
    // deterministic across two runs
    assert(df.agg(sum($"rfp".cast("decimal(38,0)"))).collect()(0).getDecimal(0) ===
      df.agg(sum($"rfp".cast("decimal(38,0)"))).collect()(0).getDecimal(0))
  }

  test("generated code actually compiles (no interpreter fallback)") {
    // CODEGEN_ONLY turns the silent janino-failure fallback into an
    // error — guards the static-forwarder name-clash regression (a
    // companion method named `eval` shadows Expression.eval and scalac
    // then emits no static forwarder for janino to resolve).
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq("abc", "xyz").toDF("s")
        .select(RollingHash.rolling_hash64($"s").as("h")).collect()
      assert(r.map(_.getLong(0)).toSeq === Seq(ref("abc"), ref("xyz")))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
