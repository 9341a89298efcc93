package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Native vector expressions: results must be BIT-IDENTICAL to the
  * higher-order-function formulation they replaced (same left-to-right
  * accumulation), survive CODEGEN_ONLY, and stay null-safe.
  */
class VectorOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = (0 until 30).map { i =>
    val a = (0 until 16).map(j =>
      (graft.util.Det.bounded(graft.util.Det.mix(i.toLong, j.toLong), 2001) - 1000) / 250.0)
    val b = (0 until 16).map(j =>
      (graft.util.Det.bounded(graft.util.Det.mix(i.toLong + 100, j.toLong), 2001) - 1000) / 250.0)
    (i, a, b)
  }

  private lazy val df = (vecs :+ ((99, Seq.fill(16)(0.0), vecs.head._2))) // zero vector
    .toDF("i", "a", "b")

  // the HOF reference formulation (what the operators used before)
  private def hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)
  private def hofCos = {
    val na = sqrt(aggregate($"a", lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate($"b", lit(0.0), (acc, v) => acc + v * v))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(hofDot / (na * nb))
  }
  private def hofL2 = aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
    lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF formulation (dot, cosine, l2sq)") {
    val r = df.select(
      VectorOps.vec_dot($"a", $"b").as("d"), hofDot.as("dr"),
      VectorOps.vec_cosine($"a", $"b").as("c"), hofCos.as("cr"),
      VectorOps.vec_l2sq($"a", $"b").as("l"), hofL2.as("lr")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) === row.getDouble(1)) // exact, not approx
      assert(row.getDouble(2) === row.getDouble(3))
      assert(row.getDouble(4) === row.getDouble(5))
    }
  }

  test("generated code compiles and runs (no interpreter fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = df.select(VectorOps.vec_cosine($"a", $"b")).collect()
      assert(r.length === df.count())
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("null-safe and SQL-registered") {
    VectorOps.register(spark)
    val r = Seq((Seq(1.0, 0.0), Option(Seq(1.0, 0.0))), (Seq(1.0, 0.0), None))
      .toDF("a", "b")
      .selectExpr("vec_cosine(a, b) AS c", "vec_dot(a, b) AS d", "vec_l2sq(a, b) AS l")
      .collect()
    assert(r(0).getDouble(0) === 1.0)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).isNullAt(2))
  }

  test("float arrays are implicitly cast; null ELEMENTS yield null") {
    // raw float embedding column, no manual cast
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val self = emb.select(VectorOps.vec_cosine($"embedding", $"embedding").as("c"))
      .collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6))
    // a null element poisons the result (zip_with/aggregate semantics)
    val withNullElem = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, 0.0), Seq[java.lang.Double](1.0, 0.0)))
      .toDF("a", "b")
      .select(VectorOps.vec_dot($"a", $"b").as("d"),
        VectorOps.vec_cosine($"a", $"b").as("c"),
        VectorOps.vec_l2sq($"a", $"b").as("l"))
      .collect()
    assert(withNullElem(0).isNullAt(0) && withNullElem(0).isNullAt(1) &&
      withNullElem(0).isNullAt(2))
    assert(withNullElem(1).getDouble(0) === 1.0)
  }

  test("length mismatch yields null, matching the HOF null-pad semantics") {
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(VectorOps.vec_dot($"a", $"b").as("d"),
        VectorOps.vec_cosine($"a", $"b").as("c"),
        VectorOps.vec_l2sq($"a", $"b").as("l"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2))
  }

  test("works over the embeddings table inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("vec"))
    val q = emb.select(VectorOps.vec_cosine($"vec", $"vec").as("self"))
    val plan = q.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("*(1)"), plan) // stays in a WholeStageCodegen span
    assert(q.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
