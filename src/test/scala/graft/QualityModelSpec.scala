package graft

import graft.ml.QualityModel
import org.apache.spark.sql.functions._

/** Learned doc-quality head: deterministic fit, held-out agreement vs
  * the silver heuristic, and the Catalyst scoring path.
  */
class QualityModelSpec extends SparkSuite {

  test("training is deterministic (bit-identical weights)") {
    val a = QualityModel.train(60)
    val b = QualityModel.train(60)
    assert(a.length === QualityModel.Dim)
    assert(a.toSeq === b.toSeq)
  }

  /** Held-out fixture docs (ids the trainer never saw) run through the
    * same corruption scheme; the learned head must agree with the
    * heuristic labels it was silver-trained on.
    */
  test("held-out agreement vs the silver heuristic >= 0.9") {
    val w = QualityModel.default
    val texts = (0 until 60).flatMap { i =>
      val doc = graft.fixtures.BioGen.generate(s"qheldout$i", "")._1
      val clean = doc.spans.filter(sp => sp.kind == "text" && sp.text != null)
        .map(_.text).mkString(" ")
      val toks = clean.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      Seq(clean,
        Array.fill(15)(toks.take(10)).flatten.mkString(" "),
        toks.map(_ + "1234").mkString(" "),
        toks.take(5).mkString(" "),
        toks.filterNot(QualityModel.StopSet).mkString(" "))
    }
    val agree = texts.count { t =>
      val f = QualityModel.features(t)
      val score = (0 until QualityModel.Dim).map(i => w(i) * f(i)).sum
      (score > 0) == QualityModel.heuristicGood(t)
    }.toDouble / texts.size
    assert(agree >= 0.9, s"held-out agreement $agree")
  }

  test("Catalyst scoring agrees with the heuristic on the real corpus") {
    val df = graft.operators.TextAnalysis.qualityLearned(spark, "/root/testdata/sf0.001")
    val r = df.agg(
      avg(when(col("pred_good") === col("heur_good"), 1.0).otherwise(0.0)).as("agree"),
      count(lit(1)).as("n")).first()
    // a linear head cannot express the exact 4-threshold AND — 0.8 is
    // the floor a useful learned filter must clear on out-of-
    // distribution data (measured 0.88 at sf0.01)
    assert(r.getDouble(0) >= 0.8, s"corpus agreement ${r.getDouble(0)}")
    assert(r.getLong(1) > 0)
  }

  test("Catalyst margins match the plain-Scala feature path") {
    // the serving expression and the training features must be the SAME
    // function — score a few corpus docs both ways
    val w = QualityModel.default
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20).collect()
    val learned = graft.operators.TextAnalysis
      .qualityLearned(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("margin")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val f = QualityModel.features(r.getString(1))
      val s = (0 until QualityModel.Dim).map(i => w(i) * f(i)).sum
      assert(math.abs(learned(r.getLong(0)) - s) < 1e-6,
        s"doc ${r.getLong(0)}: catalyst ${learned(r.getLong(0))} scala $s")
    }
  }
}
