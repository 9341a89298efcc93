package graft

import graft.ml.LinearModel
import graft.model.{Doc, Span}
import graft.operators.{Classification, Extraction, Serialize}
import graft.sources.Corpus
import org.apache.spark.sql.functions._

/** Learned classifier (featurize + averaged perceptron + mapPartitions
  * scoring): must match the rule model on the fixture corpus and
  * degrade gracefully on non-template sentences.
  */
class LearnedSpec extends SparkSuite {
  import spark.implicits._

  lazy val lm = LinearModel.default
  lazy val rule = Classification.defaultModel

  test("learned == rule model on the fixture corpus") {
    val docs = Corpus.fixtureCorpus(spark, 120)
    val lus = Extraction.matchN2n(Extraction.sentences(docs)).cache()
    val bcL = spark.sparkContext.broadcast(lm)
    val bcR = spark.sparkContext.broadcast(rule)
    def canon(ds: org.apache.spark.sql.Dataset[graft.model.ClassifiedSentence]) =
      ds.collect().map(c => (c.doc_id, c.sentence_offset, c.frame, c.subj_chunk,
        c.chunks.map(ch => (ch.fe, ch.text)).toSet)).toSet
    val learned = canon(Classification.classifyLearned(lus, bcL, bcR))
    val ruled = canon(Classification.classify(lus, bcR))
    assert(learned === ruled)
    lus.unpersist()
  }

  test("learned pipeline preserves P/R = 1.0 vs gold") {
    val n = 100
    val docs = Corpus.fixtureCorpus(spark, n)
    val bcL = spark.sparkContext.broadcast(lm)
    val bcR = spark.sparkContext.broadcast(rule)
    val cls = Classification.classifyLearned(
      Extraction.matchN2n(Extraction.sentences(docs)), bcL, bcR)
    val triples = Serialize.unionDedup(
      Serialize.textTriples(cls),
      Serialize.semiTriples(Corpus.fixtureSemi(spark, n)))
    val r = Serialize.evaluate(triples, Corpus.fixtureGold(spark, n).toDF()).collect()(0)
    assert(r.getAs[Double]("precision") === 1.0, r.toString)
    assert(r.getAs[Double]("recall") === 1.0, r.toString)
  }

  test("generalizes to a non-template sentence (extra tokens)") {
    val doc = Doc("g1", Seq(Span("text",
      "Alice Abram was born in Paris on 27 January 1832 near the waterfront .", null, 0)))
    val bcL = spark.sparkContext.broadcast(lm)
    val bcR = spark.sparkContext.broadcast(rule)
    val out = Classification.classifyLearned(
      Extraction.matchN2n(Extraction.sentences(Seq(doc).toDS())), bcL, bcR).collect()
    assert(out.length === 1)
    assert(out(0).frame === "Being_born")
    assert(out(0).subj_chunk === "Alice Abram")
    assert(out(0).chunks.exists(c => c.fe == "time" && c.text == "27 January 1832"))
  }

  test("featurize op: stable hashed features, summarized") {
    val docs = Corpus.fixtureCorpus(spark, 20)
    val lus = Extraction.matchN2n(Extraction.sentences(docs))
    val bc = spark.sparkContext.broadcast(rule)
    val f1 = Classification.featurize(lus, bc)
      .agg(sum($"feat_sum")).collect()(0).getLong(0)
    val f2 = Classification.featurize(lus, bc)
      .agg(sum($"feat_sum")).collect()(0).getLong(0)
    assert(f1 === f2 && f1 != 0L)
  }
}
