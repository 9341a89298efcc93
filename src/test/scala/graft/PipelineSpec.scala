package graft

import graft.model._
import graft.operators._
import graft.sources.Corpus
import org.apache.spark.sql.functions._

/** Golden end-to-end: fixture corpus -> triples vs gold (P/R gate),
  * determinism, classification + linking behavior, QS format.
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  val N = 150

  test("golden e2e: P and R == 1.0 on fixture corpus") {
    val pipe = Pipeline.fixtureTriples(spark, N)
    val gold = Corpus.fixtureGold(spark, N).toDF()
    val r = Serialize.evaluate(pipe, gold).collect()(0)
    assert(r.getAs[Double]("precision") === 1.0,
      s"precision: ${r}")
    assert(r.getAs[Double]("recall") === 1.0, s"recall: ${r}")
  }

  test("pipeline determinism: two runs produce identical triple sets") {
    def run() = Pipeline.fixtureTriples(spark, 60)
      .select($"doc_id", $"subj", $"value_key").collect()
      .map(_.toString).sorted.toSeq
    assert(run() === run())
  }

  test("classification: born sentence gets Being_born with time+place FEs") {
    val doc = Doc("c1", Seq(
      Span("text", "Alice Abram was born in Paris on 27 January 1832 .", null, 0)))
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val cls = Classification.classify(
      Extraction.matchN2n(Extraction.sentences(Seq(doc).toDS())), bc).collect()
    assert(cls.length === 1)
    val c = cls(0)
    assert(c.frame === "Being_born")
    assert(c.subj_chunk === "Alice Abram")
    assert(c.chunks.map(ch => (ch.fe, ch.text)).toSet ===
      Set(("time", "27 January 1832"), ("place", "Paris")))
    assert(c.confidence === 1.0) // all FEs filled
  }

  test("classification: missing FE lowers confidence, sentence survives") {
    val doc = Doc("c2", Seq(
      Span("text", "Alice Abram was born in 1832 .", null, 0)))
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val cls = Classification.classify(
      Extraction.matchN2n(Extraction.sentences(Seq(doc).toDS())), bc).collect()
    assert(cls.length === 1)
    assert(cls(0).chunks.map(_.fe) === Seq("time"))
    assert(cls(0).confidence < 1.0 && cls(0).confidence > 0.5)
  }

  test("linking: best-link rule = max prior then min qid; ambiguous alias") {
    // name index i where i % 7 == 3 has two person QIDs (0.9 vs 0.4)
    val name = graft.fixtures.Lexicon.nameAt(3)
    val doc = Doc("l1", Seq(
      Span("text", s"$name worked as a writer .", null, 0)))
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val cls = Classification.classify(
      Extraction.matchN2n(Extraction.sentences(Seq(doc).toDS())), bc)
    val linked = Linking.link(cls)
    val subj = linked.filter($"fe" === "__subj").select("qid").collect()
    assert(subj.map(_.getString(0)).toSeq === Seq("Q100003"))
  }

  test("salted link equals broadcast link") {
    val docs = Corpus.fixtureCorpus(spark, 60)
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val cls = Classification.classify(
      Extraction.matchN2n(Extraction.sentences(docs)), bc).cache()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"sentence_offset", $"fe", $"qid")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(Linking.link(cls)) === canon(Linking.linkSalted(cls)))
    cls.unpersist()
  }

  test("QuickStatements rendering format") {
    val doc = Doc("q1", Seq(
      Span("text", "Alice Abram was born in Paris on 27 January 1832 .", null, 0)))
    val text = Pipeline.textPath(Seq(doc).toDS())
    val qs = Serialize.quickStatements(text).collect().map(_.getString(0)).sorted
    val subjQ = graft.fixtures.Lexicon.bestLink("alice abram").qid
    val parisQ = graft.fixtures.Lexicon.bestLink("paris").qid
    assert(qs.contains(s"$subjQ\tP569\t+1832-01-27T00:00:00Z/11\tS854\t\"https://example.org/doc/q1\""))
    assert(qs.contains(s"$subjQ\tP19\t$parisQ\tS854\t\"https://example.org/doc/q1\""))
  }

  test("dedup idempotence: unionDedup twice == once") {
    val t = Pipeline.fixtureTriples(spark, 40)
    val again = Serialize.unionDedup(t.drop("value_key"), t.drop("value_key").limit(0))
    assert(again.count() === t.count())
  }

  test("quantity triples emit end-to-end and render plain in QS") {
    val doc = Doc("qty1", Seq(
      Span("text", "Alice Abram raised 4 children .", null, 0)))
    val text = Pipeline.textPath(Seq(doc).toDS())
    val rows = text.filter($"obj_kind" === "quantity")
      .select($"pred", $"obj_quantity".cast("string"), $"subj").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "P1971")
    assert(rows(0).getString(1).startsWith("4"))
    val subjQ = graft.fixtures.Lexicon.bestLink("alice abram").qid
    val qs = Serialize.quickStatements(text).collect().map(_.getString(0))
    assert(qs.contains(s"$subjQ\tP1971\t4\tS854\t\"https://example.org/doc/qty1\""))
    // fixture-wide: the gold gate covers value equality; here just presence
    val t = Pipeline.fixtureTriples(spark, N)
    assert(t.filter($"obj_kind" === "quantity").count() > 0)
  }

  test("time-range FE emits start (P580) + end (P582) statements") {
    val doc = Doc("tr1", Seq(
      Span("text", "Alice Abram resided in Paris during 1832–1901 .", null, 0)))
    val text = Pipeline.textPath(Seq(doc).toDS())
    val rows = text.select($"pred",
      graft.functions.Dates.renderTime($"obj_time").as("t"), $"obj_qid")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val parisQ = graft.fixtures.Lexicon.bestLink("paris").qid
    assert(rows === Set(
      ("P551", null, parisQ),
      ("P580", "+1832-00-00T00:00:00Z/9", null),
      ("P582", "+1901-00-00T00:00:00Z/9", null)))
  }

  test("rejected sideline: reasons for each drop class, none silent") {
    val docs = Seq(
      Doc("r1", Seq(Span("text", "The Gazette was received with praise .", null, 0))),
      Doc("r2", Seq(Span("text", "Alice Abram studied at Atlantis .", null, 0))),
      Doc("r3", Seq(Span("text", "Alice Abram died in 1234567 .", null, 0))),
      Doc("r4", Seq(Span("text", "Alice Abram worked as a writer .", null, 0)))).toDS()
    val lus = Extraction.matchN2n(Extraction.sentences(docs))
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val clsRej = Classification.rejects(lus, bc).toDF()
    val serRej = Serialize.rejectedText(Classification.classify(lus, bc))
    val all = clsRej.unionByName(serRej)
      .select($"doc_id", $"reason").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all.contains(("r1", "no_subject")))
    assert(all.contains(("r2", "missing_core_fe")))
    assert(all.contains(("r3", "bad_date")))
    assert(!all.exists(_._1 == "r4")) // clean sentence rejects nothing
  }

  test("rejected() is single-pass: committed classify table, no classify in the plan") {
    val sfDir = "/root/testdata/sf0.001"
    val df = Pipeline.rejected(spark, sfDir)
    // equality with the explicit two-pass formulation it replaced
    val docs = Pipeline.docsFor(spark, sfDir)
    val lus = Extraction.matchN2n(Extraction.sentences(docs))
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    val twoPass = Classification.rejects(lus, bc).toDF()
      .unionByName(Serialize.rejectedText(Classification.classify(lus, bc)))
      .collect().map(_.toString).sorted.toSeq
    val onePass = df.collect().map(_.toString).sorted.toSeq
    assert(onePass === twoPass)
    assert(onePass.nonEmpty)
    // the returned plan derives BOTH streams from the committed table:
    // classification already ran (once, inside runStage) — no typed
    // mapPartitions / object serialization remains anywhere in the plan
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("MapPartitions"), p)
    assert(p.contains("Scan parquet"), p)
    // repeated construction is memoized: same committed files, no new stage run
    assert(Pipeline.rejected(spark, sfDir).inputFiles.sorted.toSeq ===
      df.inputFiles.sorted.toSeq)
  }

  test("semi-structured path contributes triples for ~20% of docs") {
    val semi = Serialize.semiTriples(Corpus.fixtureSemi(spark, 200))
    val nDocs = semi.select("doc_id").distinct().count()
    assert(nDocs > 10 && nDocs < 90)
    assert(semi.filter($"pred" === "P569").count() > 0)
    assert(semi.filter($"pred" === "P106").count() > 0)
  }
}
