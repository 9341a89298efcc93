package graft

import graft.functions.{SpanFns, Text}
import graft.model._
import graft.operators.Extraction
import org.apache.spark.sql.functions._

class ExtractionSpec extends SparkSuite {
  import spark.implicits._

  private val multiLuDoc = Doc("d1", Seq(
    Span("text", "Alice Abram was born in Paris and died in Vienna in 1901 .", null, 0),
    Span("media", null, "media://img/1", 1),
    Span("text", "Alice Abram worked as a writer .", null, 2)))

  test("tokenizer + tagger basics") {
    val toks = Text.tokenizeTag("Alice Abram was born in Paris on 27 January 1832 .")
    assert(toks.map(_.pos) ===
      Seq("NNP", "NNP", "VBD", "VBN", "IN", "NNP", "IN", "CD", "NNM", "CD", "."))
    assert(toks(3).lemma === "bear")
  }

  test("chunker: entity runs, date runs, gazetteer") {
    val toks = Text.tokenizeTag("Alice Abram married Bruno Bellini in 1720 .")
    val ch = Text.chunk(toks, Set("writer").contains)
    assert(ch.map(c => (c.cls, c.text)) === Seq(
      ("entity", "Alice Abram"), ("entity", "Bruno Bellini"), ("date", "1720")))
    val ch2 = Text.chunk(Text.tokenizeTag("Rosa Conti worked as a writer ."),
      Set("writer").contains)
    assert(ch2.map(_.cls) === Seq("entity", "gazetteer"))
  }

  test("sentences: only text spans, offsets kept, sig carried") {
    val sents = Extraction.sentences(Seq(multiLuDoc).toDS()).collect()
      .sortBy(_.sentence_offset)
    assert(sents.map(_.sentence_offset).toSeq === Seq(0, 2))
    assert(sents.forall(_.spans_sig.nonEmpty))
  }

  test("n2n yields one row per (sentence, LU); 121 picks pinned LU") {
    val sents = Extraction.sentences(Seq(multiLuDoc).toDS())
    val n2n = Extraction.matchN2n(sents).collect()
    // sentence 0 matches bear AND die; sentence 2 matches work
    assert(n2n.map(l => (l.sentence_offset, l.lu)).sorted.toSeq ===
      Seq((0, "bear"), (0, "die"), (2, "work")))
    val one = Extraction.match121(sents).collect()
    // pinned: lowest lu_rank wins -> bear (rank 0) over die (rank 1)
    assert(one.map(l => (l.sentence_offset, l.lu)).sorted.toSeq ===
      Seq((0, "bear"), (2, "work")))
    // syntactic: main-verb slot = first non-auxiliary verb ("born" ->
    // bear; "worked" -> work); "died" is not in the main slot
    val syn = Extraction.matchSyntactic(sents).collect()
    assert(syn.map(l => (l.sentence_offset, l.lu)).sorted.toSeq ===
      Seq((0, "bear"), (2, "work")))
    // a sentence whose only verb is auxiliary yields no syntactic row
    val auxOnly = Extraction.sentences(Seq(Doc("d2", Seq(
      Span("text", "it was a fine morning in Paris .", null, 0)))).toDS())
    assert(Extraction.matchSyntactic(auxOnly).count() === 0)
  }

  test("n2n lemma pre-filter equals the unfiltered explode + join") {
    // the round-6 array_intersect with the plan-time LU lemma set must
    // not change the match set: compare against the unfiltered
    // reference formulation on real sf0.001 sentences
    import org.apache.spark.sql.functions.{array_distinct, broadcast, explode, expr}
    val sents = Extraction.sentences(Pipeline.docsFor(spark, "/root/testdata/sf0.001"))
    val reference = sents
      .withColumn("lemma",
        explode(array_distinct(expr("transform(tokens, t -> t.lemma)"))))
      .join(broadcast(Extraction.luDict(spark)), $"lemma" === $"lu_lemma")
      .select($"doc_id", $"sentence_offset", $"lu_lemma".as("lu"), $"frame")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    val filtered = Extraction.matchN2n(sents)
      .select($"doc_id", $"sentence_offset", $"lu", $"frame")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(filtered === reference)
    assert(filtered.nonEmpty)
  }

  test("span-sequence invariant: sig equals input for arbitrary docs") {
    val docs = graft.sources.Corpus.fixtureCorpus(spark, 80)
    val inSig = docs.toDF().select($"doc_id", SpanFns.spansSig($"spans").as("s1"))
    val sents = Extraction.sentences(docs)
    val carried = sents.select($"doc_id", $"spans_sig").distinct()
    val bad = carried.join(inSig, "doc_id")
      .filter($"spans_sig" =!= $"s1").count()
    assert(bad === 0)
    // exactly one distinct sig per doc
    assert(carried.groupBy("doc_id").count().filter($"count" > 1).count() === 0)
  }

  test("spansSig detects reorder and mutation") {
    val d = multiLuDoc
    val reordered = d.copy(spans = d.spans.reverse.zipWithIndex
      .map { case (s, i) => s.copy(offset = i) })
    val mutated = d.copy(spans = d.spans.updated(0,
      d.spans(0).copy(text = "tampered")))
    val sigs = Seq(d, reordered, mutated).zipWithIndex
      .map { case (doc, i) => doc.copy(doc_id = s"x$i") }
      .toDS().select(SpanFns.spansSig($"spans")).collect().map(_.getString(0))
    assert(sigs(0) !== sigs(1))
    assert(sigs(0) !== sigs(2))
  }
}
