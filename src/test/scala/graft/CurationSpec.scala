package graft

import graft.operators.Curation

/** End-to-end curation funnel: stage monotonicity, conservation laws,
  * and layout determinism. Value-level correctness is certified by the
  * independent end-to-end DuckDB oracle (q_curation_funnel).
  */
class CurationSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def funnelMap = Curation.funnel(spark, "/root/testdata/sf0.001")
    .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap

  test("funnel stages are monotone; every stage fires at fixture scale") {
    val f = funnelMap
    assert(f.size === 8)
    assert(f("raw")._1 > 0)
    // gates only drop documents
    assert(f("raw")._1 >= f("lang_en")._1)
    assert(f("lang_en")._1 >= f("quality")._1)
    assert(f("quality")._1 >= f("decontaminated")._1)
    assert(f("decontaminated")._1 > 0, "gates killed the whole corpus")
    // the in-corpus eval docs (overlap 1.0) are provably dropped
    assert(f("decontaminated")._1 < f("quality")._1)
    // transforms keep the doc count
    assert(f("pii_scrubbed")._1 === f("decontaminated")._1)
    assert(f("span_scrubbed")._1 === f("decontaminated")._1)
    // dedup only drops; packing conserves the kept tokens exactly
    assert(f("dedup")._1 <= f("span_scrubbed")._1)
    assert(f("packed")._2 === f("dedup")._2)
    // the span scrub can only remove tokens
    assert(f("span_scrubbed")._2 <= f("pii_scrubbed")._2)
  }

  test("planted PII and boilerplate move the token counts") {
    val f = funnelMap
    // PII redaction shrinks token counts (user<id>@example.org -> email)
    assert(f("pii_scrubbed")._2 < f("decontaminated")._2)
    // the planted passage still duplicates across >= 2 surviving docs,
    // so the span stage provably removes tokens
    assert(f("span_scrubbed")._2 < f("pii_scrubbed")._2)
  }

  test("curateSpans preserves every survivor's span sequence and admits only gate-passers") {
    import graft.functions.SpanFns
    import graft.sources.Corpus
    val docs = Corpus.spansTable(spark, "/root/testdata/sf0.001")
    val out = Curation.curateSpans(docs)
    // survivors exist and media spans flow through
    assert(out.count() > 0)
    assert(out.agg(sum($"n_media")).collect()(0).getLong(0) > 0)
    // the carried spans_sig equals the INPUT table's sig for every
    // surviving doc — no span dropped, reordered, or rewritten
    val inSig = docs.toDF()
      .select($"doc_id", SpanFns.spansSig($"spans").as("in_sig"))
    val joined = out.join(inSig, Seq("doc_id"))
    assert(joined.count() === out.count(), "survivor not in the input table")
    assert(joined.filter($"spans_sig" =!= $"in_sig").count() === 0L)
    // deterministic across layouts
    val b = Curation.curateSpans(
      Corpus.spansTable(spark, "/root/testdata/sf0.001").repartition(7))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val a = out.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }

  test("funnel is identical across partition layouts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text")
    val a = Curation.funnelOver(docs.repartition(1)).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val b = Curation.funnelOver(docs.repartition(7)).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }
}
