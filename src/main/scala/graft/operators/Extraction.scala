package graft.operators

import graft.fixtures.Lexicon
import graft.functions.{SpanFns, Text}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentence extraction (reference: public Wikidata/StrepHit
  * strephit/extraction/extract_sentences.py — strategies '121' and
  * 'n2n'). Spark-first: explode text spans with Catalyst, broadcast
  * equi-join against the LU dictionary on exploded distinct lemmas
  * (never a nested-loop arrays_overlap join), window-dedupe for 121.
  */
object Extraction {

  /** Text spans -> sentences with tokens+tags; spans_sig carried for
    * the span-sequence invariant. Tokenize/tag is a cheap pure
    * function in a typed map (the sanctioned non-SQL island).
    */
  def sentences(docs: Dataset[Doc]): Dataset[Sentence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", SpanFns.spansSig($"spans").as("spans_sig"),
        explode($"spans").as("span"))
      .filter($"span.kind" === "text" && $"span.text".isNotNull)
      .select($"doc_id", $"span.offset".as("sentence_offset"),
        $"span.text".as("text"), $"spans_sig")
      .as[(String, Int, String, String)]
      .map { case (d, o, t, sig) => Sentence(d, o, t, Text.tokenizeTag(t), sig) }
  }

  /** LU dictionary as a (tiny, broadcastable) DataFrame:
    * (lu_lemma, frame, lu_rank).
    */
  def luDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Lexicon.lexicalDb.map(e => (e.lu_lemma, e.frame)).distinct
      .map { case (l, f) => (l, f, Lexicon.luRank.getOrElse(l, 99)) }
      .toDF("lu_lemma", "frame", "lu_rank")
  }

  /** Strategy n2n: one row per (sentence, matching LU).
    *
    * The LU lemma set is known at PLAN TIME (a fixture dictionary), so
    * the explode intersects each sentence's distinct lemmas with it
    * FIRST (guide §3 — pre-filter the fan-out side): without the
    * intersect every sentence fanned out once per distinct lemma
    * (~15-20 rows, each dragging the full tokens array and text through
    * the join probe) only for the broadcast join to drop all non-LU
    * rows. Result rows are identical — explode(distinct ∩ luSet) ⋈ dict
    * ≡ explode(distinct) ⋈ dict, since the inner join on lu_lemma keeps
    * exactly the intersection; the join itself stays (a lemma can map
    * to several frames, and J1 is the broadcast equi-join operator).
    */
  def matchN2n(sents: Dataset[Sentence]): Dataset[LuSentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    val luLemmas = Lexicon.luToFrame.keySet.toSeq.sorted
    sents
      .withColumn("lemma",
        explode(array_intersect(
          array_distinct(expr("transform(tokens, t -> t.lemma)")),
          typedlit(luLemmas))))
      .join(broadcast(luDict(spark)), $"lemma" === $"lu_lemma")
      .select($"doc_id", $"sentence_offset", $"lu_lemma".as("lu"), $"frame",
        $"text", $"tokens", $"spans_sig")
      .as[LuSentence]
  }

  /** Strategy syntactic (third public-StrepHit strategy; there a
    * dependency-parse test that the LU governs the sentence). With no
    * parser in this sandbox the pinned rule is: the LU must fill the
    * sentence's MAIN-VERB slot, approximated as the FIRST non-auxiliary
    * verb token (lemma != 'be'). Pure Catalyst: a higher-order filter
    * over the tokens array picks the candidate lemma — no explode at
    * all, so this is the cheapest strategy (≤1 row per sentence, one
    * broadcast join).
    */
  def matchSyntactic(sents: Dataset[Sentence]): Dataset[LuSentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents
      .withColumn("lemma",
        // get() tolerates the empty-array case (ANSI mode) -> null lemma
        expr("get(filter(tokens, t -> t.pos like 'V%' and t.lemma <> 'be'), 0).lemma"))
      .join(broadcast(luDict(spark)), $"lemma" === $"lu_lemma")
      .select($"doc_id", $"sentence_offset", $"lu_lemma".as("lu"), $"frame",
        $"text", $"tokens", $"spans_sig")
      .as[LuSentence]
  }

  /** Strategy 121: at most one LU per sentence — lowest lu_rank, then
    * lexicographic lemma (pinned determinism, SURVEY.md §7).
    */
  def match121(sents: Dataset[Sentence]): Dataset[LuSentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"doc_id", $"sentence_offset")
      .orderBy($"lu_rank", $"lu")
    matchN2n(sents)
      .join(broadcast(luDict(spark).select($"lu_lemma".as("lu"), $"lu_rank")), "lu")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn", "lu_rank")
      .as[LuSentence]
  }
}
