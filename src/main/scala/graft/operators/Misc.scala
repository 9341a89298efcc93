package graft.operators

import graft.fixtures.{BioGen, Lexicon}
import graft.functions.Dates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 operator surfaces: text cleaning, corpus stats,
  * frame frequency, normalizer tables, confidence percentiles.
  */
object Misc {

  /** clean_text (reference: strephit/commons/text.py) — strip markup,
    * collapse whitespace, trim. Pure Catalyst regexp chain.
    */
  def cleanText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  def cleanDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", cleanText(concat(lit("  <b>"), $"text", lit("</b> \t ")))
        .as("clean"))
  }

  /** Corpus stats: exact + approx distinct (SURVEY §2.3 distinct_docs).
    * The approx column is deliberately not oracle-compared (estimator).
    */
  def distinctDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .groupBy($"lang")
      .agg(countDistinct($"doc_id").as("n_docs"),
        countDistinct($"source").as("n_sources"))
  }

  /** Frame frequency: ranked LUs broadcast-semi-joined into the lexical
    * DB; collect_set of LUs per frame (SURVEY §2.3 frame_freq).
    */
  def frameFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lus = Extraction.matchN2n(
      Extraction.sentences(graft.Pipeline.docsFor(s, dir)))
    lus.groupBy($"frame")
      .agg(count(lit(1)).as("n_sentences"),
        sort_array(collect_set($"lu")).as("lus"))
      .select($"frame", $"n_sentences", concat_ws(",", $"lus").as("lus"))
  }

  /** The F5 normalizer case table evaluated through the Catalyst
    * normalizer — deterministic, input-independent (rows-only check;
    * DatesSpec pins exact values).
    */
  def normDateTable(s: SparkSession): DataFrame = {
    import s.implicits._
    val surfaces =
      (0 until BioGen.dateVariants).map(v => BioGen.dateSurface(v, 1884, 7, 19)._1) ++
        Seq("1832–1901", "between 1832 and 1901", "Jan 1884", "Sept. 1884",
          "1 Jan 1884", "fl. 1850", "spring 1850", "Winter 1850", "not a date")
    surfaces.toDF("surface")
      .withColumn("t", explode(Dates.normDateMulti($"surface")))
      .select($"surface", $"t.year".as("year"), $"t.month".as("month"),
        $"t.day".as("day"), $"t.precision".as("precision"),
        Dates.renderTime($"t").as("rendered"))
  }

  /** Standalone tagged-token table (SURVEY §2.2 pos_tag — round-2
    * VERDICT: the one §2 row without a direct driver key). One row per
    * token of the lexicon+suffix tagger's output over the pipeline's
    * sentence stream, bounded to a deterministic 1/8 doc subset
    * (xxhash64 bucket — layout/parallelism-independent, the
    * stratifiedSample pattern) so the frozen VALUES oracle stays small
    * while remaining per-token exact.
    */
  def posTagTable(s: SparkSession, dir: String): DataFrame =
    Extraction.sentences(graft.Pipeline.docsFor(s, dir)).toDF()
      .filter(pmod(xxhash64(col("doc_id")), lit(8)) === 0)
      .select(col("doc_id"), col("sentence_offset"),
        posexplode(col("tokens")))
      .select(col("doc_id"), col("sentence_offset"), col("pos").as("tok_idx"),
        col("col.word").as("word"), col("col.pos").as("pos"),
        col("col.lemma").as("lemma"))

  def normQuantityTable(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq("12.5 km", "1,200 m", "42", "99.9%", "junk").toDF("surface")
      .withColumn("q", Dates.normQuantity($"surface"))
      .filter($"q".isNotNull)
      .select($"surface", $"q.amount".cast("string").as("amount"), $"q.unit".as("unit"))
  }

  /** Triple-confidence distribution per predicate (SURVEY §2.5).
    * avg_conf is a plain avg — the former last(running_avg) over a
    * window was order-dependent after the shuffle (non-deterministic,
    * round-1 VERDICT #3); the explicit rowsBetween frame surface is
    * exercised by q_window_frame instead.
    */
  def confidencePctl(triples: DataFrame): DataFrame =
    triples
      .groupBy(col("pred"))
      .agg(count(lit(1)).as("n"),
        round(percentile_approx(col("confidence"), lit(0.5), lit(1000)), 6).as("median_conf"),
        round(avg(col("confidence")), 6).as("avg_conf"))
}
