package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Verb / lexical-unit ranking — the analytical core (BASELINE.json
  * north_star: "TF-IDF + popularity score via DataFrame aggregations").
  * Reference: public Wikidata/StrepHit
  * strephit/corpus_analysis/rank_verbs.py (gensim TfidfModel +
  * PopularityRanking). All partial+final hash aggregations; DuckDB
  * oracles exist for every op here (SparkEntry.oracleSql).
  *
  * Inputs are (doc_id, tok) term tables produced by `terms`.
  */
object Ranking {

  /** Tokenize the raw documents table into (doc_id, tok) — the same
    * rule the DuckDB oracle uses: lowercase, split on non-letters.
    */
  def terms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "")
  }

  /** Term frequency per (doc, token). */
  def tf(terms: DataFrame): DataFrame =
    terms.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  /** Document frequency + IDF per token. `n` = corpus size. */
  def dfIdf(terms: DataFrame, n: Long): DataFrame =
    terms.groupBy("tok").agg(countDistinct("doc_id").as("df"))
      .withColumn("idf", round(log(lit(n.toDouble) / col("df")), 6))

  /** avg + stddev of tf-idf per token across docs. */
  def tfidfStats(terms: DataFrame, n: Long): DataFrame = {
    val t = tf(terms)
    val d = dfIdf(terms, n).select(col("tok"), (log(lit(n.toDouble) / col("df"))).as("idf_raw"))
    t.join(d, "tok")
      .withColumn("tfidf", col("tf") * col("idf_raw"))
      .groupBy("tok")
      .agg(round(avg("tfidf"), 6).as("avg_tfidf"),
        round(coalesce(stddev_samp(col("tfidf")), lit(0.0)), 6).as("sd_tfidf"))
  }

  /** Popularity = fraction of docs containing the token. */
  def popularity(terms: DataFrame, n: Long): DataFrame =
    terms.groupBy("tok").agg(countDistinct("doc_id").as("df"))
      .withColumn("popularity", round(col("df") / lit(n.toDouble), 6))

  /** Combined LU ranking (pinned formula, SURVEY.md §2.3): harmonic
    * mean of min-max-scaled avg tf-idf and popularity; top `k`,
    * deterministic tie-break on token.
    */
  def luRank(terms: DataFrame, n: Long, k: Int): DataFrame = {
    // Single-scan shape (round-1 VERDICT perf #3): tf rows are unique
    // per (doc, tok), so df = count(*) per tok from the SAME aggregate
    // that averages tf, and avg(tf * idf) = avg(tf) * idf exactly (idf
    // is constant within the group). The old self-join recomputed the
    // scan+explode subtree ~4x; now byTok is one two-level aggregation
    // and the mm branch reuses its shuffle (ReusedExchange in the plan).
    val t = tf(terms)
    val byTok = t.groupBy("tok")
      .agg(avg("tf").as("avg_tf"), count(lit(1)).as("df"))
      .withColumn("a_raw", col("avg_tf") * log(lit(n.toDouble) / col("df")))
      .select("tok", "a_raw", "df")
    val mm = byTok.agg(min("a_raw").as("a_min"), max("a_raw").as("a_max"))
    val scored = byTok.crossJoin(broadcast(mm))
      .withColumn("a", when(col("a_max") === col("a_min"), lit(0.0))
        .otherwise((col("a_raw") - col("a_min")) / (col("a_max") - col("a_min"))))
      .withColumn("p", col("df") / lit(n.toDouble))
      .withColumn("score", // +0.0 canonicalizes IEEE -0.0 (oracle parity)
        round(when(col("a") + col("p") === 0, 0.0)
          .otherwise(lit(2.0) * col("a") * col("p") / (col("a") + col("p"))), 6) + lit(0.0))
    scored.select("tok", "score")
      .orderBy(col("score").desc, col("tok"))
      .limit(k)
  }

  /** Sentence-per-LU distribution with rollup over (lang, source) —
    * exercises grouping sets (SURVEY.md §2.3 lu_distribution).
    */
  def distribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .rollup($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .select(coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"),
        $"n_docs", $"sum_chars")
  }
}
