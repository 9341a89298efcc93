package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full KG-construction pipeline on sf0.001 -> triples. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001")

  private def docsN(s: SparkSession, dir: String): Long =
    s.read.parquet(s"$dir/documents.parquet").count()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregations / ranking (SURVEY §2.3) ----
    "q_tf" -> ((s, dir) => Ranking.tf(Ranking.terms(s, dir))),
    "q_df_idf" -> ((s, dir) => Ranking.dfIdf(Ranking.terms(s, dir), docsN(s, dir))),
    "q_tfidf_stats" -> ((s, dir) => Ranking.tfidfStats(Ranking.terms(s, dir), docsN(s, dir))),
    "q_popularity" -> ((s, dir) => Ranking.popularity(Ranking.terms(s, dir), docsN(s, dir))),
    "q_lu_rank" -> ((s, dir) => Ranking.luRank(Ranking.terms(s, dir), docsN(s, dir), 50)),
    "q_lu_distribution" -> ((s, dir) => Ranking.distribution(s, dir)),
    // ---- pipeline (rows-only; golden-fixture specs are the oracle) ----
    "pipe_triples" -> ((s, dir) => Pipeline.triples(s, dir)),
    "pipe_eval" -> ((s, dir) => Pipeline.evaluate(s, dir))
  )

  /** DuckDB-equivalent SQL per SQL-expressible query key. */
  def oracleSql: Map[String, String] = Map(
    "q_tf" ->
      """SELECT doc_id, tok, count(*) AS tf
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY doc_id, tok""",
    "q_df_idf" ->
      """SELECT tok, count(DISTINCT doc_id) AS df,
                round(ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)), 6) AS idf
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY tok""",
    "q_tfidf_stats" ->
      """WITH terms AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents),
         t AS (SELECT doc_id, tok, count(*) AS tf FROM terms WHERE tok <> '' GROUP BY doc_id, tok),
         d AS (SELECT tok, ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id)) AS idf_raw
               FROM terms WHERE tok <> '' GROUP BY tok)
         SELECT t.tok, round(avg(t.tf * d.idf_raw), 6) AS avg_tfidf,
                round(coalesce(stddev_samp(t.tf * d.idf_raw), 0.0), 6) AS sd_tfidf
         FROM t JOIN d ON t.tok = d.tok GROUP BY t.tok""",
    "q_popularity" ->
      """SELECT tok, count(DISTINCT doc_id) AS df,
                round(count(DISTINCT doc_id)::DOUBLE / (SELECT count(*) FROM documents), 6) AS popularity
         FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY tok""",
    "q_lu_rank" ->
      """WITH terms AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS tok FROM documents),
         t AS (SELECT doc_id, tok, count(*) AS tf FROM terms WHERE tok <> '' GROUP BY doc_id, tok),
         d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM terms WHERE tok <> '' GROUP BY tok),
         n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         bytok AS (
           SELECT t.tok, avg(t.tf * ln(n.n / d.df)) AS a_raw, first(d.df) AS df
           FROM t JOIN d ON t.tok = d.tok CROSS JOIN n GROUP BY t.tok),
         mm AS (SELECT min(a_raw) AS a_min, max(a_raw) AS a_max FROM bytok),
         scored AS (
           SELECT tok,
             CASE WHEN mm.a_max = mm.a_min THEN 0.0
                  ELSE (a_raw - mm.a_min) / (mm.a_max - mm.a_min) END AS a,
             df / (SELECT n FROM n) AS p
           FROM bytok CROSS JOIN mm)
         SELECT tok, round(CASE WHEN a + p = 0 THEN 0.0 ELSE 2.0 * a * p / (a + p) END, 6) + 0.0 AS score
         FROM scored ORDER BY score DESC, tok LIMIT 50""",
    "q_lu_distribution" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
                count(*) AS n_docs, sum(n_chars) AS sum_chars
         FROM documents GROUP BY ROLLUP(lang, source)"""
  )
}
