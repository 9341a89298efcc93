package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  * All pure Catalyst (codegen'd) — no UDFs in the hot path.
  */
object TextAnalysis {

  /** Tiny per-language stopword sets for the n-gram/stopword-hit
    * language-ID heuristic.
    */
  val langStops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "that", "it", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auch"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "los", "las", "es", "en", "por", "que", "una", "con", "para"),
    "it" -> Seq("il", "gli", "che", "per", "con", "una", "sono", "della", "questo", "anche"))

  private def toks(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => t =!= "")

  /** Stopword-hit score for one language over a token array. */
  private def hits(tokens: Column, lang: String): Column =
    size(filter(tokens, t => array_contains(typedlit(langStops(lang)), t)))

  /** Heuristic language ID: argmax stopword hits; tie/zero -> 'und'.
    * Deterministic tie-break: language order en,de,fr,es,it.
    */
  def langId(text: Column): Column = {
    val tokens = toks(text)
    val order = Seq("en", "de", "fr", "es", "it")
    val scores = order.map(l => hits(tokens, l))
    val best = greatest(scores: _*)
    // left-priority argmax: first language (in `order`) reaching `best` wins
    order.zip(scores).reverse.foldLeft(lit("und"): Column) {
      case (acc, (l, s)) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality-score columns (length / punctuation / stopword ratios) —
    * the classic pre-training quality filters.
    */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tokens = toks($"text")
    val nTok = size(tokens)
    docs.select(
      $"doc_id",
      length($"text").as("len_chars"),
      nTok.as("n_tokens"),
      round(
        when(nTok === 0, 0.0)
          .otherwise(aggregate(tokens, lit(0L), (acc, t) => acc + length(t))
            .cast("double") / nTok), 6).as("avg_tok_len"),
      round(
        when(nTok === 0, 0.0)
          .otherwise(size(filter(tokens,
            t => array_contains(typedlit(Seq("the", "a", "of", "and", "in")), t)))
            .cast("double") / nTok), 6).as("stopword_ratio"))
  }

  /** Gopher-style REPETITION signals (pure Catalyst, codegen'd) — the
    * duplicate-content quality rules a pre-training pipeline applies
    * alongside the length/stopword filters above: heavily repetitive
    * documents (boilerplate, keyword stuffing, decode loops) carry a
    * high duplicate-n-gram fraction long before exact/near dedup sees
    * them. Per doc: duplicate token fraction, duplicate trigram
    * fraction, and the alphabetic character ratio. All three are
    * re-derived independently in DuckDB list SQL (hand-written oracle).
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tokens = toks($"text")
    val nTok = size(tokens)
    // 1-based trigram windows; sequence() DESCENDS when stop < start,
    // so short docs must short-circuit to an empty array
    val trigrams = when(nTok >= 3,
      transform(sequence(lit(1), nTok - 2), i =>
        concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1),
          element_at(tokens, i + 2))))
      .otherwise(array().cast("array<string>"))
    docs.select($"doc_id", nTok.as("n_tokens"), tokens.as("toks"),
        trigrams.as("tris"),
        round(when(length($"text") === 0, 0.0)
          .otherwise(length(regexp_replace($"text", "[^A-Za-z]", ""))
            .cast("double") / length($"text")), 6).as("alpha_ratio"))
      .select($"doc_id", $"n_tokens",
        round(when($"n_tokens" === 0, 0.0)
          .otherwise(lit(1.0) - size(array_distinct($"toks")).cast("double") / $"n_tokens"),
          6).as("dup_token_frac"),
        round(when(size($"tris") === 0, 0.0)
          .otherwise(lit(1.0) - size(array_distinct($"tris")).cast("double") / size($"tris")),
          6).as("dup_trigram_frac"),
        $"alpha_ratio")
  }

  /** Token counts: whitespace tokens + a BPE-ish regex piece count. */
  /** Reproducible stratified corpus sampling WITHOUT rand(): a row is
    * kept iff pmod(xxhash64(doc_id, salt), 10000) < rate(lang)·10000.
    * Spark's sample()/sampleBy() draw Bernoulli variates from
    * rand(seed), whose stream depends on partition layout — resample a
    * 100 TB corpus after a repartition and you get a different subset.
    * Here the keep decision is a pure function of the row: identical
    * at any parallelism, resumable mid-job, auditable after the fact,
    * and pushdown-friendly (a deterministic filter over the scan).
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       salt: Int = 42): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs.filter(pmod(xxhash64(col("doc_id"), lit(salt)), lit(10000)) < rate * 10000)
  }

  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        size(toks($"text")).as("n_tokens"),
        regexp_count($"text", lit("[a-z]+|[0-9]+")).as("n_pieces"))
  }

  /** Content fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        md5(to_binary(regexp_replace(lower($"text"), "\\s+", " "), lit("utf-8")))
          .as("fp"))
  }

  /** Rolling-hash fingerprint via the native codegen'd Catalyst
    * expression (graft.functions.RollingHash) — the Karp-Rabin
    * document-fingerprinting primitive.
    */
  def rollingFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        graft.functions.RollingHash.rolling_hash64(
          regexp_replace(lower($"text"), "\\s+", " ")).as("rfp"))
  }

  /** Language-ID over the documents table (rows-only check; the
    * multilingual behavior is pinned by LangIdSpec).
    */
  def langIdTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang".as("lang_meta"), langId($"text").as("lang_pred"))
  }
}
