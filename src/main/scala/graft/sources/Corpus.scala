package graft.sources

import graft.fixtures.BioGen
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Builds the canonical interleaved-documents table (BASELINE.json
  * input_hint shape) from the driver's testdata `documents.parquet`,
  * deterministically (FIXTURES.md F1): each testdata row's word-salad
  * text is chopped into text spans, deterministic biography sentences
  * with known gold answers are appended, and media spans are injected.
  *
  * Everything is a pure function of doc_id — identical output at any
  * parallelism level. Distributed via typed map (no collect).
  */
object Corpus {

  /** The interleaved documents table synthesized 1:1 from sfDir. */
  def spansTable(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("doc_id"), $"text")
      .as[(String, String)]
      .map { case (id, text) => BioGen.generate(s"doc$id", text)._1 }
  }

  /** Gold triples for the same corpus (the P/R oracle, FIXTURES.md F4). */
  def goldTriples(spark: SparkSession, sfDir: String): Dataset[Triple] = {
    import spark.implicits._
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("doc_id"), $"text")
      .as[(String, String)]
      .flatMap { case (id, t) => BioGen.generate(s"doc$id", t)._2 }
    val semi = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("doc_id"))
      .as[String]
      .flatMap(id => BioGen.semiFor(s"doc$id").map(_._2).getOrElse(Seq.empty))
    text.union(semi)
  }

  /** Semi-structured sidecar docs (FIXTURES.md F7). */
  def semiDocs(spark: SparkSession, sfDir: String): Dataset[SemiDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("doc_id"))
      .as[String]
      .flatMap(id => BioGen.semiFor(s"doc$id").map(_._1))
  }

  /** k-fold replicated spans table (deterministic doc_id suffixes) —
    * gives the two-parallelism scaling run enough per-core work that
    * fixed job overheads don't dominate (BASELINE.md protocol).
    */
  def spansTableReplicated(spark: SparkSession, sfDir: String, k: Int): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("doc_id"), $"text")
      .as[(String, String)]
      .flatMap { case (id, text) =>
        (0 until k).iterator.map(i => BioGen.generate(s"doc$id#$i", text)._1)
      }
  }

  /** Pure-fixture corpus of n docs (unit tests; no testdata read). */
  def fixtureCorpus(spark: SparkSession, n: Int): Dataset[Doc] = {
    import spark.implicits._
    spark.range(n).map(i => BioGen.generate(s"fix$i", "")._1)
  }

  def fixtureGold(spark: SparkSession, n: Int): Dataset[Triple] = {
    import spark.implicits._
    val t = spark.range(n).flatMap(i => BioGen.generate(s"fix$i", "")._2)
    val s = spark.range(n).flatMap(i => BioGen.semiFor(s"fix$i").map(_._2).getOrElse(Seq.empty))
    t.union(s)
  }

  def fixtureSemi(spark: SparkSession, n: Int): Dataset[SemiDoc] = {
    import spark.implicits._
    spark.range(n).flatMap(i => BioGen.semiFor(s"fix$i").map(_._1))
  }
}
