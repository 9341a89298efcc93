package graft.operators

import graft.fixtures.Lexicon
import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking: broadcast alias-dictionary join + salted hash-join
  * path for skewed head entities (BASELINE.json north_star; reference:
  * public Wikidata/StrepHit strephit/commons/entity_linking.py — a
  * remote Dandelion REST call there, a local broadcast join here).
  */
object Linking {

  def aliasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Lexicon.aliasDict.toDF()
  }

  /** Flatten classified sentences into one row per mention: the subject
    * pseudo-FE plus every FE chunk (item AND time — time rows pass
    * through linking unlinked; they canonicalize via the date
    * normalizer downstream). Single pass over the classified stream.
    */
  def mentions(cls: Dataset[ClassifiedSentence]): DataFrame = {
    val spark = cls.sparkSession
    import spark.implicits._
    // prepend the subject pseudo-chunk to the chunks array instead of
    // unioning two selects — a union would duplicate the whole
    // upstream classify subtree in the physical plan (2x scans, 2x
    // mapPartitions); one explode keeps a single pass
    val subjChunk = struct(
      lit("__subj").as("fe"), lit("item").as("fe_type"),
      lit("person").as("etype"), $"subj_chunk".as("text"), lit(1.0).as("score"))
    cls.toDF()
      .select($"doc_id", $"sentence_offset", $"frame", $"lu", $"confidence",
        $"spans_sig",
        explode(concat(array(subjChunk), $"chunks")).as("c"))
      .select($"doc_id", $"sentence_offset", $"frame", $"lu", $"confidence",
        $"spans_sig", $"c.fe".as("fe"), $"c.fe_type".as("fe_type"),
        $"c.etype".as("etype"), $"c.text".as("chunk_text"))
  }

  /** Broadcast link + best-link window (max prior, tie -> min qid —
    * the pinned determinism rule, SURVEY.md §2.5 `best_link`).
    */
  def link(cls: Dataset[ClassifiedSentence]): DataFrame = {
    val spark = cls.sparkSession
    import spark.implicits._
    val m = mentions(cls)
    val a = aliasDf(spark)
    val joined = m.join(broadcast(a),
      lower(m("chunk_text")) === a("alias_norm") && m("etype") === a("etype"))
      .drop(a("etype"))
    val w = Window.partitionBy($"doc_id", $"sentence_offset", $"fe")
      .orderBy($"prior".desc, $"qid")
    joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn", "alias_norm", "is_head")
  }

  /** Same linking but through the generic salted shuffle-join path —
    * exercises Skew.saltedJoin on the pipeline's own skewed alias
    * distribution; must produce identical rows to `link`.
    */
  def linkSalted(cls: Dataset[ClassifiedSentence], salt: Int = 8): DataFrame = {
    val spark = cls.sparkSession
    import spark.implicits._
    val m = mentions(cls).withColumn("alias_key", lower($"chunk_text"))
    val a = aliasDf(spark).withColumnRenamed("etype", "a_etype")
    // hot set from dimension METADATA (the dict's curated is_head flag)
    // instead of a probe-side count pre-pass — the probe here is the
    // classified stream, and the pre-pass would re-run classification
    // once per action (round-2 VERDICT "What's wrong" #3)
    val hot = aliasDf(spark).filter($"is_head").select($"alias_norm").distinct()
    val joined = Skew.saltedJoin(m, a, Seq("alias_key"), Seq("alias_norm"), salt,
      hotKeys = Some(hot))
      .filter($"etype" === $"a_etype")
    val w = Window.partitionBy($"doc_id", $"sentence_offset", $"fe")
      .orderBy($"prior".desc, $"qid")
    joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn", "alias_norm", "alias_key", "a_etype", "is_head")
  }
}
