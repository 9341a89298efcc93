package graft.operators

import graft.fixtures.Lexicon
import graft.functions.{Dates, SpanFns}
import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statement assembly + QuickStatements serialization (reference:
  * public Wikidata/StrepHit strephit/commons/serialize.py and
  * strephit/extraction/process_semistructured.py). All Catalyst —
  * broadcast joins against the tiny lexical/alias dictionaries, one
  * co-partitioned join to attach subjects, distinct-aggregate dedup.
  */
object Serialize {

  def lexDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Lexicon.lexicalDb.toDF()
  }

  private val nullTime: Column =
    lit(null).cast("struct<year:int,month:int,day:int,precision:int>")
  private val nullDec: Column = lit(null).cast("decimal(38,10)")

  /** Canonical value key of a triple (used for dedup + eval joins;
    * avoids null-key join pitfalls on obj columns).
    */
  def valueKey(df: DataFrame): Column =
    concat_ws("|", df("pred"), df("obj_kind"),
      coalesce(df("obj_qid"), lit("")),
      coalesce(Dates.renderTime(df("obj_time")), lit("")),
      coalesce(df("obj_quantity").cast("string"), lit("")),
      when(df("obj_kind") === "item" || df("obj_kind") === "time", lit(""))
        .otherwise(coalesce(df("obj_text"), lit(""))))

  /** Text-path triples from classified+linked sentences. */
  def textTriples(cls: Dataset[ClassifiedSentence], linked: DataFrame): DataFrame = {
    val spark = cls.sparkSession
    import spark.implicits._
    val subjects = linked.filter($"fe" === "__subj")
      .select($"doc_id", $"sentence_offset", $"qid".as("subj"))
    val lex = broadcast(lexDf(spark)
      .select($"frame", $"fe", $"wikidata_property".as("pred")))

    val items = linked.filter($"fe" =!= "__subj")
      .join(lex, Seq("frame", "fe"))
      .select($"doc_id", $"sentence_offset", $"pred",
        lit("item").as("obj_kind"), $"qid".as("obj_qid"),
        nullTime.as("obj_time"), nullDec.as("obj_quantity"),
        $"chunk_text".as("obj_text"), $"confidence", $"spans_sig")

    val lexT = broadcast(lexDf(spark)
      .select($"frame".as("l_frame"), $"fe".as("l_fe"),
        $"wikidata_property".as("pred")))
    val times = cls.toDF()
      .select($"doc_id", $"sentence_offset", $"frame", $"confidence",
        $"spans_sig", explode($"chunks").as("c"))
      .filter($"c.fe_type" === "time")
      .withColumn("obj_time", Dates.normDate($"c.text"))
      .filter($"obj_time".isNotNull)
      .join(lexT, $"frame" === $"l_frame" && $"c.fe" === $"l_fe")
      .select($"doc_id", $"sentence_offset", $"pred",
        lit("time").as("obj_kind"), lit(null).cast("string").as("obj_qid"),
        $"obj_time", nullDec.as("obj_quantity"),
        $"c.text".as("obj_text"), $"confidence", $"spans_sig")

    items.unionByName(times)
      .join(subjects, Seq("doc_id", "sentence_offset"))
      .withColumn("source_url", concat(lit("https://example.org/doc/"), $"doc_id"))
  }

  /** Semi-structured path (FIXTURES.md F7): `other` map -> triples. */
  def semiTriples(semi: Dataset[SemiDoc]): DataFrame = {
    val spark = semi.sparkSession
    import spark.implicits._
    val aliases = Linking.aliasDf(spark)

    val base = semi.toDF()
      .select($"doc_id",
        element_at($"other", "name").as("name"),
        element_at($"other", "born").as("born"),
        element_at($"other", "occupation").as("occ"))

    def bestLinked(df: DataFrame, key: Column, etype: String, out: String): DataFrame = {
      val j = df.join(broadcast(aliases.filter($"etype" === etype)),
        lower(key) === $"alias_norm")
      val w = Window.partitionBy(df.columns.map(df(_)).toSeq: _*)
        .orderBy($"prior".desc, $"qid")
      j.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .withColumnRenamed("qid", out)
        .drop("rn", "alias_norm", "prior", "is_head", "etype")
    }

    val withSubj = bestLinked(base, $"name", "person", "subj")

    val bornT = withSubj.filter($"born".isNotNull)
      .withColumn("obj_time", Dates.normDate($"born"))
      .filter($"obj_time".isNotNull)
      .select($"doc_id", lit(-1).as("sentence_offset"), lit("P569").as("pred"),
        lit("time").as("obj_kind"), lit(null).cast("string").as("obj_qid"),
        $"obj_time", nullDec.as("obj_quantity"), $"born".as("obj_text"),
        lit(1.0).as("confidence"), lit(null).cast("string").as("spans_sig"),
        $"subj")

    val occT = bestLinked(withSubj.filter($"occ".isNotNull), $"occ", "occupation", "obj_qid")
      .select($"doc_id", lit(-1).as("sentence_offset"), lit("P106").as("pred"),
        lit("item").as("obj_kind"), $"obj_qid", nullTime.as("obj_time"),
        nullDec.as("obj_quantity"), $"occ".as("obj_text"),
        lit(1.0).as("confidence"), lit(null).cast("string").as("spans_sig"),
        $"subj")

    bornT.unionByName(occT)
      .withColumn("source_url", concat(lit("https://example.org/doc/"), $"doc_id"))
  }

  /** Union both paths and drop duplicate statements (reference:
    * duplicate-claim suppression before QuickStatements upload).
    */
  def unionDedup(text: DataFrame, semi: DataFrame): DataFrame = {
    val all = text.unionByName(semi)
    val keyed = all.withColumn("value_key", valueKey(all))
    val w = Window.partitionBy(col("doc_id"), col("subj"), col("value_key"))
      .orderBy(col("sentence_offset"))
    keyed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
  }

  /** QuickStatements rendering: `Qsubj \t Pprop \t value \t S854 \t "url"`. */
  def quickStatements(triples: DataFrame): DataFrame = {
    val value = when(col("obj_kind") === "item", col("obj_qid"))
      .when(col("obj_kind") === "time", Dates.renderTime(col("obj_time")))
      .when(col("obj_kind") === "quantity", col("obj_quantity").cast("string"))
      .otherwise(concat(lit("\""), col("obj_text"), lit("\"")))
    triples.select(concat_ws("\t",
      col("subj"), col("pred"), value,
      lit("S854"), concat(lit("\""), col("source_url"), lit("\""))).as("qs"))
  }

  /** P/R evaluation vs gold (SURVEY.md §2.4 J7): inner join on the
    * statement key for TP; anti-joins both ways for FP/FN.
    */
  def evaluate(pipe: DataFrame, gold: DataFrame): DataFrame = {
    val spark = pipe.sparkSession
    import spark.implicits._
    def keyed(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("subj"),
        valueKey(df).as("value_key")).distinct()
    // single full-outer pass: one shuffle, one job (not 3 anti-join jobs)
    val p = keyed(pipe).withColumn("in_p", lit(1))
    val g = keyed(gold).withColumn("in_g", lit(1))
    p.join(g, Seq("doc_id", "subj", "value_key"), "full_outer")
      .agg(
        sum(when($"in_p".isNotNull && $"in_g".isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when($"in_p".isNotNull && $"in_g".isNull, 1L).otherwise(0L)).as("fp"),
        sum(when($"in_p".isNull && $"in_g".isNotNull, 1L).otherwise(0L)).as("fn"))
      .select($"tp", $"fp", $"fn",
        when($"tp" + $"fp" === 0, 0.0)
          .otherwise($"tp" / ($"tp" + $"fp")).as("precision"),
        when($"tp" + $"fn" === 0, 0.0)
          .otherwise($"tp" / ($"tp" + $"fn")).as("recall"))
  }

  /** Span-sequence invariant check (BASELINE.json input_hint): for every
    * doc that survived to the output, its carried spans_sig must equal
    * the input doc's signature. Returns (doc_id, sig_ok).
    */
  def spanInvariant(docs: Dataset[Doc], triples: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val inSig = docs.toDF().select($"doc_id", SpanFns.spansSig($"spans").as("in_sig"))
    val outSig = triples.filter($"spans_sig".isNotNull)
      .select($"doc_id", $"spans_sig").distinct()
    outSig.join(inSig, Seq("doc_id"))
      .select($"doc_id", ($"spans_sig" === $"in_sig").as("sig_ok"))
  }
}
