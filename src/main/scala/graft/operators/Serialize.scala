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
    * avoids null-key join pitfalls on obj columns). obj_quantity is
    * normalized to decimal(38,10) before stringifying: the gold
    * fixture's Option[BigDecimal] encodes as decimal(38,18), the
    * pipeline emits decimal(38,10) — without the cast the key strings
    * diverge on scale ("4.0000000000" vs "4.000000000000000000").
    */
  def valueKey(df: DataFrame): Column =
    concat_ws("|", df("pred"), df("obj_kind"),
      coalesce(df("obj_qid"), lit("")),
      coalesce(Dates.renderTime(df("obj_time")), lit("")),
      coalesce(df("obj_quantity").cast("decimal(38,10)").cast("string"), lit("")),
      when(df("obj_kind") === "item" || df("obj_kind") === "time", lit(""))
        .otherwise(coalesce(df("obj_text"), lit(""))))

  /** Linked + canonicalized candidate statements BEFORE the keep/reject
    * split — the shared subtree of textTriples and rejectedText.
    * Carries `keep` (statement survives) and `reject_reason`.
    */
  private def linkedStatements(cls: Dataset[ClassifiedSentence]): DataFrame = {
    val spark = cls.sparkSession
    import spark.implicits._
    val m = Linking.mentions(cls)
    val a = Linking.aliasDf(spark).withColumnRenamed("etype", "a_etype")

    val joined = m.join(broadcast(a),
      lower(m("chunk_text")) === a("alias_norm") && m("etype") === $"a_etype",
      "left")

    // best link per (doc, sentence, fe): max prior, tie -> min qid;
    // unlinked rows (time/quantity FEs) sort to the back with sentinel
    // 2.0. NOTE: min_by(struct, struct) compiles to SortAggregate
    // (partial+final) — DeclarativeAggregate with a var-length buffer
    // cannot use hash aggregation; the partial agg still collapses each
    // group to one row before the exchange, so the shuffle is narrow.
    // The ordering key is unique per group (distinct qids), so ties
    // cannot occur.
    // ONE exchange for the best-link agg AND the subject window (round
    // 6, guide §2.4): hash partitioning by (doc_id, sentence_offset)
    // satisfies the aggregation's (doc_id, sentence_offset, fe)
    // clustering (subset rule) and the window's partition spec, so the
    // explicit repartition replaces BOTH the agg's ENSURE_REQUIREMENTS
    // exchange on the 3-column key and the window's re-shuffle on the
    // 2-column key that followed it.
    val best = joined
      .repartition($"doc_id", $"sentence_offset")
      .groupBy($"doc_id", $"sentence_offset", $"fe")
      .agg(min_by(
        struct($"qid", $"chunk_text", $"fe_type", $"frame", $"lu",
          $"confidence", $"spans_sig"),
        struct(coalesce(-$"prior", lit(2.0)).as("np"),
          coalesce($"qid", lit("~")).as("qid_ord"))).as("b"))
      .select($"doc_id", $"sentence_offset", $"fe",
        $"b.qid".as("qid"), $"b.chunk_text".as("chunk_text"),
        $"b.fe_type".as("fe_type"), $"b.frame".as("frame"), $"b.lu".as("lu"),
        $"b.confidence".as("confidence"), $"b.spans_sig".as("spans_sig"))

    // attach the sentence subject via a window — no self-join
    val w = Window.partitionBy($"doc_id", $"sentence_offset")
    val withSubj = best
      .withColumn("subj", max(when($"fe" === "__subj", $"qid")).over(w))
      .filter($"fe" =!= "__subj")

    val lex = broadcast(lexDf(spark)
      .select($"frame", $"fe", $"wikidata_property".as("pred")))

    val isTimeKind = $"fe_type" === "time" || $"fe_type" === "timerange"

    // ONE explode covers single dates AND ranges: every row carries an
    // array of (pred, time) candidates — 1 element for plain FEs, 2 for
    // a range-valued time FE (start P580 / end P582 via normDateMulti;
    // zip_with pads an unparseable range with null times, which reject
    // as bad_date downstream). Non-time rows get a 1-element null-time
    // candidate, so row counts are unchanged for them — no union, the
    // upstream subtree stays single-pass.
    withSubj
      .join(lex, Seq("frame", "fe"))
      .withColumn("tcand",
        when($"fe_type" === "time",
          array(struct($"pred".as("pred2"), Dates.normDate($"chunk_text").as("t"))))
          .when($"fe_type" === "timerange",
            zip_with(Dates.normDateMulti($"chunk_text"),
              array(lit("P580"), lit("P582")),
              (t, p) => struct(p.as("pred2"), t.as("t"))))
          .otherwise(array(struct($"pred".as("pred2"), nullTime.as("t")))))
      .withColumn("tc", explode($"tcand"))
      .withColumn("pred", coalesce($"tc.pred2", $"pred"))
      .withColumn("obj_time", $"tc.t")
      .drop("tcand", "tc")
      .withColumn("obj_quantity",
        when($"fe_type" === "quantity",
          Dates.normQuantity($"chunk_text").getField("amount").cast("decimal(38,10)"))
          .otherwise(nullDec))
      .withColumn("keep", $"subj".isNotNull &&
        ((isTimeKind && $"obj_time".isNotNull) ||
         ($"fe_type" === "item" && $"qid".isNotNull) ||
         ($"fe_type" === "quantity" && $"obj_quantity".isNotNull)))
      .withColumn("reject_reason",
        when($"subj".isNull, "unlinked_subject")
          .when(isTimeKind && $"obj_time".isNull, "bad_date")
          .when($"fe_type" === "quantity" && $"obj_quantity".isNull, "bad_quantity")
          .when($"fe_type" === "item" && $"qid".isNull, "unlinked_item"))
  }

  /** Text-path triples from classified sentences — SINGLE PASS.
    *
    * Scale rationale (BASELINE.md plan-inspection rule): the naive
    * shape joins a subjects subtree against an items subtree, which
    * recomputes the whole extract+classify+link pipeline per branch
    * (2-4 parquet scans, 2-4 classification passes). Instead:
    *   1. mentions (subject pseudo-FE + item/time/quantity FEs) flow
    *      once through one LEFT broadcast alias join,
    *   2. best-link = min_by aggregation (partial+final, one shuffle,
    *      pinned tie-break),
    *   3. the subject attaches via a window over (doc_id,
    *      sentence_offset) — no self-join, no recompute,
    *   4. dates/quantities canonicalize inline; the lexical property
    *      map is a broadcast join.
    * One scan, one classification pass, two narrow shuffles.
    */
  def textTriples(cls: Dataset[ClassifiedSentence]): DataFrame = {
    import cls.sparkSession.implicits._
    linkedStatements(cls)
      .filter($"keep")
      .select($"doc_id", $"sentence_offset", $"pred",
        when($"fe_type" === "time" || $"fe_type" === "timerange", "time")
          .when($"fe_type" === "quantity", "quantity")
          .otherwise("item").as("obj_kind"),
        when($"fe_type" === "item", $"qid").otherwise(lit(null).cast("string")).as("obj_qid"),
        $"obj_time", $"obj_quantity",
        $"chunk_text".as("obj_text"), $"confidence", $"spans_sig", $"subj")
      .withColumn("source_url", concat(lit("https://example.org/doc/"), $"doc_id"))
  }

  /** Serializer-stage rejected-items sideline (SURVEY §2.4 J5): the
    * complementary filter of textTriples — statements whose value
    * failed canonicalization or linking, with the reason.
    */
  def rejectedText(cls: Dataset[ClassifiedSentence]): DataFrame = {
    import cls.sparkSession.implicits._
    linkedStatements(cls)
      .filter(!$"keep")
      .select($"doc_id", $"sentence_offset", $"lu", $"frame",
        $"reject_reason".as("reason"))
  }

  /** Semi-structured path (FIXTURES.md F7): `other` map -> triples.
    * Single pass: subject links via a broadcast join + struct-min
    * best-link agg; the (born, occupation) candidate values explode
    * from one array — no union of branches (which would duplicate the
    * scan subtree in the physical plan).
    */
  def semiTriples(semi: Dataset[SemiDoc]): DataFrame = {
    val spark = semi.sparkSession
    import spark.implicits._
    val aliases = Linking.aliasDf(spark)

    val base = semi.toDF()
      .select($"doc_id",
        element_at($"other", "name").as("name"),
        element_at($"other", "born").as("born"),
        element_at($"other", "occupation").as("occ"))

    // subject: broadcast person-alias join, best link via struct-min agg
    val withSubj = base
      .join(broadcast(aliases.filter($"etype" === "person")
        .select($"alias_norm", $"qid", $"prior")),
        lower($"name") === $"alias_norm")
      .groupBy($"doc_id")
      .agg(min_by(struct($"qid", $"born", $"occ"),
        struct((-$"prior").as("np"), $"qid")).as("b"))
      .select($"doc_id", $"b.qid".as("subj"), $"b.born".as("born"), $"b.occ".as("occ"))

    val cands = withSubj.select($"doc_id", $"subj",
      explode(array(
        struct(lit("P569").as("pred"), lit("time").as("obj_kind"), $"born".as("value")),
        struct(lit("P106").as("pred"), lit("item").as("obj_kind"), $"occ".as("value"))))
        .as("c"))
      .select($"doc_id", $"subj", $"c.pred".as("pred"),
        $"c.obj_kind".as("obj_kind"), $"c.value".as("value"))
      .filter($"value".isNotNull)

    val linked = cands
      .join(broadcast(aliases.filter($"etype" === "occupation")
        .select($"alias_norm", $"qid", $"prior")),
        $"obj_kind" === "item" && lower($"value") === $"alias_norm", "left")
      .groupBy($"doc_id", $"subj", $"pred", $"obj_kind", $"value")
      .agg(min_by($"qid",
        struct(coalesce(-$"prior", lit(2.0)).as("np"),
          coalesce($"qid", lit("~")).as("qid_ord"))).as("obj_qid"))

    linked
      .withColumn("obj_time",
        when($"obj_kind" === "time", Dates.normDate($"value")).otherwise(nullTime))
      .filter(($"obj_kind" === "time" && $"obj_time".isNotNull) ||
        ($"obj_kind" === "item" && $"obj_qid".isNotNull))
      .select($"doc_id", lit(-1).as("sentence_offset"), $"pred", $"obj_kind",
        when($"obj_kind" === "item", $"obj_qid").otherwise(lit(null).cast("string")).as("obj_qid"),
        $"obj_time", nullDec.as("obj_quantity"), $"value".as("obj_text"),
        lit(1.0).as("confidence"), lit(null).cast("string").as("spans_sig"),
        $"subj")
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

  /** Global statement dedup (SURVEY §2.6 dedup_triples): ONE row per
    * distinct claim (subj, pred, value) across the whole corpus — the
    * QuickStatements-upload view, where a claim stated by many
    * documents must upload once. Keeps the lowest (doc_id,
    * sentence_offset) as the canonical reference and counts sources.
    * The flagship table keeps per-document rows (unionDedup) because
    * provenance is a feature there; this is the collapse on top.
    */
  def dedupStatements(triples: DataFrame): DataFrame = {
    val keyed =
      if (triples.columns.contains("value_key")) triples
      else triples.withColumn("value_key", valueKey(triples))
    keyed
      .groupBy(col("subj"), col("pred"), col("value_key"))
      .agg(
        min_by(struct(col("doc_id"), col("sentence_offset"), col("source_url")),
          struct(col("doc_id"), col("sentence_offset"))).as("ref"),
        countDistinct(col("doc_id")).as("n_source_docs"))
      .select(col("subj"), col("pred"), col("value_key"),
        col("ref.doc_id").as("doc_id"),
        col("ref.source_url").as("source_url"),
        col("n_source_docs"))
  }

  /** QuickStatements rendering: `Qsubj \t Pprop \t value \t S854 \t "url"`.
    * Quantity amounts render without trailing zeros ("4", "12.5").
    */
  def quickStatements(triples: DataFrame): DataFrame =
    triples.select(concat_ws("\t",
      col("subj"), col("pred"), qsValue,
      lit("S854"), concat(lit("\""), col("source_url"), lit("\""))).as("qs"))

  private def qsValue: Column = {
    val qty = regexp_replace(regexp_replace(
      col("obj_quantity").cast("decimal(38,10)").cast("string"),
      "0+$", ""), "\\.$", "")
    when(col("obj_kind") === "item", col("obj_qid"))
      .when(col("obj_kind") === "time", Dates.renderTime(col("obj_time")))
      .when(col("obj_kind") === "quantity", qty)
      .otherwise(concat(lit("\""), col("obj_text"), lit("\"")))
  }

  /** MEDIA PROVENANCE (the input_hint's interleaved-media axis, SURVEY
    * §1.2): per text span, the `media_ref` of the nearest PRECEDING
    * media span in the same document — the image directly above a
    * biography sentence. One pass over the spans: explode in offset
    * order and take a running `last(media_ref) ignoring nulls` over a
    * strictly-preceding window frame. null when no media precedes.
    * Output: (doc_id, sentence_offset, media_ctx) — joinable to triples
    * on the (doc_id, sentence_offset) provenance key they already
    * carry.
    */
  def mediaContext(docs: Dataset[Doc]): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s.offset"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.toDF()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .withColumn("media_ctx",
        last(when(col("s.kind") === "media", col("s.media_ref")), ignoreNulls = true)
          .over(w))
      .filter(col("s.kind") === "text")
      .select(col("doc_id"), col("s.offset").as("sentence_offset"), col("media_ctx"))
  }

  /** QuickStatements with the media-provenance reference appended:
    * `... S854 "url" S4656 "media_ref"` when the source sentence sits
    * under a media span (pinned rendering: P4656 "Wikimedia import
    * URL" as the import-provenance reference property), plain S854
    * line otherwise. The join runs on the (doc_id, sentence_offset)
    * key both sides carry; at scale both are doc_id-partitioned
    * corpus derivatives, so AQE plans a co-partitioned join.
    */
  def quickStatementsWithMedia(triples: DataFrame, mediaCtx: DataFrame): DataFrame =
    triples.join(mediaCtx, Seq("doc_id", "sentence_offset"), "left")
      .select(concat(
        concat_ws("\t",
          col("subj"), col("pred"), qsValue,
          lit("S854"), concat(lit("\""), col("source_url"), lit("\""))),
        when(col("media_ctx").isNotNull,
          concat(lit("\tS4656\t\""), col("media_ctx"), lit("\"")))
          .otherwise(lit(""))).as("qs"))

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
