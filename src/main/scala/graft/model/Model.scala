package graft.model

/** Canonical schemas (SURVEY.md §1.2, FIXTURES.md).
  * All row types are case classes with product encoders — the
  * reference's dynamic JSON dicts (public Wikidata/StrepHit,
  * strephit/commons/io.py) become fixed, declared Spark schemas.
  */

/** One element of a document's interleaved text+media sequence.
  * Normative input shape per BASELINE.json input_hint.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The canonical input row: interleaved text + media document. */
case class Doc(doc_id: String, spans: Seq[Span])

/** Token with POS tag + lemma (reference: TreeTagger 4-tuples,
  * strephit/commons/pos_tag.py — here a deterministic lexicon+rule tagger).
  */
case class Tok(word: String, pos: String, lemma: String)

/** One sentence extracted from a text span; `spans_sig` carries the
  * document's span-sequence signature for the invariant check.
  */
case class Sentence(
    doc_id: String,
    sentence_offset: Int,
    text: String,
    tokens: Seq[Tok],
    spans_sig: String)

/** Sentence matched to a lexical unit (extraction strategies 121/n2n,
  * reference: strephit/extraction/extract_sentences.py).
  */
case class LuSentence(
    doc_id: String,
    sentence_offset: Int,
    lu: String,
    frame: String,
    text: String,
    tokens: Seq[Tok],
    spans_sig: String)

/** A chunk (candidate frame-element filler) inside a sentence. */
case class Chunk(
    fe: String,        // frame element name ("__subj" = subject pseudo-FE)
    fe_type: String,   // 'item' | 'time' | 'quantity' | 'string'
    etype: String,     // expected linked-entity type for item FEs
    text: String,      // surface chunk
    score: Double)

/** Sentence after frame classification (reference:
  * strephit/classification/classify.py — broadcast-model scoring).
  */
case class ClassifiedSentence(
    doc_id: String,
    sentence_offset: Int,
    frame: String,
    lu: String,
    subj_chunk: String,
    chunks: Seq[Chunk],
    confidence: Double,
    spans_sig: String)

/** Wikidata-style time value: precision 11=day, 10=month, 9=year, 8=decade. */
case class TimeValue(year: Int, month: Int, day: Int, precision: Int)

/** Output graph row (SURVEY.md §1.1 R8). obj_kind ∈ item|time|quantity|string. */
case class Triple(
    subj: String,
    pred: String,
    obj_kind: String,
    obj_qid: String,
    obj_time: Option[TimeValue],
    obj_quantity: Option[BigDecimal],
    obj_text: String,
    confidence: Double,
    doc_id: String,
    sentence_offset: Int,
    source_url: String)

/** Lexical DB row (FIXTURES.md F2): frame ↔ LU ↔ FE ↔ Wikidata property. */
case class LexEntry(
    frame: String,
    lu_lemma: String,
    fe: String,
    fe_type: String,
    core: Boolean,
    wikidata_property: String)

/** Alias dictionary row (FIXTURES.md F3) for entity linking. */
case class Alias(
    alias_norm: String,
    qid: String,
    prior: Double,
    is_head: Boolean,
    etype: String)

/** Checkpoint / lineage row (FIXTURES.md F6). */
case class CheckpointRow(
    run_id: String,
    stage: String,
    partition_id: Int,
    doc_count: Long,
    triple_count: Long,
    min_doc: String,
    max_doc: String,
    wall_ms: Long,
    spans_sig_ok: Boolean,
    status: String)

/** Semi-structured path input row (FIXTURES.md F7). */
case class SemiDoc(doc_id: String, other: Map[String, String])

/** Rejected-items sideline row (SURVEY §2.4 J5): a sentence/statement
  * that could not become a triple, with the drop reason — nothing is
  * dropped silently, so recall loss is observable in production.
  */
case class Reject(
    doc_id: String,
    sentence_offset: Int,
    lu: String,
    frame: String,
    reason: String)

/** Combined keep+reject output of ONE classify pass — the write-once
  * shape Pipeline.rejected commits so the keep and reject streams both
  * derive from a single committed table instead of traversing
  * classification twice (round-3 VERDICT "What's wrong" #4). A kept
  * sentence can still carry reasons (missing_core_fe — classified but
  * observable recall loss); a no-subject sentence has keep=false and
  * empty classification fields.
  */
case class ClassifyFullRow(
    doc_id: String,
    sentence_offset: Int,
    frame: String,
    lu: String,
    subj_chunk: String,
    chunks: Seq[Chunk],
    confidence: Double,
    spans_sig: String,
    keep: Boolean,
    reasons: Seq[String])
