package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Span-sequence invariant machinery (BASELINE.json input_hint: every
  * stage that carries a document row must preserve the sequence of
  * (kind, text, media_ref) in offset order). Pure Catalyst.
  */
object SpanFns {

  /** Deterministic signature of the span sequence: sha256 of the JSON
    * of (kind, text, media_ref) structs in offset order (SURVEY.md
    * §2.2 `span_invariant`).
    */
  def spansSig(spans: Column): Column =
    sha2(to_json(transform(
      array_sort(spans, (l, r) => l.getField("offset") - r.getField("offset")),
      s => struct(s.getField("kind").as("kind"),
        s.getField("text").as("text"),
        s.getField("media_ref").as("media_ref")))), 256)
}
