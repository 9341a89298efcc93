package graft.functions

import graft.fixtures.Lexicon
import graft.model.Tok

/** Deterministic tokenizer + POS/lemma tagger (Spark-side replacement
  * for the reference's TreeTagger wrapper, public Wikidata/StrepHit
  * strephit/commons/{tokenize,pos_tag}.py). Pure functions — safe in
  * typed Dataset maps; no model files, no native binaries.
  */
object Text {

  private val digits = "\\d+,?".r.pattern           // "19," keeps US-form day in the date run
  private val range = "\\d{3,4}[–-]\\d{3,4}".r.pattern // year range "1832–1901"
  private val ordinal = "\\d+(st|nd|rd|th)".r.pattern
  private val decade = "\\d{2,4}s".r.pattern
  private val iso = "\\d{4}-\\d{2}-\\d{2}".r.pattern
  private val slash = "\\d{1,2}/\\d{1,2}/\\d{4}".r.pattern

  // precompiled (round 6): String.split(regex) re-compiles the pattern
  // on every call — this runs once per sentence across the pipeline
  private val ws = "\\s+".r.pattern

  def tokenize(text: String): Array[String] =
    ws.split(text).filter(_.nonEmpty)

  /** Tag one token. POS tags: V*(verbs), NNM(month), CD(number/date
    * piece incl. ordinals), CA(circa marker), DM(decade modifier
    * early/late), NNT(temporal unit noun), NNP(proper), IN(stopword),
    * .(punct), NN.
    */
  def tag(word: String): Tok = {
    val lw = word.toLowerCase(java.util.Locale.ROOT)
    Lexicon.verbLexicon.get(lw) match {
      case Some((pos, lemma)) => Tok(word, pos, lemma)
      case None =>
        if (Lexicon.monthIndex.contains(lw)) Tok(word, "NNM", lw)
        // digit guard (round 6): every CD pattern except the literal
        // "bc" must start with a digit, so alphabetic tokens — the vast
        // majority — skip all six Matcher allocations with one char
        // test; match results are unchanged by construction
        else if (lw == "bc" || (lw.nonEmpty && lw.charAt(0).isDigit &&
                 (digits.matcher(lw).matches() ||
                 ordinal.matcher(lw).matches() || range.matcher(lw).matches() ||
                 decade.matcher(lw).matches() || iso.matcher(lw).matches() ||
                 slash.matcher(lw).matches()))) Tok(word, "CD", lw)
        else if (lw == "c.") Tok(word, "CA", lw)
        else if (lw == "early" || lw == "late") Tok(word, "DM", lw)
        else if (lw == "century") Tok(word, "NNT", lw)
        else if (lw == "." || lw == "," || lw == ";") Tok(word, ".", lw)
        else if (Lexicon.stopwords.contains(lw)) Tok(word, "IN", lw)
        else if (word.nonEmpty && word.charAt(0).isUpper) Tok(word, "NNP", lw)
        // suffix heuristics: general English degrades to sensible POS
        // instead of a flat NN (the lexicon covers only the LU verbs)
        else if (lw.length > 4 && lw.endsWith("ed")) Tok(word, "VBD", lw.dropRight(2))
        else if (lw.length > 5 && lw.endsWith("ing")) Tok(word, "VBG", lw.dropRight(3))
        else if (lw.length > 3 && lw.endsWith("ly")) Tok(word, "RB", lw)
        else Tok(word, "NN", lw)
    }
  }

  def tokenizeTag(text: String): Seq[Tok] = tokenize(text).toSeq.map(tag)

  /** A candidate chunk: maximal token run of one chunk class. */
  case class RawChunk(text: String, cls: String) // cls: 'entity' | 'date' | 'gazetteer'

  /** Chunker: NNP runs -> entity chunks; CD/NNM(/leading CA) runs ->
    * date chunks; single lowercase tokens present in the gazetteer ->
    * gazetteer chunks. Deterministic, order-preserving.
    */
  def chunk(tokens: Seq[Tok], gazetteer: String => Boolean): Seq[RawChunk] = {
    val n = tokens.length
    // date-run membership: numbers/months/temporal units, plus circa /
    // early / late markers when they introduce a number ("c. 1840",
    // "early 1830s")
    def inDateRun(j: Int): Boolean = {
      val p = tokens(j).pos
      p == "CD" || p == "NNM" || p == "NNT" ||
        ((p == "CA" || p == "DM") && j + 1 < n && tokens(j + 1).pos == "CD")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[RawChunk]
    var i = 0
    while (i < n) {
      val t = tokens(i)
      if (t.pos == "NNP") {
        var j = i
        while (j < n && tokens(j).pos == "NNP") j += 1
        out += RawChunk(tokens.slice(i, j).map(_.word).mkString(" "), "entity")
        i = j
      } else if (inDateRun(i)) {
        var j = i
        while (j < n && inDateRun(j)) j += 1
        out += RawChunk(tokens.slice(i, j).map(_.word).mkString(" "), "date")
        i = j
      } else {
        if (t.pos == "NN" && gazetteer(t.lemma)) out += RawChunk(t.word, "gazetteer")
        i += 1
      }
    }
    out.toSeq
  }
}
