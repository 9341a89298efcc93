package graft.ml

import graft.model.Tok
import graft.util.Det

/** Token-window feature extraction for FE-role tagging (SURVEY §2.7
  * `featurize`; reference analog: public Wikidata/StrepHit
  * strephit/classification/feature_extractors.py — one-hot
  * surface/POS/lemma features in a ±2 token window plus gazetteer
  * flags). Here the one-hot index space is a deterministic hashing
  * trick (splitmix64 of the feature string masked to `Dim`), so no
  * vocabulary map needs broadcasting and unseen tokens degrade
  * gracefully to their POS/window features.
  */
object Features {

  /** Hashed one-hot dimensionality (2^16). */
  val Dim: Int = 1 << 16
  private val Mask = Dim - 1

  @inline def hash(feature: String): Int =
    (Det.hashStr(feature) & 0x7fffffffffffffffL).toInt & Mask

  /** Features of token `i` in `tokens`, conditioned on the sentence's
    * matched LU lemma. Returns hashed indices (duplicates allowed —
    * they just double that weight's vote).
    */
  /** Coarse chunk class of a POS tag: date-ish, proper-entity, other.
    * Gives unseen surface words a strong class-level signal so chunk
    * boundaries don't bleed into neighbors on out-of-template text.
    */
  private def cls(pos: String, isGaz: Boolean): String =
    if (isGaz) "gaz"
    else pos match {
      case "CD" | "NNM" | "NNT" | "CA" | "DM" => "date"
      case "NNP" => "ent"
      case _ => "none"
    }

  def tokenFeatures(tokens: IndexedSeq[Tok], i: Int, lu: String,
                    gazEtype: String => Option[String]): Array[Int] = {
    val n = tokens.length
    def word(j: Int): String = if (j < 0 || j >= n) "<pad>" else tokens(j).word.toLowerCase(java.util.Locale.ROOT)
    def pos(j: Int): String = if (j < 0 || j >= n) "<pad>" else tokens(j).pos
    def gaz(j: Int): String =
      if (j < 0 || j >= n) "_"
      else gazEtype(tokens(j).word.toLowerCase(java.util.Locale.ROOT)).orElse(gazEtype(tokens(j).lemma)).getOrElse("_")
    def c(j: Int): String = if (j < 0 || j >= n) "<pad>" else cls(pos(j), gaz(j) != "_")
    val fs = Array.newBuilder[Int]
    fs += hash("b") // bias
    var d = -2
    while (d <= 2) {
      fs += hash(s"w$d=${word(i + d)}")
      fs += hash(s"p$d=${pos(i + d)}")
      d += 1
    }
    // current-token features emitted TWICE: the token's own identity
    // must outvote its window when they disagree (chunk boundaries)
    fs += hash(s"w0=${word(i)}")
    fs += hash(s"p0=${pos(i)}")
    fs += hash(s"l0=${tokens(i).lemma}")
    fs += hash(s"g0=${gaz(i)}")
    fs += hash(s"g-1=${gaz(i - 1)}")
    fs += hash(s"g+1=${gaz(i + 1)}")
    // chunk-class features (see cls) — doubled at the current token
    fs += hash(s"c0=${c(i)}")
    fs += hash(s"c0=${c(i)}")
    fs += hash(s"c-1=${c(i - 1)}")
    fs += hash(s"c+1=${c(i + 1)}")
    fs += hash(s"c0|c-1=${c(i)}|${c(i - 1)}")
    // LU-conditioned conjunctions: the same surface pattern can fill
    // different FEs under different frames ("4" is a quantity under
    // Parenting but a year under Death)
    fs += hash(s"lu=$lu")
    fs += hash(s"lu|p0=$lu|${pos(i)}")
    fs += hash(s"lu|w0=$lu|${word(i)}")
    fs += hash(s"lu|g0=$lu|${gaz(i)}")
    fs += hash(s"lu|c0=$lu|${c(i)}")
    // positional bucket: subjects sit at the sentence head
    val t = math.min(i, 4)
    fs += hash(s"t=$t")
    fs += hash(s"lu|t=$lu|$t")
    fs.result()
  }
}
