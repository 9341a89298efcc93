package graft.ml

/** Learned DOCUMENT-QUALITY head (round-4 VERDICT "What's missing" #3):
  * an averaged perceptron over the existing quality + repetition
  * signals, trained on SILVER labels projected from the heuristic
  * rules — the model shape production filtering actually ships (the
  * heuristics bootstrap it; the learned head then generalizes their
  * joint decision boundary). Same determinism contract as
  * ml.LinearModel: fixture training corpus, fixed example order, no
  * RNG — every JVM fits bit-identical weights.
  *
  * The FEATURES are deliberately plain rational arithmetic (ratios and
  * bounded linear counts, no transcendentals): the Catalyst scoring
  * expression and the DuckDB oracle re-derive them bit-identically
  * (IEEE doubles, same operation order), so the learned scores go
  * under the independent-SQL gate with the weights inlined.
  */
object QualityModel {

  /** Feature vector of a text — MUST mirror the Catalyst expressions in
    * TextAnalysis.qualityLearned exactly (same tokenizer, same
    * normalizations): [bias, min(nTok,200)/200, avgTokLen/10,
    * stopwordRatio, dupTokenFrac, dupTrigramFrac, alphaRatio].
    */
  val Dim = 7

  val StopSet: Set[String] = Set("the", "a", "of", "and", "in")

  def features(text: String): Array[Double] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)
    val n = toks.length
    val tris =
      if (n >= 3) toks.sliding(3).map(_.mkString(" ")).toArray
      else Array.empty[String]
    // code-POINT denominator: Spark's length() and DuckDB's length()
    // count code points, String.length counts UTF-16 units — they
    // diverge on astral chars, and this function must mirror the
    // Catalyst f6 exactly (the ASCII-letter numerator is unit-safe:
    // no surrogate half is in A-Za-z)
    val alpha =
      if (text.isEmpty) 0.0
      else text.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toDouble /
        text.codePointCount(0, text.length)
    Array(
      1.0,
      math.min(n, 200).toDouble / 200.0,
      if (n == 0) 0.0 else toks.map(_.length).sum.toDouble / n / 10.0,
      if (n == 0) 0.0 else toks.count(StopSet).toDouble / n,
      if (n == 0) 0.0 else 1.0 - toks.distinct.length.toDouble / n,
      if (tris.isEmpty) 0.0 else 1.0 - tris.distinct.length.toDouble / tris.length,
      alpha)
  }

  /** The silver heuristic rule (the labels the head learns to mimic —
    * also computed per doc by the driver-checked query for agreement).
    */
  def heuristicGood(text: String): Boolean = {
    val f = features(text)
    heuristicGood(nTok = math.round(f(1) * 200).toInt, stopRatio = f(3),
      dupTri = f(5), alpha = f(6))
  }

  def heuristicGood(nTok: Int, stopRatio: Double, dupTri: Double,
                    alpha: Double): Boolean =
    nTok >= 20 && stopRatio >= 0.015 && dupTri <= 0.5 && alpha >= 0.6

  /** Deterministic training corpus: clean fixture bios plus typed
    * corruptions (token-loop repetition, digit noise, truncation,
    * stopword stripping) so both classes are populated. Labels come
    * from the heuristic over the SAME texts — silver, not hand gold.
    */
  private def trainingTexts(nDocs: Int): Seq[String] =
    (0 until nDocs).flatMap { i =>
      val doc = graft.fixtures.BioGen.generate(s"qtrain$i", "")._1
      val clean = doc.spans.filter(sp => sp.kind == "text" && sp.text != null)
        .map(_.text).mkString(" ")
      val toks = clean.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)
      Seq(
        clean,                                               // good
        Array.fill(15)(toks.take(10)).flatten.mkString(" "), // repetition loop
        toks.map(_ + "1234").mkString(" "),                  // digit noise -> low alpha
        toks.take(5).mkString(" "),                          // truncated
        toks.filterNot(QualityModel.StopSet).mkString(" "))  // stopword-stripped
    }

  /** Frozen learned weights (averaged perceptron, fixed order, cap 25
    * epochs). w(0) is the bias via the constant feature.
    */
  def train(nDocs: Int = 200): Array[Double] = {
    val examples = trainingTexts(nDocs).map(t => (features(t), heuristicGood(t)))
    val w = new Array[Double](Dim)
    val u = new Array[Double](Dim)
    var c = 1L
    var epoch = 0
    var errors = 1
    while (epoch < 25 && errors > 0) {
      errors = 0
      examples.foreach { case (f, good) =>
        var s = 0.0
        var i = 0
        while (i < Dim) { s += w(i) * f(i); i += 1 }
        val y = if (good) 1.0 else -1.0
        if (s * y <= 0) {
          errors += 1
          i = 0
          while (i < Dim) { w(i) += y * f(i); u(i) += c * y * f(i); i += 1 }
        }
        c += 1
      }
      epoch += 1
    }
    Array.tabulate(Dim)(i => w(i) - u(i) / c)
  }

  lazy val default: Array[Double] = train()
}
