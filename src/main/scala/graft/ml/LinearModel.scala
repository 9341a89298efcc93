package graft.ml

import graft.fixtures.{BioGen, Lexicon}
import graft.functions.Text
import graft.model.{LuSentence, Tok}
import graft.operators.Classification

/** Learned token-level FE tagger: a multiclass averaged perceptron over
  * hashed window features (SURVEY §2.7 `train`; reference analog:
  * public Wikidata/StrepHit strephit/classification/train.py — a
  * scikit-learn LinearSVC fitted on the crowd-annotated gold). No
  * network and no sklearn here, so the model is fitted OFFLINE in plain
  * Scala on silver labels projected from the deterministic rule model
  * over a frozen fixture sample — fully reproducible (fixed doc ids,
  * fixed epoch order, no RNG), so every executor builds bit-identical
  * weights.
  */
object LinearModel {

  /** Frozen, broadcastable learned model. `weights(k)` is the dense
    * hashed-feature weight vector of class `classes(k)`.
    */
  case class Learned(classes: Array[String], weights: Array[Array[Float]])
      extends Serializable {

    def predict(feats: Array[Int]): Int = {
      var best = 0
      var bestScore = Double.MinValue
      var k = 0
      while (k < classes.length) {
        val w = weights(k)
        var s = 0.0
        var i = 0
        while (i < feats.length) { s += w(feats(i)); i += 1 }
        if (s > bestScore) { bestScore = s; best = k } // tie -> lower class index (sorted, deterministic)
        k += 1
      }
      best
    }

    /** Label every token of a sentence. */
    def tagTokens(tokens: IndexedSeq[Tok], lu: String,
                  gazEtype: String => Option[String]): Array[String] = {
      val out = new Array[String](tokens.length)
      var i = 0
      while (i < tokens.length) {
        out(i) = classes(predict(Features.tokenFeatures(tokens, i, lu, gazEtype)))
        i += 1
      }
      out
    }
  }

  /** One labeled training token. */
  private case class Example(feats: Array[Int], label: String)

  /** Project silver token labels from the rule model's decisions:
    * tokens of the chosen subject chunk -> "__subj", tokens of a chunk
    * chosen for FE f -> f, everything else -> "O".
    */
  private def silverLabels(s: LuSentence,
                           model: Classification.FrameModel): Option[IndexedSeq[String]] = {
    val toks = s.tokens.toIndexedSeq
    val labels = Array.fill(toks.length)("O")
    // no-subject sentences train as all-O: the tagger must learn that a
    // non-person entity at the sentence head is NOT a subject
    val cs = model.classify(s).getOrElse(return Some(labels.toIndexedSeq))
    // map chosen chunk text -> token span (first unlabeled match)
    def mark(text: String, label: String): Unit = {
      val words = text.split(" ")
      var i = 0
      while (i + words.length <= toks.length) {
        if (labels(i) == "O" &&
            (0 until words.length).forall(j => toks(i + j).word == words(j))) {
          (0 until words.length).foreach(j => labels(i + j) = label)
          return
        }
        i += 1
      }
    }
    mark(cs.subj_chunk, "__subj")
    cs.chunks.foreach(c => mark(c.text, c.fe))
    Some(labels.toIndexedSeq)
  }

  /** Deterministic fixture training sample: LU sentences from `n`
    * generated docs, exactly the extraction the pipeline performs.
    */
  private def trainingSentences(n: Int): Seq[LuSentence] =
    (0 until n).flatMap { i =>
      val doc = BioGen.generate(s"mltrain$i", "")._1
      doc.spans.filter(sp => sp.kind == "text" && sp.text != null).flatMap { sp =>
        val toks = Text.tokenizeTag(sp.text)
        toks.map(_.lemma).distinct.flatMap(l =>
          Lexicon.luToFrame.get(l).map(f =>
            LuSentence(doc.doc_id, sp.offset, l, f, sp.text, toks, "")))
      }
    }

  /** Averaged-perceptron fit. Deterministic: fixed example order, no
    * shuffling, epochs until convergence (cap 15).
    */
  def train(nDocs: Int = 400): Learned = {
    val rule = Classification.defaultModel
    val gaz: String => Option[String] = rule.gazEtype.get
    val examples: IndexedSeq[Example] = trainingSentences(nDocs).iterator.flatMap { s =>
      silverLabels(s, rule) match {
        case None => Iterator.empty
        case Some(labels) =>
          val toks = s.tokens.toIndexedSeq
          labels.indices.iterator.map(i =>
            Example(Features.tokenFeatures(toks, i, s.lu, gaz), labels(i)))
      }
    }.toIndexedSeq
    val classes = examples.map(_.label).distinct.sorted.toArray
    val kOf = classes.zipWithIndex.toMap
    val K = classes.length
    val w = Array.fill(K)(new Array[Double](Features.Dim))
    val u = Array.fill(K)(new Array[Double](Features.Dim)) // averaging accumulators
    var c = 1L
    var epoch = 0
    var errors = 1
    while (epoch < 15 && errors > 0) {
      errors = 0
      examples.foreach { ex =>
        // inline argmax on current w
        var best = 0; var bestScore = Double.MinValue
        var k = 0
        while (k < K) {
          var sc = 0.0; var i = 0
          while (i < ex.feats.length) { sc += w(k)(ex.feats(i)); i += 1 }
          if (sc > bestScore) { bestScore = sc; best = k }
          k += 1
        }
        val gold = kOf(ex.label)
        if (best != gold) {
          errors += 1
          ex.feats.foreach { f =>
            w(gold)(f) += 1.0; u(gold)(f) += c
            w(best)(f) -= 1.0; u(best)(f) -= c
          }
        }
        c += 1
      }
      epoch += 1
    }
    // averaged weights: w_avg = w - u/c
    val avg = Array.tabulate(K) { k =>
      val wk = w(k); val uk = u(k)
      Array.tabulate(Features.Dim)(f => (wk(f) - uk(f) / c).toFloat)
    }
    Learned(classes, avg)
  }

  /** The frozen default learned model (deterministic fit — identical
    * on every JVM; built once per process).
    */
  lazy val default: Learned = train()
}
