package graft.operators

import graft.fixtures.Lexicon
import graft.functions.Text
import graft.model._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/** Per-sentence frame classification: broadcast-model scoring inside a
  * typed Dataset mapPartitions (BASELINE.json north_star). Reference:
  * public Wikidata/StrepHit strephit/classification/classify.py
  * (LinearSVC over token-window features + custom gazetteer rules) —
  * here a deterministic linear rule model with gazetteer typing, the
  * weights frozen in-repo (no network, no sklearn).
  */
object Classification {

  /** Precompiled year-range shape (round 6): this ran String.matches —
    * a fresh Pattern.compile — once per (sentence, timerange FE).
    */
  private val YearRange = "\\d{3,4}[–-]\\d{3,4}".r.pattern

  /** The broadcastable model: LU->frame map, per-frame FE inventory,
    * FE->expected-entity-type constraints, gazetteer (alias -> etype of
    * its best link), and linear weights for the confidence score.
    */
  case class FrameModel(
      luToFrame: Map[String, String],
      frameFes: Map[String, Seq[(String, String)]], // frame -> (fe, fe_type) in lexicon order
      feEtype: Map[(String, String), String],
      gazEtype: Map[String, String],
      wLu: Double,
      wCoreFe: Double,
      wFe: Double,
      coreFes: Set[(String, String)]) extends Serializable {

    /** Classify one LU-matched sentence, with reject reasons (the J5
      * rejected-items sideline — nothing is dropped silently):
      * - no resolvable subject -> (None, "no_subject")
      * - a core FE left unfilled -> classified anyway, but the reason
      *   "missing_core_fe" is surfaced so recall loss is observable.
      */
    def classifyFull(s: LuSentence): (Option[ClassifiedSentence], Seq[String]) = {
      val raw = Text.chunk(s.tokens, gazEtype.contains)
      // type each chunk: date chunks keep class 'date'; entity/gazetteer
      // chunks get the gazetteer's entity type (unknown -> dropped)
      val typed: Seq[(String, String)] = raw.flatMap { c => // (etypeOr"date", text)
        if (c.cls == "date") Some(("date", c.text))
        else gazEtype.get(c.text.toLowerCase(java.util.Locale.ROOT)).map(t => (t, c.text))
      }
      val subjIdx = typed.indexWhere(_._1 == "person")
      if (subjIdx < 0) return (None, Seq("no_subject"))
      val subjChunk = typed(subjIdx)._2
      val fes = frameFes.getOrElse(s.frame, Seq.empty)
      val chunks: Seq[Chunk] = fes.flatMap { case (fe, feType) =>
        if (feType == "time") {
          typed.find(_._1 == "date")
            .map { case (_, txt) => Chunk(fe, "time", "", txt, 1.0) }
        } else if (feType == "quantity") {
          typed.find(t => t._1 == "date" && t._2.nonEmpty && t._2.forall(_.isDigit))
            .map { case (_, txt) => Chunk(fe, "quantity", "", txt, 1.0) }
        } else if (feType == "timerange") {
          typed.find(t => t._1 == "date" && YearRange.matcher(t._2).matches())
            .map { case (_, txt) => Chunk(fe, "timerange", "", txt, 1.0) }
        } else {
          val want = feEtype.getOrElse((s.frame, fe), "")
          typed.zipWithIndex
            .find { case ((et, _), i) => i != subjIdx && et == want }
            .map { case ((et, txt), _) => Chunk(fe, feType, et, txt, 1.0) }
        }
      }
      val filled = chunks.map(_.fe).toSet
      val reasons = fes.collect {
        case (fe, _) if coreFes((s.frame, fe)) && !filled(fe) => "missing_core_fe"
      }.distinct
      // linear confidence: LU match + filled FEs, normalized by the
      // maximum attainable score for this frame
      val got = wLu + chunks.map(c =>
        if (coreFes((s.frame, c.fe))) wCoreFe else wFe).sum
      val max = wLu + fes.map { case (fe, _) =>
        if (coreFes((s.frame, fe))) wCoreFe else wFe }.sum
      val conf = if (max <= 0) 0.0 else got / max
      (Some(ClassifiedSentence(s.doc_id, s.sentence_offset, s.frame, s.lu,
        subjChunk, chunks, conf, s.spans_sig)), reasons)
    }

    /** Classify one LU-matched sentence. None if no subject resolves. */
    def classify(s: LuSentence): Option[ClassifiedSentence] = classifyFull(s)._1
  }

  /** The frozen default model (FIXTURES.md F2/F3 resources). */
  def defaultModel: FrameModel = {
    val fes = Lexicon.lexicalDb.groupBy(_.frame).map { case (f, es) =>
      f -> es.map(e => (e.fe, e.fe_type))
    }
    val core = Lexicon.lexicalDb.filter(_.core).map(e => (e.frame, e.fe)).toSet
    FrameModel(
      luToFrame = Lexicon.luToFrame,
      frameFes = fes,
      feEtype = Lexicon.feEtype,
      gazEtype = Lexicon.bestLink.map { case (k, a) => k -> a.etype },
      wLu = 2.0, wCoreFe = 1.0, wFe = 0.5,
      coreFes = core)
  }

  /** Score every LU sentence with the broadcast model — one model
    * deserialization per partition, streaming within the partition.
    */
  def classify(luSents: Dataset[LuSentence],
               bc: Broadcast[FrameModel]): Dataset[ClassifiedSentence] = {
    import luSents.sparkSession.implicits._
    luSents.mapPartitions { it =>
      val model = bc.value
      it.flatMap(model.classify)
    }
  }

  /** Build a ClassifiedSentence from learned token labels: contiguous
    * same-label runs become chunks; the frame's FE inventory picks its
    * run; sentences where the tagger finds no subject fall back to the
    * rule model (graceful degradation, SURVEY §2.7 rule_classify).
    */
  def classifyLearnedOne(s: LuSentence, lm: graft.ml.LinearModel.Learned,
                         rule: FrameModel): Option[ClassifiedSentence] = {
    val toks = s.tokens.toIndexedSeq
    val labels = lm.tagTokens(toks, s.lu, rule.gazEtype.get)
    // contiguous non-O runs -> (label, chunkText)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < labels.length) {
      if (labels(i) != "O") {
        var j = i
        while (j < labels.length && labels(j) == labels(i)) j += 1
        runs += ((labels(i), toks.slice(i, j).map(_.word).mkString(" ")))
        i = j
      } else i += 1
    }
    runs.find(_._1 == "__subj") match {
      case None => rule.classify(s) // learned tagger found no subject
      case Some((_, subjChunk)) =>
        val fes = rule.frameFes.getOrElse(s.frame, Seq.empty)
        val chunks: Seq[Chunk] = fes.flatMap { case (fe, feType) =>
          runs.find(_._1 == fe).map { case (_, txt) =>
            val et = if (feType == "item") rule.feEtype.getOrElse((s.frame, fe), "") else ""
            Chunk(fe, feType, et, txt, 1.0)
          }
        }
        val got = rule.wLu + chunks.map(c =>
          if (rule.coreFes((s.frame, c.fe))) rule.wCoreFe else rule.wFe).sum
        val max = rule.wLu + fes.map { case (fe, _) =>
          if (rule.coreFes((s.frame, fe))) rule.wCoreFe else rule.wFe }.sum
        val conf = if (max <= 0) 0.0 else got / max
        Some(ClassifiedSentence(s.doc_id, s.sentence_offset, s.frame, s.lu,
          subjChunk, chunks, conf, s.spans_sig))
    }
  }

  /** Learned-model scoring inside mapPartitions (SURVEY §2.7 classify,
    * learned branch): broadcast weights, rule model as fallback.
    */
  def classifyLearned(luSents: Dataset[LuSentence],
                      bcLearned: Broadcast[graft.ml.LinearModel.Learned],
                      bcRule: Broadcast[FrameModel]): Dataset[ClassifiedSentence] = {
    import luSents.sparkSession.implicits._
    luSents.mapPartitions { it =>
      val lm = bcLearned.value
      val rule = bcRule.value
      it.flatMap(s => classifyLearnedOne(s, lm, rule))
    }
  }

  /** Featurization as a first-class dataset op (SURVEY §2.7 featurize):
    * per-token hashed one-hot indices, summarized per sentence.
    */
  def featurize(luSents: Dataset[LuSentence],
                bc: Broadcast[FrameModel]): org.apache.spark.sql.DataFrame = {
    import luSents.sparkSession.implicits._
    luSents.mapPartitions { it =>
      val gaz = bc.value.gazEtype.get _
      it.map { s =>
        val toks = s.tokens.toIndexedSeq
        val feats = toks.indices.flatMap(i =>
          graft.ml.Features.tokenFeatures(toks, i, s.lu, gaz))
        (s.doc_id, s.sentence_offset, s.lu, toks.length, feats.length,
          feats.foldLeft(0L)((a, f) => a + f))
      }
    }.toDF("doc_id", "sentence_offset", "lu", "n_tokens", "n_features", "feat_sum")
  }

  /** ONE classify pass emitting keep + reject information together —
    * the stream Pipeline.rejected commits once and filters twice
    * (write-once shape, round-3 VERDICT #4). Same broadcast-model
    * mapPartitions shape as classify.
    */
  def classifyFullDs(luSents: Dataset[LuSentence],
                     bc: Broadcast[FrameModel]): Dataset[ClassifyFullRow] = {
    import luSents.sparkSession.implicits._
    luSents.mapPartitions { it =>
      val model = bc.value
      it.map { s =>
        model.classifyFull(s) match {
          case (Some(c), reasons) =>
            ClassifyFullRow(c.doc_id, c.sentence_offset, c.frame, c.lu,
              c.subj_chunk, c.chunks, c.confidence, c.spans_sig,
              keep = true, reasons)
          case (None, reasons) =>
            ClassifyFullRow(s.doc_id, s.sentence_offset, s.frame, s.lu,
              null, Seq.empty, 0.0, s.spans_sig, keep = false, reasons)
        }
      }
    }
  }

  /** Classification-stage rejected-items sideline (SURVEY §2.4 J5:
    * "unresolved -> rejected sink"): one row per (sentence, reason),
    * same single mapPartitions pass shape as classify.
    */
  def rejects(luSents: Dataset[LuSentence],
              bc: Broadcast[FrameModel]): Dataset[Reject] = {
    import luSents.sparkSession.implicits._
    luSents.mapPartitions { it =>
      val model = bc.value
      it.flatMap { s =>
        model.classifyFull(s)._2.map(r =>
          Reject(s.doc_id, s.sentence_offset, s.lu, s.frame, r))
      }
    }
  }
}
