package graft.fixtures

import graft.model._
import graft.util.Det

/** Deterministic biography-corpus generator (FIXTURES.md F1/F4/F5/F7).
  *
  * Every value is a pure function of the doc id — no RNG state — so
  * generation is reproducible at any parallelism, and gold triples are
  * knowable at generation time (the template knows its own answer).
  * The pipeline's P/R gate (BASELINE.md) compares against this gold.
  */
object BioGen {

  /** Number of date surface-form variants (FIXTURES.md F5 case table). */
  val dateVariants = 11

  /** Date surface-form rotation (FIXTURES.md F5 case table).
    * Returns (surfaceText, gold TimeValue). 0 = absent component.
    */
  def dateSurface(variant: Int, y: Int, m: Int, d: Int): (String, TimeValue) = {
    val mName = Lexicon.months(m - 1)
    variant match {
      case 0 => (s"$d $mName $y", TimeValue(y, m, d, 11))
      case 1 => (s"$mName $y", TimeValue(y, m, 0, 10))
      case 2 => (s"$y", TimeValue(y, 0, 0, 9))
      case 3 => (s"c. $y", TimeValue(y, 0, 0, 9))
      case 4 => { val dec = (y / 10) * 10; (s"${dec}s", TimeValue(dec, 0, 0, 8)) }
      case 5 => (f"$y%04d-$m%02d-$d%02d", TimeValue(y, m, d, 11))
      case 6 => (f"$d%02d/$m%02d/$y%04d", TimeValue(y, m, d, 11))
      case 7 => (s"${(y % 100) + 1} BC", TimeValue(-((y % 100) + 1), 0, 0, 9))
      case 8 => // early/late decade modifier (pinned: modifier drops, decade kept)
        val dec = (y / 10) * 10
        val mod = if (d % 2 == 0) "early" else "late"
        (s"$mod ${dec}s", TimeValue(dec, 0, 0, 8))
      case 9 => (s"$mName $d, $y", TimeValue(y, m, d, 11)) // US month-day-year
      case _ => // century (pinned: mid-century year, precision 7)
        val c = y / 100 + 1
        (s"${c}th century", TimeValue((c - 1) * 100 + 50, 0, 0, 7))
    }
  }

  private def qidOfName(i: Int): String = Lexicon.bestLink(Lexicon.nameAt(i).toLowerCase).qid
  private def qidOfPlace(p: String): String = Lexicon.bestLink(p.toLowerCase).qid

  /** A generated bio sentence plus its gold triples (sentence_offset
    * filled in later, once span positions are known).
    */
  private case class BioSentence(text: String, triples: Seq[(String, String, String, Option[TimeValue], Option[BigDecimal], String, String)])
  // triple parts: (subjQid, pred, objQid, objTime, objQuantity, objKind, objText)

  private def mkBio(h: Long, subjIdx: Int): BioSentence = {
    val name = Lexicon.nameAt(subjIdx)
    val subjQ = qidOfName(subjIdx)
    val tid = Det.bounded(Det.mix(h, 1L), 14)
    tid match {
      case 0 =>
        val place = Lexicon.places(Det.bounded(Det.mix(h, 2L), Lexicon.places.length))
        val y = 1700 + Det.bounded(Det.mix(h, 3L), 250)
        val m = 1 + Det.bounded(Det.mix(h, 4L), 12)
        val d = 1 + Det.bounded(Det.mix(h, 5L), 28)
        val v = Det.bounded(Det.mix(h, 6L), dateVariants)
        val (surface, tv) = dateSurface(v, y, m, d)
        BioSentence(s"$name was born in $place on $surface .",
          Seq((subjQ, "P569", "", Some(tv), None, "time", surface),
              (subjQ, "P19", qidOfPlace(place), None, None, "item", place)))
      case 1 =>
        val place = Lexicon.places(Det.bounded(Det.mix(h, 2L), Lexicon.places.length))
        val y = 1750 + Det.bounded(Det.mix(h, 3L), 250)
        BioSentence(s"$name died in $place in $y .",
          Seq((subjQ, "P570", "", Some(TimeValue(y, 0, 0, 9)), None, "time", y.toString),
              (subjQ, "P20", qidOfPlace(place), None, None, "item", place)))
      case 2 =>
        val partnerIdx = {
          val p = Det.bounded(Det.mix(h, 2L), Lexicon.nameCount)
          if (p == subjIdx) (p + 1) % Lexicon.nameCount else p
        }
        val partner = Lexicon.nameAt(partnerIdx)
        val y = 1720 + Det.bounded(Det.mix(h, 3L), 250)
        BioSentence(s"$name married $partner in $y .",
          Seq((subjQ, "P26", qidOfName(partnerIdx), None, None, "item", partner)))
      case 3 =>
        val occ = Lexicon.occupations(Det.bounded(Det.mix(h, 2L), Lexicon.occupations.length))
        BioSentence(s"$name worked as a $occ .",
          Seq((subjQ, "P106", Lexicon.bestLink(occ).qid, None, None, "item", occ)))
      case 4 =>
        val inst = Lexicon.institutions(Det.bounded(Det.mix(h, 2L), Lexicon.institutions.length))
        BioSentence(s"$name studied at $inst .",
          Seq((subjQ, "P69", Lexicon.bestLink(inst.toLowerCase).qid, None, None, "item", inst)))
      case 5 =>
        val aw = Lexicon.awards(Det.bounded(Det.mix(h, 2L), Lexicon.awards.length))
        val y = 1800 + Det.bounded(Det.mix(h, 3L), 200)
        BioSentence(s"$name received the $aw award in $y .",
          Seq((subjQ, "P166", Lexicon.bestLink(aw.toLowerCase).qid, None, None, "item", aw)))
      case 6 =>
        val place = Lexicon.places(Det.bounded(Det.mix(h, 2L), Lexicon.places.length))
        BioSentence(s"$name lived in $place .",
          Seq((subjQ, "P551", qidOfPlace(place), None, None, "item", place)))
      case 7 =>
        val org = Lexicon.orgs(Det.bounded(Det.mix(h, 2L), Lexicon.orgs.length))
        BioSentence(s"$name joined the $org .",
          Seq((subjQ, "P108", Lexicon.bestLink(org.toLowerCase).qid, None, None, "item", org)))
      case 8 => // quantity-valued FE (Parenting/P1971)
        val nKids = 1 + Det.bounded(Det.mix(h, 2L), 9)
        BioSentence(s"$name raised $nKids children .",
          Seq((subjQ, "P1971", "", None, Some(BigDecimal(nKids)), "quantity", nKids.toString)))
      case 9 => // distractor: no LU verb -> no sentence candidate at all
        val place = Lexicon.places(Det.bounded(Det.mix(h, 2L), Lexicon.places.length))
        BioSentence(s"it was a fine morning in $place .", Seq.empty)
      case 10 => // reject fodder: LU verb but no resolvable subject -> 'no_subject'
        val org = Lexicon.orgs(Det.bounded(Det.mix(h, 2L), Lexicon.orgs.length))
        BioSentence(s"The $org was received with praise .", Seq.empty)
      case 11 => // reject fodder: subject ok, core FE unlinkable -> 'missing_core_fe'
        BioSentence(s"$name studied at Atlantis .", Seq.empty)
      case 12 => // reject fodder: date chunk that fails canonicalization -> 'bad_date'
        BioSentence(s"$name died in 1234567 .", Seq.empty)
      case _ => // range-valued time FE: start (P580) + end (P582) statements
        val place = Lexicon.places(Det.bounded(Det.mix(h, 2L), Lexicon.places.length))
        val y1 = 1700 + Det.bounded(Det.mix(h, 3L), 200)
        val y2 = y1 + 1 + Det.bounded(Det.mix(h, 4L), 60)
        val surface = s"$y1–$y2"
        BioSentence(s"$name resided in $place during $surface .",
          Seq((subjQ, "P551", qidOfPlace(place), None, None, "item", place),
              (subjQ, "P580", "", Some(TimeValue(y1, 0, 0, 9)), None, "time", surface),
              (subjQ, "P582", "", Some(TimeValue(y2, 0, 0, 9)), None, "time", surface)))
    }
  }

  /** Build the interleaved spans doc + its gold triples.
    *
    * @param docId     canonical string id
    * @param saladText raw text from the testdata documents table (may be
    *                  empty for pure-fixture corpora) — chopped into
    *                  8-token text spans so throughput is measured on
    *                  real testdata volume (FIXTURES.md F1 bench note).
    */
  def generate(docId: String, saladText: String): (Doc, Seq[Triple]) = {
    val h0 = Det.hashStr(docId)
    val subjIdx = Lexicon.personIndexFor(h0)

    val saladSents: Seq[String] =
      if (saladText == null || saladText.isEmpty) Seq.empty
      else saladText.split(" ").grouped(8).map(_.mkString(" ")).toSeq

    val nBio = 2 + Det.bounded(Det.mix(h0, 100L), 3)
    val bios = (0 until nBio).map(i => mkBio(Det.mix(h0, 200L + i), subjIdx))

    // interleave: salad spans, then bio spans, media spans injected at
    // deterministic positions (0-3 of them)
    val textSpans: Seq[(String, Boolean)] = // (text, isBio)
      saladSents.map(s => (s, false)) ++ bios.map(b => (b.text, true))
    val nMedia = Det.bounded(Det.mix(h0, 300L), 4)
    val mediaAt: Set[Int] =
      (0 until nMedia).map(i => Det.bounded(Det.mix(h0, 400L + i), textSpans.length + nMedia)).toSet

    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    val bioOffsets = scala.collection.mutable.ArrayBuffer.empty[Int] // offset of i-th bio span
    var ti = 0
    var off = 0
    var slot = 0
    while (ti < textSpans.length) {
      if (mediaAt.contains(slot) && slot < textSpans.length + nMedia) {
        spans += Span("media", null, s"media://img/${Det.mix(h0, 500L + slot) & 0xffffff}", off)
        off += 1
      } else {
        val (txt, isBio) = textSpans(ti)
        if (isBio) bioOffsets += off
        spans += Span("text", txt, null, off)
        off += 1
        ti += 1
      }
      slot += 1
    }

    val doc = Doc(docId, spans.toSeq)
    val url = s"https://example.org/doc/$docId"
    val triples = bios.zipWithIndex.flatMap { case (b, i) =>
      b.triples.map { case (subj, pred, objQid, objTime, objQty, objKind, objText) =>
        Triple(subj, pred, objKind,
          if (objQid.isEmpty) null else objQid,
          objTime, objQty,
          objText, 1.0, docId, bioOffsets(i), url)
      }
    }
    (doc, triples)
  }

  /** Semi-structured sidecar (FIXTURES.md F7): 20% of docs carry an
    * `other` map; its gold triples (P569 date + P106 occupation).
    */
  def semiFor(docId: String): Option[(SemiDoc, Seq[Triple])] = {
    val h0 = Det.hashStr(docId)
    if (Det.bounded(Det.mix(h0, 600L), 5) != 0) None
    else {
      val subjIdx = Lexicon.personIndexFor(h0)
      val subjQ = qidOfName(subjIdx)
      val y = 1700 + Det.bounded(Det.mix(h0, 601L), 250)
      val m = 1 + Det.bounded(Det.mix(h0, 602L), 12)
      val d = 1 + Det.bounded(Det.mix(h0, 603L), 28)
      val (surface, tv) = dateSurface(Det.bounded(Det.mix(h0, 604L), 3), y, m, d)
      val occ = Lexicon.occupations(Det.bounded(Det.mix(h0, 605L), Lexicon.occupations.length))
      val url = s"https://example.org/doc/$docId"
      val semi = SemiDoc(docId, Map(
        "name" -> Lexicon.nameAt(subjIdx),
        "born" -> surface,
        "occupation" -> occ))
      val triples = Seq(
        Triple(subjQ, "P569", "time", null, Some(tv), None, surface, 1.0, docId, -1, url),
        Triple(subjQ, "P106", "item", Lexicon.bestLink(occ).qid, None, None, occ, 1.0, docId, -1, url))
      Some((semi, triples))
    }
  }
}
