package graft.fixtures

import graft.model.{Alias, LexEntry}
import graft.util.Det

/** Frozen in-repo lexical resources (FIXTURES.md F2/F3) standing in for
  * the reference's FrameNet intersection + Wikidata/Dandelion APIs
  * (public Wikidata/StrepHit: strephit/corpus_analysis/
  * extract_framenet_frames.py, strephit/commons/entity_linking.py) —
  * no network in this sandbox, so these are deterministic and small
  * enough to broadcast.
  */
object Lexicon {

  /** Frames ↔ LUs ↔ FEs ↔ Wikidata properties (FIXTURES.md F2). */
  val lexicalDb: Seq[LexEntry] = Seq(
    LexEntry("Being_born", "bear",    "time",        "time", core = true,  "P569"),
    LexEntry("Being_born", "bear",    "place",       "item", core = false, "P19"),
    LexEntry("Death",      "die",     "time",        "time", core = true,  "P570"),
    LexEntry("Death",      "die",     "place",       "item", core = false, "P20"),
    LexEntry("Marriage",   "marry",   "partner",     "item", core = true,  "P26"),
    LexEntry("Occupation", "work",    "occupation",  "item", core = true,  "P106"),
    LexEntry("Education",  "study",   "institution", "item", core = true,  "P69"),
    LexEntry("Award",      "receive", "award",       "item", core = true,  "P166"),
    LexEntry("Residence",  "live",    "place",       "item", core = true,  "P551"),
    LexEntry("Work",       "join",    "employer",    "item", core = true,  "P108"),
    // quantity-valued FE (SURVEY §1.1 R8 obj_kind='quantity'): number of children
    LexEntry("Parenting",  "raise",   "count",       "quantity", core = true, "P1971"),
    // range-valued time FE: "resided in X during 1832–1901" -> start
    // (P580) + end (P582) statements via normDateMulti
    LexEntry("Residence_period", "reside", "place",  "item",      core = false, "P551"),
    LexEntry("Residence_period", "reside", "period", "timerange", core = true,  "P580")
  )

  /** lu lemma -> frame (unique per lemma in this lexicon). */
  val luToFrame: Map[String, String] =
    lexicalDb.map(e => e.lu_lemma -> e.frame).toMap

  /** lemma -> deterministic rank for strategy 121 tie-breaks
    * (SURVEY.md §7: lowest lu_rank, then lexicographic lemma).
    */
  val luRank: Map[String, Int] = {
    val order = Seq("bear", "die", "marry", "work", "study", "receive", "live", "join", "raise", "reside")
    order.zipWithIndex.toMap
  }

  /** Verb surface form -> (POS, lemma). Deterministic tagger lexicon
    * replacing TreeTagger (strephit/commons/pos_tag.py).
    */
  val verbLexicon: Map[String, (String, String)] = Map(
    "born"     -> ("VBN", "bear"),
    "bore"     -> ("VBD", "bear"),
    "died"     -> ("VBD", "die"),
    "dies"     -> ("VBZ", "die"),
    "married"  -> ("VBD", "marry"),
    "marries"  -> ("VBZ", "marry"),
    "worked"   -> ("VBD", "work"),
    "works"    -> ("VBZ", "work"),
    "studied"  -> ("VBD", "study"),
    "studies"  -> ("VBZ", "study"),
    "received" -> ("VBD", "receive"),
    "receives" -> ("VBZ", "receive"),
    "lived"    -> ("VBD", "live"),
    "lives"    -> ("VBZ", "live"),
    "joined"   -> ("VBD", "join"),
    "joins"    -> ("VBZ", "join"),
    "raised"   -> ("VBD", "raise"),
    "raises"   -> ("VBZ", "raise"),
    "resided"  -> ("VBD", "reside"),
    "resides"  -> ("VBZ", "reside"),
    "was"      -> ("VBD", "be"),
    "is"       -> ("VBZ", "be"),
    "were"     -> ("VBD", "be"),
    "been"     -> ("VBN", "be")
  )

  val months: Seq[String] = Seq(
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December")
  val monthIndex: Map[String, Int] =
    months.zipWithIndex.map { case (m, i) => m.toLowerCase -> (i + 1) }.toMap ++
      // abbreviations ("Jan", "Jan.", "Sept") tag as months too, so date
      // chunking groups "1 Jan 1884" even on corpora using short forms
      months.zipWithIndex.flatMap { case (m, i) =>
        val a = m.toLowerCase.take(3)
        Seq(a -> (i + 1), s"$a." -> (i + 1))
      } ++ Seq("sept" -> 9, "sept." -> 9)

  val stopwords: Set[String] = Set(
    "the", "a", "an", "of", "and", "in", "on", "at", "as", "to", "by",
    "for", "with", "from")

  // ---- entity pools (FIXTURES.md F3) -------------------------------------

  val firstNames: Seq[String] = Seq(
    "Alice", "Bruno", "Clara", "Dmitri", "Elena", "Felix", "Greta",
    "Henri", "Ingrid", "Jonas", "Katya", "Lorenzo", "Marta", "Nikolai",
    "Olga", "Pablo", "Quentin", "Rosa", "Stefan", "Teresa", "Umberto",
    "Vera", "Wilhelm", "Xenia", "Yusuf", "Zelda", "Anton", "Beatrice",
    "Carlos", "Dora", "Ernst", "Flora", "Gustav", "Hanna", "Ivan",
    "Johanna", "Karl", "Luisa", "Milan", "Nadia")

  val lastNames: Seq[String] = Seq(
    "Abram", "Bellini", "Castel", "Duarte", "Eisner", "Falco", "Gruber",
    "Hoffman", "Ivanov", "Jansen", "Keller", "Lombardi", "Moreau",
    "Novak", "Olsen", "Petrov", "Quirce", "Rossi", "Sander", "Toledo",
    "Ullman", "Vasquez", "Weber", "Ximena", "Yanez", "Zeller", "Auer",
    "Brandt", "Conti", "Dietrich", "Egger", "Fischer", "Graf", "Huber",
    "Iker", "Jung", "Klein", "Lang", "Meyer", "Nagel")

  val places: Seq[String] = Seq(
    "Paris", "Vienna", "Lisbon", "Krakow", "Madrid", "Naples", "Oslo",
    "Prague", "Riga", "Seville", "Turin", "Utrecht", "Valencia",
    "Warsaw", "Antwerp", "Bergen", "Cadiz", "Dresden", "Edinburgh",
    "Florence", "Geneva", "Hamburg", "Innsbruck", "Jena", "Kiel",
    "Leipzig", "Marseille", "Nantes", "Oporto", "Palermo", "Quimper",
    "Rotterdam", "Salzburg", "Toulouse", "Uppsala", "Verona",
    "Wittenberg", "York", "Zagreb", "Zurich")

  val occupations: Seq[String] = Seq(
    "writer", "painter", "composer", "sculptor", "architect",
    "botanist", "chemist", "engineer", "historian", "jurist",
    "linguist", "mathematician", "naturalist", "philosopher",
    "physician", "physicist", "poet", "printer", "teacher", "violinist")

  // NOTE: must be disjoint from `places` — an alias shared across etypes
  // would make best-link etype ambiguous for the gold generator.
  val institutions: Seq[String] = Seq(
    "Heidelberg", "Sorbonne", "Oxford", "Bologna", "Coimbra",
    "Salamanca", "Leiden", "Tubingen", "Gottingen", "Padua")

  /** FE -> expected linked-entity type, per frame (classification
    * gazetteer rule; reference analog: FE semantic-type constraints in
    * strephit/classification/classify.py custom rules).
    */
  val feEtype: Map[(String, String), String] = Map(
    ("Being_born", "place")       -> "place",
    ("Residence_period", "place") -> "place",
    ("Death", "place")            -> "place",
    ("Marriage", "partner")       -> "person",
    ("Occupation", "occupation")  -> "occupation",
    ("Education", "institution")  -> "institution",
    ("Award", "award")            -> "award",
    ("Residence", "place")        -> "place",
    ("Work", "employer")          -> "org")

  val awards: Seq[String] = Seq(
    "Copley", "Rumford", "Lalande", "Wollaston", "Keith", "Guy",
    "Baly", "Davy", "Royal", "Hughes")

  val orgs: Seq[String] = Seq(
    "Admiralty", "Conservatory", "Observatory", "Academy", "Mint",
    "Gazette", "Arsenal", "Seminary", "Institute", "Foundry")

  /** Full name pool: firstNames × lastNames, index-addressable. */
  val nameCount: Int = firstNames.length * lastNames.length
  def nameAt(i: Int): String = {
    val f = firstNames(i % firstNames.length)
    val l = lastNames((i / firstNames.length) % lastNames.length)
    s"$f $l"
  }

  /** Head names: the ~20 Zipf-dominant person aliases (skew fodder). */
  val headNameCount = 20

  // ---- alias dictionary (FIXTURES.md F3) ---------------------------------

  /** ~5k-row alias dictionary. Deterministic QIDs. Some person aliases
    * are ambiguous (two QIDs, distinct priors) to exercise best_link.
    */
  lazy val aliasDict: Seq[Alias] = {
    val persons = (0 until nameCount).flatMap { i =>
      val name = nameAt(i).toLowerCase
      val qid = s"Q${100000 + i}"
      val isHead = i < headNameCount
      val base = Alias(name, qid, prior = 0.9, is_head = isHead, etype = "person")
      // every 7th name is ambiguous: add a competing lower-prior QID
      if (i % 7 == 3)
        Seq(base, Alias(name, s"Q${900000 + i}", prior = 0.4, is_head = isHead, etype = "person"))
      else Seq(base)
    }
    val placeRows = places.zipWithIndex.map { case (p, i) =>
      Alias(p.toLowerCase, s"Q${2000 + i}", 0.95, is_head = false, etype = "place")
    }
    val occRows = occupations.zipWithIndex.map { case (o, i) =>
      Alias(o, s"Q${3000 + i}", 0.95, is_head = false, etype = "occupation")
    }
    val instRows = institutions.zipWithIndex.map { case (s, i) =>
      Alias(s.toLowerCase, s"Q${4000 + i}", 0.95, is_head = false, etype = "institution")
    }
    val awardRows = awards.zipWithIndex.map { case (a, i) =>
      Alias(a.toLowerCase, s"Q${5000 + i}", 0.95, is_head = false, etype = "award")
    }
    val orgRows = orgs.zipWithIndex.map { case (o, i) =>
      Alias(o.toLowerCase, s"Q${6000 + i}", 0.95, is_head = false, etype = "org")
    }
    persons ++ placeRows ++ occRows ++ instRows ++ awardRows ++ orgRows
  }

  /** Best link per alias under the pinned rule: max prior, tie -> min qid.
    * Used by the gold generator; the pipeline must reproduce it via the
    * best_link window (SURVEY.md §2.5).
    */
  lazy val bestLink: Map[String, Alias] =
    aliasDict.groupBy(_.alias_norm).map { case (k, vs) =>
      k -> vs.minBy(a => (-a.prior, a.qid))
    }

  /** Deterministic person index for a doc: Zipfian over head names for
    * ~30% of docs (head skew), uniform otherwise.
    */
  def personIndexFor(h: Long): Int = {
    if (Det.bounded(Det.mix64(h ^ 0x51ab), 10) < 3) Det.zipf(Det.mix64(h ^ 0x9e37), headNameCount)
    else Det.bounded(Det.mix64(h ^ 0x7fff), nameCount)
  }
}
