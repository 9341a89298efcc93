package graft.functions

import graft.fixtures.Lexicon
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date / quantity canonicalization as pure Catalyst expression chains
  * (no UDF — codegen-friendly; SURVEY.md §2.2 `norm_date`).
  * Reference analog: public Wikidata/StrepHit
  * strephit/commons/date_normalizer.py + resources/regexes.yml —
  * there a YAML regex bank with Python transform snippets; here a
  * `when`/`regexp_extract` chain compiled once into the plan.
  *
  * Output: struct<year:int, month:int, day:int, precision:int>
  * (Wikidata precision: 11=day, 10=month, 9=year, 8=decade; absent
  * components are 0). Unparseable -> null struct.
  */
object Dates {

  /** Month surface forms: full names plus 3-letter abbreviations with
    * an optional trailing dot ("Jan 1884", "Jan. 1884") and the common
    * 4-letter "Sept" — the abbreviation classes of the reference's
    * public regexes.yml date bank.
    */
  private val monthAbbrs =
    Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec")
  private val monthAlt =
    (Lexicon.months ++ Seq("Sept\\.?") ++ monthAbbrs.map(_ + "\\.?")).mkString("|")
  // lookup order matters: position 1..12 full, 13..24 abbrev, 25 = sept
  private val monthArr: Column = typedlit(
    Lexicon.months.map(_.toLowerCase(java.util.Locale.ROOT)) ++ monthAbbrs.map(_.toLowerCase(java.util.Locale.ROOT)) :+ "sept")

  private def monthNum(tok: Column): Column = {
    val idx = array_position(monthArr,
      regexp_replace(lower(tok), "\\.$", "")).cast("int")
    when(idx === 25, lit(9)).otherwise((idx - 1) % 12 + 1)
  }

  private def tv(y: Column, m: Column, d: Column, p: Int): Column =
    struct(y.cast("int").as("year"), m.cast("int").as("month"),
      d.cast("int").as("day"), lit(p).as("precision"))

  /** Normalize a date surface form to the canonical time struct.
    * Pattern bank mirrors the breadth of the reference's regexes.yml
    * (public StrepHit commons/resources/regexes.yml): ISO, slashed,
    * day-month-year, US month-day-year, month-year, circa, decades
    * with early/late modifiers, centuries (precision 7), BC years,
    * bare years.
    */
  def normDate(c0: Column): Column = {
    val c = trim(c0)
    val isoRe = "^(\\d{4})-(\\d{2})-(\\d{2})$"
    val slashRe = "^(\\d{1,2})/(\\d{1,2})/(\\d{4})$"
    val dmyRe = s"^(\\d{1,2}) ($monthAlt) (\\d{1,4})$$"
    val mdyRe = s"^($monthAlt) (\\d{1,2}), (\\d{1,4})$$" // US form "July 19, 1884"
    val myRe = s"^($monthAlt) (\\d{1,4})$$"
    val circaRe = "^c\\. (\\d{1,4})$"
    val flRe = "^fl\\. (\\d{1,4})$" // floruit — pinned: year precision, like circa
    // seasons — pinned: season -> its opening month (spring=3, summer=6,
    // autumn/fall=9, winter=12), month precision
    val seasonRe = "(?i)^(spring|summer|autumn|fall|winter)(?: of)? (\\d{3,4})$"
    val decadeRe = "^(?:(?:early|late) )?(\\d{2,4})0s$" // "1830s", "early 1830s"
    val centuryRe = "^(\\d{1,2})(?:st|nd|rd|th) century$" // pinned: mid-century year, precision 7
    val bcRe = "^(\\d{1,4}) BC$"
    val yRe = "^(\\d{3,4})$"
    def seasonMonth(tok: Column): Column = {
      val t = lower(tok)
      when(t === "spring", 3).when(t === "summer", 6)
        .when(t === "winter", 12).otherwise(9) // autumn | fall
    }
    when(c.rlike(isoRe),
      tv(regexp_extract(c, isoRe, 1), regexp_extract(c, isoRe, 2),
        regexp_extract(c, isoRe, 3), 11))
      .when(c.rlike(slashRe),
        tv(regexp_extract(c, slashRe, 3), regexp_extract(c, slashRe, 2),
          regexp_extract(c, slashRe, 1), 11))
      .when(c.rlike(dmyRe),
        tv(regexp_extract(c, dmyRe, 3), monthNum(regexp_extract(c, dmyRe, 2)),
          regexp_extract(c, dmyRe, 1), 11))
      .when(c.rlike(mdyRe),
        tv(regexp_extract(c, mdyRe, 3), monthNum(regexp_extract(c, mdyRe, 1)),
          regexp_extract(c, mdyRe, 2), 11))
      .when(c.rlike(myRe),
        tv(regexp_extract(c, myRe, 2), monthNum(regexp_extract(c, myRe, 1)),
          lit(0), 10))
      .when(c.rlike(circaRe),
        tv(regexp_extract(c, circaRe, 1), lit(0), lit(0), 9))
      .when(c.rlike(flRe),
        tv(regexp_extract(c, flRe, 1), lit(0), lit(0), 9))
      .when(c.rlike(seasonRe),
        tv(regexp_extract(c, seasonRe, 2),
          seasonMonth(regexp_extract(c, seasonRe, 1)), lit(0), 10))
      .when(c.rlike(decadeRe),
        tv(concat(regexp_extract(c, decadeRe, 1), lit("0")), lit(0), lit(0), 8))
      .when(c.rlike(centuryRe),
        tv((regexp_extract(c, centuryRe, 1).cast("int") - 1) * 100 + 50,
          lit(0), lit(0), 7))
      .when(c.rlike(bcRe),
        tv(-regexp_extract(c, bcRe, 1).cast("int"), lit(0), lit(0), 9))
      .when(c.rlike(yRe), tv(regexp_extract(c, yRe, 1), lit(0), lit(0), 9))
      .otherwise(lit(null).cast(
        "struct<year:int,month:int,day:int,precision:int>"))
  }

  /** Year-range surfaces "1832-1901" / "1832–1901" / "between 1832 and
    * 1901" -> array of two year structs; single values -> 1-element
    * array (SURVEY.md F5 ranges).
    */
  def normDateMulti(c0: Column): Column = {
    val c = trim(c0)
    val rangeRe = "^(\\d{3,4})\\s*[-–]\\s*(\\d{3,4})$"
    val betweenRe = "(?i)^between (\\d{3,4}) and (\\d{3,4})$"
    def years(re: String) =
      array(tv(regexp_extract(c, re, 1), lit(0), lit(0), 9),
        tv(regexp_extract(c, re, 2), lit(0), lit(0), 9))
    when(c.rlike(rangeRe), years(rangeRe))
      .when(c.rlike(betweenRe), years(betweenRe))
      .otherwise(filter(array(normDate(c)), x => x.isNotNull))
  }

  /** Quantity surface ("12", "12.5", "12.5 km", "1,200 m") ->
    * struct<amount:decimal(38,10), unit:string>; unparseable -> null.
    */
  def normQuantity(c0: Column): Column = {
    val c = trim(c0)
    val re = "^([0-9][0-9,]*(?:\\.[0-9]+)?)\\s*([a-zA-Z%]*)$"
    when(c.rlike(re),
      struct(
        regexp_replace(regexp_extract(c, re, 1), ",", "")
          .cast("decimal(38,10)").as("amount"),
        nullif(regexp_extract(c, re, 2), lit("")).as("unit")))
      .otherwise(lit(null).cast("struct<amount:decimal(38,10),unit:string>"))
  }

  /** Render the canonical time struct to Wikidata/QuickStatements form:
    * +1832-01-27T00:00:00Z/11 (absent components rendered as 00/01 per
    * QS convention of zero-filling below the precision).
    */
  def renderTime(t: Column): Column = {
    val sign = when(t.getField("year") < 0, lit("-")).otherwise(lit("+"))
    val y = lpad(abs(t.getField("year")).cast("string"), 4, "0")
    val m = lpad(greatest(t.getField("month"), lit(0)).cast("string"), 2, "0")
    val d = lpad(greatest(t.getField("day"), lit(0)).cast("string"), 2, "0")
    when(t.isNull, lit(null).cast("string"))
      .otherwise(concat(sign, y, lit("-"), m, lit("-"), d,
        lit("T00:00:00Z/"), t.getField("precision").cast("string")))
  }
}
