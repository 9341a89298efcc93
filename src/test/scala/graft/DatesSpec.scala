package graft

import graft.functions.Dates
import graft.fixtures.BioGen
import org.apache.spark.sql.functions._

/** F5 date-normalizer case table (FIXTURES.md) + range/quantity/render. */
class DatesSpec extends SparkSuite {
  import spark.implicits._

  private def norm(s: String): Option[(Int, Int, Int, Int)] = {
    val r = Seq(s).toDF("d").select(Dates.normDate($"d").as("t"))
      .select("t.year", "t.month", "t.day", "t.precision").collect()(0)
    if (r.isNullAt(0)) None
    else Some((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
  }

  test("F5 case table") {
    assert(norm("27 January 1832") === Some((1832, 1, 27, 11)))
    assert(norm("January 1832") === Some((1832, 1, 0, 10)))
    assert(norm("1832") === Some((1832, 0, 0, 9)))
    assert(norm("c. 1840") === Some((1840, 0, 0, 9)))
    assert(norm("1840s") === Some((1840, 0, 0, 8)))
    assert(norm("1832-01-27") === Some((1832, 1, 27, 11)))
    assert(norm("27/01/1832") === Some((1832, 1, 27, 11)))
    assert(norm("44 BC") === Some((-44, 0, 0, 9)))
    assert(norm("July 19, 1884") === Some((1884, 7, 19, 11)))
    assert(norm("early 1830s") === Some((1830, 0, 0, 8)))
    assert(norm("late 1830s") === Some((1830, 0, 0, 8)))
    assert(norm("19th century") === Some((1850, 0, 0, 7)))
    assert(norm("2nd century") === Some((150, 0, 0, 7)))
    assert(norm("1234567") === None) // bad-date reject fodder stays unparseable
    assert(norm("not a date") === None)
    assert(norm("") === None)
    // round-3 breadth: abbreviations, floruit, seasons
    assert(norm("Jan 1884") === Some((1884, 1, 0, 10)))
    assert(norm("Sept. 1884") === Some((1884, 9, 0, 10)))
    assert(norm("1 Jan 1884") === Some((1884, 1, 1, 11)))
    assert(norm("Dec. 25, 1884") === Some((1884, 12, 25, 11)))
    assert(norm("fl. 1850") === Some((1850, 0, 0, 9)))
    assert(norm("spring 1850") === Some((1850, 3, 0, 10)))
    assert(norm("Summer of 1850") === Some((1850, 6, 0, 10)))
    assert(norm("fall 1850") === Some((1850, 9, 0, 10)))
    assert(norm("Winter 1850") === Some((1850, 12, 0, 10)))
  }

  test("between-range produces two year values") {
    val rows = Seq("between 1832 and 1901").toDF("d")
      .select(explode(Dates.normDateMulti($"d")).as("t"))
      .select("t.year", "t.precision").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((1832, 9), (1901, 9)))
  }

  test("all BioGen surface variants round-trip") {
    for (v <- 0 until BioGen.dateVariants) {
      val (surface, tv) = BioGen.dateSurface(v, 1884, 7, 19)
      assert(norm(surface) === Some((tv.year, tv.month, tv.day, tv.precision)),
        s"variant $v surface '$surface'")
    }
  }

  test("ranges produce two year values") {
    val rows = Seq("1832–1901").toDF("d")
      .select(explode(Dates.normDateMulti($"d")).as("t"))
      .select("t.year", "t.precision").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((1832, 9), (1901, 9)))
    // single value -> one element
    assert(Seq("1850").toDF("d")
      .select(size(Dates.normDateMulti($"d"))).collect()(0).getInt(0) === 1)
    // junk -> empty
    assert(Seq("junk").toDF("d")
      .select(size(Dates.normDateMulti($"d"))).collect()(0).getInt(0) === 0)
  }

  test("quantity normalization") {
    val r = Seq("12.5 km", "1,200 m", "42", "junk").toDF("q")
      .select(Dates.normQuantity($"q").as("t"))
      .select($"t.amount".cast("string"), $"t.unit").collect()
    assert(r(0).getString(0).startsWith("12.5") && r(0).getString(1) === "km")
    assert(r(1).getString(0).startsWith("1200") && r(1).getString(1) === "m")
    assert(r(2).getString(0).startsWith("42") && r(2).isNullAt(1))
    assert(r(3).isNullAt(0))
  }

  test("QuickStatements time rendering") {
    val r = Seq("27 January 1832", "1840s", "44 BC").toDF("d")
      .select(Dates.renderTime(Dates.normDate($"d")).as("r")).collect()
    assert(r(0).getString(0) === "+1832-01-27T00:00:00Z/11")
    assert(r(1).getString(0) === "+1840-00-00T00:00:00Z/8")
    assert(r(2).getString(0) === "-0044-00-00T00:00:00Z/9")
  }

  test("render∘parse determinism: parse(render-surface) twice equal") {
    for (v <- 0 until BioGen.dateVariants; y <- Seq(1701, 1999); m <- Seq(1, 12); d <- Seq(1, 28)) {
      val (s1, _) = BioGen.dateSurface(v, y, m, d)
      assert(norm(s1) === norm(s1))
    }
  }
}
