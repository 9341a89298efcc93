package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

/** Substring-level dedup: window extraction, duplicate-key detection,
  * span removal byte-equality, pair view, and plan-shape guards.
  */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private val P = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens

  private def corpus = Seq(
    (1L, "aa bb cc dd ee ff gg hh unique one two three"),
    (2L, "xx yy " + P),
    (3L, "zz ww " + P),
    (4L, "short text")
  ).toDF("doc_id", "text")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("fused min!=max dup detection equals the standalone dupWindowKeys rule") {
    // the round-6 scrub fuses the >=2-distinct-docs test into a window
    // aggregate; the standalone dup-key-table operator must agree on
    // exactly which hashes are duplicated
    val wins = SpanDedup.windows(corpus)
    val standalone = SpanDedup.dupWindowKeys(wins).collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"h")
    val fused = wins
      .withColumn("__dup", min($"doc_id").over(w) =!= max($"doc_id").over(w))
      .filter($"__dup").select($"h").distinct().collect().map(_.getLong(0)).toSet
    assert(fused === standalone)
    assert(standalone.nonEmpty)
  }

  test("only the cross-doc shared window is duplicated; covered tokens are removed") {
    val out = SpanDedup.spanScrub(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 2: 10 tokens -> 3 windows; only the pure-passage window
    // (start 3) also occurs in doc 3 — the prefixed windows differ
    assert(out(2L).getInt(1) === 3)
    assert(out(2L).getInt(2) === 1)
    assert(out(2L).getInt(3) === 8)
    assert(out(2L).getString(4) === md5Hex("xx yy"))
    assert(out(3L).getString(4) === md5Hex("zz ww"))
    // docs 1 and 4 are untouched: scrubbed text = normalized tokens
    assert(out(1L).getInt(2) === 0)
    assert(out(1L).getString(4) ===
      md5Hex("aa bb cc dd ee ff gg hh unique one two three"))
    // doc 4 has < W tokens: zero windows, text passes through
    assert(out(4L).getInt(1) === 0)
    assert(out(4L).getString(4) === md5Hex("short text"))
  }

  test("pair view surfaces the sharing docs (and only them)") {
    val pairs = SpanDedup.spanDupPairs(corpus, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((2L, 3L, 1)))
  }

  test("planted boilerplate fires on the testdata corpus") {
    val docs = SpanDedup.withPlantedPassages(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val planted = SpanDedup.spanScrub(docs)
      .filter(col("doc_id") % 25 === 3)
      .agg(min(col("n_dup_windows")).as("min_dup")).first().getInt(0)
    // the 12-token passage contributes 5 windows shared by every
    // planted doc (plus whatever the salad duplicates naturally)
    assert(planted >= 5)
  }

  test("scrub and pair plans: equi-joins only, no cartesian") {
    import org.apache.spark.sql.execution.SimpleMode
    for (df <- Seq(SpanDedup.spanScrub(corpus),
                   SpanDedup.spanDupPairs(corpus))) {
      val p = df.queryExecution.explainString(SimpleMode)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("committed windows index: write + append roundtrip equals inline extraction") {
    val dir = java.nio.file.Files.createTempDirectory("span_idx").toString
    try {
      val table = s"$dir/windows"
      // base build over part of the corpus, crawl-increment append of
      // the rest — the two maintenance paths SparkEntry exercises
      SpanDedup.writeWindows(corpus.filter($"doc_id" <= 2), table)
      SpanDedup.appendWindows(corpus.filter($"doc_id" >= 3), table, "incr")
      val fromIndex = SpanDedup.readWindows(spark, table).collect()
        .map(_.toSeq).sortBy(_.mkString("|"))
      val inline = SpanDedup.windows(corpus).collect()
        .map(_.toSeq).sortBy(_.mkString("|"))
      assert(fromIndex.toSeq === inline.toSeq)
      // and the scrub over the committed table is byte-equal to inline
      val a = SpanDedup.spanScrubOver(corpus, SpanDedup.readWindows(spark, table))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = SpanDedup.spanScrub(corpus).collect()
        .map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq === b.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
        _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
    }
  }

  test("scrub output is identical across partition layouts") {
    val a = SpanDedup.spanScrub(corpus.repartition(1)).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val b = SpanDedup.spanScrub(corpus.repartition(7)).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }
}
