package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Frozen-BPE tokenizer: learner determinism, encoder correctness, and
  * the committed merge table.
  */
class BpeSpec extends SparkSuite {

  test("learner picks the most frequent pair, lexicographic tie-break") {
    val freqs = Seq(("ab", 10L), ("abc", 5L))
    // pair counts: (a,b)=15, (b,</w>)=10, (b,c)=5, (c,</w>)=5
    val merges = Bpe.learn(freqs, 3)
    assert(merges.head === ("a", "b"))
    assert(merges(1) === ("ab", "</w>")) // now (ab,</w>)=10 beats (ab,c)=5
    // deterministic: same input, same merges
    assert(Bpe.learn(freqs, 3) === merges)
  }

  test("encoder applies merges by rank and caches consistently") {
    val enc = new Bpe.Encoder(Seq(("a", "b"), ("ab", "</w>")))
    assert(enc.encodeWord("ab") === Vector("ab</w>"))
    assert(enc.encodeWord("abc") === Vector("ab", "c", "</w>"))
    assert(enc.countWord("abc") === 3)
    assert(enc.countWord("abc") === 3) // cached path
    assert(enc.countText("ab abc ab") === 1 + 3 + 1)
    assert(enc.countText(null) === 0)
  }

  test("committed merge table loads and is non-degenerate on the corpus") {
    assert(Bpe.defaultMerges.length === graft.tools.BpeTrain.NMerges)
    val df = graft.operators.TextAnalysis.bpeTokenCounts(spark, "/root/testdata/sf0.001")
    val r = df.agg(
      min(col("n_bpe_tokens") - col("n_words")).as("min_diff"),
      avg(col("bpe_per_word")).as("avg_ratio")).first()
    // every word is >= 1 subword, and the 40-merge table must actually
    // SPLIT (a saturated table would make bpe_per_word exactly 1.0 and
    // the whole operator degenerate to word counting)
    assert(r.getInt(0) >= 0)
    assert(r.getDouble(1) > 1.5, s"avg bpe/word ${r.getDouble(1)} — table saturated?")
  }

  test("subword counts are identical across partition layouts") {
    val d = graft.operators.TextAnalysis.bpeTokenCounts(spark, "/root/testdata/sf0.001")
    val a = d.repartition(1).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = d.repartition(5).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }
}
