package graft.tools

import graft.ml.LinearModel
import graft.model.{Doc, Span}
import graft.operators.{Classification, Extraction}
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession

/** Dev tool: print learned-vs-rule classification mismatches. */
object MlDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lm = LinearModel.default
    val rule = Classification.defaultModel
    println(s"classes: ${lm.classes.mkString(",")}")

    val docs = Corpus.fixtureCorpus(spark, 120)
    val lus = Extraction.matchN2n(Extraction.sentences(docs)).collect()
    var shown = 0
    lus.foreach { s =>
      val r = rule.classify(s)
      val l = Classification.classifyLearnedOne(s, lm, rule)
      def c(x: Option[graft.model.ClassifiedSentence]) =
        x.map(cs => (cs.subj_chunk, cs.chunks.map(ch => (ch.fe, ch.text)).toSet))
      if (c(r) != c(l) && shown < 8) {
        shown += 1
        println(s"== MISMATCH ${s.doc_id}/${s.sentence_offset} lu=${s.lu}")
        println(s"   text : ${s.text}")
        println(s"   rule : ${c(r)}")
        println(s"   learn: ${c(l)}")
        val labels = lm.tagTokens(s.tokens.toIndexedSeq, s.lu, rule.gazEtype.get)
        println(s"   tags : ${s.tokens.map(_.word).zip(labels).mkString(" ")}")
      }
    }
    println(s"total=${lus.length}")

    val g = Doc("g1", Seq(Span("text",
      "Alice Abram was born in Paris on 27 January 1832 near the waterfront .", null, 0)))
    val gl = Extraction.matchN2n(Extraction.sentences(Seq(g).toDS())).collect()(0)
    val labels = lm.tagTokens(gl.tokens.toIndexedSeq, gl.lu, rule.gazEtype.get)
    println(s"GEN tags: ${gl.tokens.map(_.word).zip(labels).mkString(" ")}")
    println(s"GEN out : ${Classification.classifyLearnedOne(gl, lm, rule)}")
    spark.stop()
  }
}
