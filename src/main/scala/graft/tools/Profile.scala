package graft.tools

import graft.{Bench, Pipeline}
import graft.operators._
import graft.sources.Corpus

/** Dev tool: per-stage wall times for the flagship pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t(name: String)(body: => Long): Unit = {
      body // warm
      val s = Bench.medianOf((1 to 3).map(_ => Bench.time(body)))
      println(f"PROFILE $name%-16s $s%8.3f s")
    }
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "1").toInt
    val cpus = spark.sparkContext.defaultParallelism
    val docs =
      if (repl > 1)
        Corpus.spansTableReplicated(spark, sfDir, repl)
          .repartition(cpus * 2, org.apache.spark.sql.functions.col("doc_id"))
      else Pipeline.docsFor(spark, sfDir)
    t("gen_spans") { docs.count() }
    t("sentences") { Extraction.sentences(docs).count() }
    t("match_n2n") { Extraction.matchN2n(Extraction.sentences(docs)).count() }
    val bc = spark.sparkContext.broadcast(Classification.defaultModel)
    t("classify") { Classification.classify(
      Extraction.matchN2n(Extraction.sentences(docs)), bc).count() }
    t("text_triples") { Pipeline.textPath(docs).count() }
    t("semi_triples") { Serialize.semiTriples(Corpus.semiDocs(spark, sfDir)).count() }
    t("full") { Pipeline.triples(spark, sfDir).count() }
    spark.stop()
  }
}
