package graft.tools

import graft.operators.Dedup
import graft.Bench
import org.apache.spark.sql.functions._

/** Evidence for the committed-dedup-index claim (round-3 VERDICT
  * "Next" #3): with the corpus side reading a write-once index table,
  * the per-increment cost must stay ~flat as the corpus grows — the
  * increment pays for its own signatures plus an equi-join against the
  * matching index buckets, never for re-minhashing the corpus.
  *
  * Protocol: for each SF, build (untimed per-corpus, reported once)
  * the banded-signature index of the FULL documents table, then time
  * incremental pair detection of the SAME-SIZE batch (20 planted
  * twins) against the committed index — warm-up + median of 3.
  * Prints one JSON line; numbers recorded in BASELINE.md.
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def measure() = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map { sf =>
      val raw = spark.read.parquet(s"$sf/documents.parquet")
      val nDocs = raw.count()
      val table = java.nio.file.Files.createTempDirectory("incr_idx").toString + "/idx"
      val tIdx = Bench.time(Dedup.writeIndex(raw, table))
      // the increment: 20 planted twins — identical batch size per SF
      val batch = Dedup.withPlantedDups(raw, 20).filter(col("doc_id") >= 1000000L)
      def run(): Unit =
        Dedup.incrementalPairsIndexed(Dedup.readIndex(spark, table), batch, 0.6)
          .write.mode("overwrite").format("noop").save()
      run() // warm-up
      val t = Bench.medianOf((1 to 3).map(_ => Bench.time(run())))
      (sf, nDocs, tIdx, t)
    }
    measure() // full throwaway pass: JIT/codegen warm-up must not favor
              // whichever SF happens to run later
    val results = measure()
    val json = results.map { case (sf, n, ti, t) =>
      s""""${sf.split('/').last}":{"corpus_docs":$n,"index_build_sec":${math.round(ti * 1000) / 1000.0},"increment_sec":${math.round(t * 1000) / 1000.0}}"""
    }.mkString("{", ",", s""","batch_docs":20,"ratio":${math.round(results(1)._4 / results(0)._4 * 100) / 100.0}}""")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("INCR_BENCH.json"), json + "\n")
    spark.stop()
  }
}
