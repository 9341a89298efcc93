package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS parallelism and prints ONE
  * JSON line (also written to SPARK_GRAFT_BENCH_OUT, default
  * BENCH_LAST.json — sbt [info]-prefixes stdout and broke the driver's
  * parse in round 1). The flagship number is pipeline docs/sec
  * (BASELINE.md): the spans table is materialized to parquet ONCE
  * (untimed setup — fixture synthesis is not pipeline work), then
  * warm-up run + median of 3 timed runs read from the table.
  */
object Bench {

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Headline query keys (subset of SparkEntry.queries; pipe_eval is
    * excluded — it recomputes the pipeline against gold and would
    * double-count the flagship time).
    */
  val headline: Seq[String] = Seq(
    "pipe_triples", "q_tf", "q_lu_rank", "q_join_broadcast", "q_join_salted",
    "q_window_rank", "q_dedup_exact", "q_minhash_buckets", "q_simhash",
    "q_ann_brute", "q_ann_lsh", "q_ann_ivf", "q_quality", "q_media_stats",
    "q_cosine_dup", "q_dedup_clusters",
    // round 4: incremental ingest through the committed index — the
    // FIRST timed call includes the one-time index build, exactly as
    // q_ann_ivf's number includes its centroid build (per-increment
    // cost alone is measured by tools/IncrementalBench) — and the
    // repetition quality scan
    "q_dedup_incremental", "q_repetition")

  def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** Materialize the interleaved spans table + semi sidecar to parquet
    * (untimed setup): the flagship must measure the pipeline reading a
    * committed table, not the fixture synthesis (round-1 VERDICT perf
    * note). Returns (docsPath, semiPath).
    */
  def materialize(spark: SparkSession, sfDir: String): (String, String) = {
    val base = s"${sys.props("java.io.tmpdir")}/graft_bench_${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    val docsPath = s"$base/docs"
    val semiPath = s"$base/semi"
    sources.Corpus.spansTable(spark, sfDir).write.mode("overwrite").parquet(docsPath)
    sources.Corpus.semiDocs(spark, sfDir).write.mode("overwrite").parquet(semiPath)
    (docsPath, semiPath)
  }

  /** The flagship pipeline reading from the materialized table. */
  def flagship(spark: SparkSession, docsPath: String, semiPath: String): Long = {
    import spark.implicits._
    val docs = spark.read.parquet(docsPath).as[graft.model.Doc]
      .repartition(Pipeline.ingestPartitions(spark), org.apache.spark.sql.functions.col("doc_id"))
    val semi = spark.read.parquet(semiPath).as[graft.model.SemiDoc]
    Pipeline.triplesOver(docs, semi).count()
  }

  /** Time every headline query once (plus median-of-3 for the
    * flagship); returns (per-query secs, flagship median, docs count).
    */
  def run(spark: SparkSession, sfDir: String): (Map[String, Double], Double, Long) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val (docsPath, semiPath) = materialize(spark, sfDir) // untimed setup
    // warm-up: JIT + codegen + broadcast paths
    flagship(spark, docsPath, semiPath)
    val flagshipRuns = (1 to 3).map { _ =>
      time(flagship(spark, docsPath, semiPath))
    }
    val others = headline.filterNot(_ == "pipe_triples").map { k =>
      k -> time(SparkEntry.queries(k)(spark, sfDir).count())
    }
    val flag = medianOf(flagshipRuns)
    ((others :+ ("pipe_triples" -> flag)).toMap, flag, docs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)
    val (queries, flagshipSec, docs) = run(spark, sfDir)
    val docsPerSec = docs / flagshipSec
    val qs = queries.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queries.values.sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"docs":$docs,"pipeline_docs_per_sec":$docsPerSec%.1f}"""
    println(line)
    // survive sbt's [info] stdout prefixing: also write the line to a file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
