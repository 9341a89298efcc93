package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS parallelism and prints ONE
  * JSON line (also written to SPARK_GRAFT_BENCH_OUT, default
  * BENCH_LAST.json — sbt [info]-prefixes stdout and broke the driver's
  * parse in round 1).
  *
  * NOISE CONTROL (round-4 VERDICT "What's wrong" #1: the same HEAD
  * measured 23.5 s / 63.3 s / 88.7 s / 96.1 s across sessions on this
  * shared host — invisible external load, 0% reported steal — so a
  * single-sweep wall-clock number cannot gate anything):
  *   - every headline key runs K (default 5, SPARK_GRAFT_BENCH_REPS)
  *     INTERLEAVED reps — sweep 1 times all keys, then sweep 2, … — so
  *     a load spike hits one sweep of every key, not every rep of one
  *     key; the reported per-key number is the MIN across sweeps (the
  *     only estimator robust to one-sided contention noise);
  *   - a fixed-shape pure-Spark CALIBRATION job (canned range→groupBy→
  *     agg, same JVM, zero data dependence) is timed once per sweep;
  *     its min and all samples land in the JSON next to the committed
  *     quiet-host reference (CalibRefSec), so any reader can normalize
  *     a run across host weather: queries_calibrated = min / load,
  *     load = calib_min / CalibRefSec;
  *   - the run flags itself (`host_noisy`) when calibration exceeds
  *     the reference band — a noisy run is labeled, not trusted.
  * The first sweep doubles as JIT/codegen/broadcast warm-up and also
  * absorbs the memoized one-time index builds (IVF centroids, the
  * committed dedup index), so `queries` is the steady-state cost;
  * sweep-1 raw times are emitted separately as `queries_first` for the
  * cold view.
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
    "q_dedup_incremental", "q_repetition",
    // round 5: substring-level span dedup + BPE token counting, the
    // committed-windows scrub (sweep 1 pays the one-time index build;
    // min-of-K reflects the steady state, like q_dedup_incremental),
    // and the end-to-end curation funnel
    "q_span_dedup", "q_bpe_tokens", "q_span_dedup_indexed",
    "q_curation_funnel")

  /** Quiet-host reference time of `calibrate` on THIS host class
    * (local[32]; min of 9 warm samples across two JVMs at external
    * load-avg ~1.5 was 0.717 s at round-5 HEAD — 0.70 is the committed
    * reference). Committed so every future BENCH_LAST.json is
    * renormalizable: an external reader computes load = calib_sec /
    * CalibRefSec and divides the raw per-key numbers by it; the
    * absolute value only shifts the normalization constant, never the
    * cross-run comparison.
    */
  val CalibRefSec = 0.70

  /** Fixed-shape calibration job: canned range → modulo key → hash agg.
    * Pure generated data (no IO), wide enough to exercise all cores and
    * one shuffle — the known-cost yardstick that separates code speed
    * from host weather.
    */
  def calibrate(spark: SparkSession): Double = time {
    spark.range(0L, 64L * 1000 * 1000, 1L, 32)
      .select(pmod(col("id"), lit(9973L)).as("k"), col("id"))
      .groupBy(col("k"))
      .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
      .agg(sum(col("s")), sum(col("n")))
      .collect()
  }

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
    // collision-proof path: the sanitizer maps distinct dirs ('/a/b-c'
    // vs '/a/b_c') to one string, so a raw-dir hash rides along
    // (round-4 advisor on the same pattern in Pipeline.rejected)
    val base = s"${sys.props("java.io.tmpdir")}/graft_bench_" +
      sfDir.replaceAll("[^a-zA-Z0-9.]", "_") + "_" +
      java.lang.Long.toHexString(graft.util.Det.hashStr(sfDir))
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
      .repartition(Pipeline.ingestPartitions(spark), col("doc_id"))
    val semi = spark.read.parquet(semiPath).as[graft.model.SemiDoc]
    Pipeline.triplesOver(docs, semi).count()
  }

  /** Result of an interleaved min-of-K run. */
  case class Result(minSec: Map[String, Double], firstSec: Map[String, Double],
                    calibSamples: Seq[Double], docs: Long)

  /** K interleaved sweeps over every headline key; per-key MIN + the
    * sweep-1 (cold) times + one calibration sample per sweep.
    */
  def run(spark: SparkSession, sfDir: String, reps: Int): Result = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val (docsPath, semiPath) = materialize(spark, sfDir) // untimed setup
    val mins = scala.collection.mutable.Map[String, Double]()
    val firsts = scala.collection.mutable.Map[String, Double]()
    val calib = scala.collection.mutable.ArrayBuffer[Double]()
    calibrate(spark) // untimed JIT/codegen warm-up of the yardstick itself
    for (sweep <- 1 to reps) {
      calib += calibrate(spark)
      headline.foreach { k =>
        val t =
          if (k == "pipe_triples") time(flagship(spark, docsPath, semiPath))
          else time(SparkEntry.queries(k)(spark, sfDir).count())
        if (sweep == 1) firsts(k) = t
        mins(k) = math.min(mins.getOrElse(k, Double.MaxValue), t)
      }
    }
    Result(mins.toMap, firsts.toMap, calib.toSeq, docs)
  }

  private def jmap(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = session(cpus)
    val r = run(spark, sfDir, reps)
    val total = r.minSec.values.sum
    val calibMin = r.calibSamples.min
    val load = calibMin / CalibRefSec
    val hostNoisy = load > 1.5
    val calibrated = r.minSec.map { case (k, v) => k -> v / load }
    val flag = r.minSec("pipe_triples")
    val docsPerSec = r.docs / flag
    val calibSamples = r.calibSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(r.minSec)},""" +
      f""""queries_first":${jmap(r.firstSec)},"queries_calibrated":${jmap(calibrated)},""" +
      f""""reps":$reps,"calib_sec":$calibMin%.3f,"calib_samples":$calibSamples,""" +
      f""""calib_ref_sec":$CalibRefSec%.3f,"host_load":$load%.3f,"host_noisy":$hostNoisy,""" +
      f""""total_calibrated":${total / load}%.3f,""" +
      f""""sf":"$sfDir","cpus":$cpus,"docs":${r.docs},"pipeline_docs_per_sec":$docsPerSec%.1f,""" +
      f""""pipeline_docs_per_sec_calibrated":${r.docs / (flag / load)}%.1f}"""
    println(line)
    // survive sbt's [info] stdout prefixing: also write the line to a file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
