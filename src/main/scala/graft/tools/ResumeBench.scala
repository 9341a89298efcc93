package graft.tools

import graft.Pipeline
import graft.operators.Checkpoint
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BASELINE.md "resume cost" target: a resumed run after
  * a half-way crash should pay ≈ only the missing buckets' compute.
  *
  * Protocol (mirrors CheckpointSpec's kill/rerun semantics):
  *   1. warm-up full run (JIT/codegen, not timed),
  *   2. t_full   = fresh full runStage over all buckets,
  *   3. crash sim: fresh dirs; stage runs with only the lower half of
  *      the doc_id-hash buckets, then the checkpoint table is rewritten
  *      to keep ONLY those buckets' rows (the empty upper buckets would
  *      otherwise be marked ok-with-zero, which a real crash never
  *      commits),
  *   4. t_resume = runStage over ALL docs against that checkpoint —
  *      the anti-join schedules only the upper half,
  *   5. identity: resumed committed table row count == full run's.
  * Prints one JSON line; exits nonzero if outputs diverge.
  */
object ResumeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-resume-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buckets = 32
    val base = java.nio.file.Files.createTempDirectory("resume_bench").toString
    // the 500k-doc replicated spans table (same input as the scaling
    // protocol): at raw sf0.1 (5k docs) fixed overhead dominates and a
    // half-resume measures planning time, not compute
    val spansDir = Scaling.ensureSpansTable(sfDir)
    val docs = spark.read.parquet(spansDir).as[graft.model.Doc]
    val nDocs = docs.count()

    def fullRun(tag: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = Checkpoint.runStage(docs, s"$base/ckpt_$tag", "rb", "triples",
        buckets, s"$base/out_$tag")(d => Pipeline.textPath(d))
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    fullRun("warmup") // JIT + codegen, untimed
    val (tFull, nFull) = fullRun("full")

    // crash simulation: lower half of the buckets completed, then died
    val lower = docs
      .withColumn("b", Checkpoint.bucketOf(buckets))
      .filter($"b" < buckets / 2).drop("b").as[graft.model.Doc]
    Checkpoint.runStage(lower, s"$base/ckpt_crashed", "rb", "triples",
      buckets, s"$base/out_resume")(d => Pipeline.textPath(d))
    Checkpoint.readTable(spark, s"$base/ckpt_crashed")
      .filter($"partition_id" < buckets / 2)
      .write.parquet(s"$base/ckpt_resume")

    val (tResume, nResumed) = {
      val t0 = System.nanoTime()
      val out = Checkpoint.runStage(docs, s"$base/ckpt_resume", "rb", "triples",
        buckets, s"$base/out_resume")(d => Pipeline.textPath(d))
      val n = out.count() // runStage returns a read of the committed table
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val identical = nResumed == nFull

    println(f"""{"metric":"resume_cost","t_full_sec":$tFull%.3f,"t_resume_sec":$tResume%.3f,"resume_frac":${tResume / tFull}%.3f,"docs":$nDocs,"rows_full":$nFull,"rows_resumed":$nResumed,"identical":$identical}""")
    spark.stop()
    if (!identical) sys.exit(1)
  }
}
