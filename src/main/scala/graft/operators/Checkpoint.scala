package graft.operators

import graft.model.{CheckpointRow, Doc}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition lineage + metrics checkpoint table enabling resumable
  * runs (BASELINE.json north_rule). The unit of resume is the doc_id
  * hash bucket: docs are assigned `bucket = pmod(hash(doc_id), P)`;
  * after a stage commits a bucket, a checkpoint row is appended; a
  * resumed run anti-joins completed buckets (SURVEY.md §2.4 J6) and
  * recomputes only the missing ones.
  */
object Checkpoint {

  def bucketOf(p: Int) = pmod(hash(col("doc_id")), lit(p))

  /** Compute per-bucket lineage/metrics rows for a stage output.
    * If the stage output carries a boolean `sig_ok` column (the span
    * invariant, Serialize.spanInvariant), the bucket is ok only when
    * every row passed; outputs without the column record `true`.
    */
  def stageMetrics(triples: DataFrame, runId: String, stage: String,
                   buckets: Int, wallMs: Long): DataFrame = {
    val sigOk: org.apache.spark.sql.Column =
      if (triples.columns.contains("sig_ok")) min(col("sig_ok")) else min(lit(true))
    triples
      .withColumn("bucket", bucketOf(buckets))
      .groupBy(col("bucket"))
      .agg(
        countDistinct(col("doc_id")).as("doc_count"),
        count(lit(1)).as("triple_count"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sigOk.as("spans_sig_ok"))
      .select(
        lit(runId).as("run_id"), lit(stage).as("stage"),
        col("bucket").cast("int").as("partition_id"),
        col("doc_count"), col("triple_count"), col("min_doc"), col("max_doc"),
        lit(wallMs).as("wall_ms"), col("spans_sig_ok"),
        lit("ok").as("status"))
  }

  /** Append checkpoint rows to the checkpoint table. */
  def append(rows: DataFrame, table: String): Unit =
    rows.write.mode(SaveMode.Append).parquet(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)

  /** Resume filter: keep only docs whose bucket has NO ok checkpoint
    * row for (runId, stage) — a left_anti join on the bucket key.
    */
  def pendingDocs(docs: Dataset[Doc], checkpoint: DataFrame,
                  runId: String, stage: String, buckets: Int): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val done = checkpoint
      .filter(col("run_id") === runId && col("stage") === stage && col("status") === "ok")
      .select(col("partition_id").as("bucket")).distinct()
    docs.withColumn("bucket", bucketOf(buckets))
      .join(broadcast(done), Seq("bucket"), "left_anti")
      .drop("bucket")
      .as[Doc]
  }

  /** Run a stage with checkpointing: compute triples for pending
    * buckets only, append their metrics, return the new triples.
    */
  def runStage(docs: Dataset[Doc], checkpointTable: String, runId: String,
               stage: String, buckets: Int)
              (body: Dataset[Doc] => DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val existing =
      try readTable(spark, checkpointTable)
      catch { case _: Throwable =>
        import spark.implicits._
        spark.emptyDataset[CheckpointRow].toDF()
      }
    val pending = pendingDocs(docs, existing, runId, stage, buckets)
    val t0 = System.currentTimeMillis()
    val out = body(pending)
    append(stageMetrics(out, runId, stage, buckets, System.currentTimeMillis() - t0),
      checkpointTable)
    out
  }
}
