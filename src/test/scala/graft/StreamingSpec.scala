package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Structured-Streaming surface: streaming triples == batch triples on
  * the same input; windowed event aggregation runs under AvailableNow.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming pipeline output equals batch text-path output") {
    val dir = java.nio.file.Files.createTempDirectory("strm").toString
    val sfDir = "/root/testdata/sf0.001"
    val n = Streaming.runAvailableNow(spark, s"$sfDir/documents.parquet",
      s"$dir/ckpt", s"$dir/out")
    assert(n > 0)
    val streamed = spark.read.parquet(s"$dir/out")
      .select($"doc_id", $"subj", $"value_key")
      .collect().map(_.toString).sorted.toSeq
    val docs = Pipeline.docsFor(spark, sfDir)
    val batch = graft.operators.Serialize.unionDedup(
      Pipeline.textPath(docs), Pipeline.textPath(docs).limit(0))
      .select($"doc_id", $"subj", $"value_key")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }

  test("watermarked window aggregation over the events stream") {
    val out = Streaming.eventWindowCounts(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(total === expected)
  }
}
