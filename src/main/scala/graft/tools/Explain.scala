package graft.tools

import graft.Pipeline
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of the flagship pipeline
  * (plan-inspection protocol, BASELINE.md: no Collect/cartesian nodes;
  * broadcasts where intended).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Pipeline.triples(spark, sfDir)
    println("==== PIPE_TRIPLES PLAN ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
