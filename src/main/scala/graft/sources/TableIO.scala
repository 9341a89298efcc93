package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-style table facade (SURVEY.md §0.1): the north rule says
  * "Iceberg tables", but no Iceberg runtime jar exists in this
  * zero-egress image. This facade provides the Iceberg properties the
  * pipeline relies on — partitioned layout, atomic-enough commit via a
  * manifest file (write data -> write manifest to temp -> atomic
  * rename), snapshot id, resume by partition — over partitioned
  * Parquet. If an iceberg-spark-runtime jar is present, swap the
  * implementations to `spark.read.format("iceberg")` / `writeTo` with
  * no pipeline changes.
  */
object TableIO {

  case class Manifest(snapshotId: String, rowCount: Long, partitionCols: Seq[String])

  private def manifestPath(table: String) = Paths.get(table, "_MANIFEST")

  /** Commit a DataFrame as a (partitioned) table with a manifest.
    * mode=Append accumulates data files and re-commits a new manifest
    * snapshot over the union (the Iceberg-append analog) — used by
    * resumable stage runs to add pending buckets' output without
    * clobbering completed ones. Row count comes from the committed
    * files' footers (metadata-only scan), not a recompute of `df`.
    */
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
            snapshotId: String = "s1",
            mode: SaveMode = SaveMode.Overwrite): Manifest = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$table/data")
    val n = df.sparkSession.read.parquet(s"$table/data").count()
    val m = Manifest(snapshotId, n, partitionBy)
    val tmp = Paths.get(table, s"_MANIFEST.tmp")
    Files.writeString(tmp,
      s"""{"snapshot_id":"${m.snapshotId}","row_count":${m.rowCount},"partition_cols":"${partitionBy.mkString(",")}"}""")
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    m
  }

  /** Read a committed table; throws if no manifest (uncommitted write). */
  def read(spark: SparkSession, table: String): DataFrame = {
    require(Files.exists(manifestPath(table)),
      s"table $table has no committed manifest")
    spark.read.parquet(s"$table/data")
  }

  def manifest(table: String): Option[String] =
    if (Files.exists(manifestPath(table)))
      Some(new String(Files.readAllBytes(manifestPath(table)), StandardCharsets.UTF_8))
    else None
}
