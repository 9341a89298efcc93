package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** Iceberg-style table facade (SURVEY.md §0.1): the north rule says
  * "Iceberg tables", but no Iceberg runtime jar exists in this
  * zero-egress image. This facade provides the Iceberg properties the
  * pipeline relies on over partitioned Parquet:
  *
  *  - SNAPSHOT ISOLATION: every write lands in a fresh `snap-*`
  *    directory; the `_MANIFEST` (written to temp + atomic rename)
  *    lists the committed snapshots, their files' partitions and
  *    per-partition row counts. A crash mid-write leaves an ORPHAN
  *    directory that no read ever touches — the failure mode the
  *    round-2 advisor flagged (data files appended in place before the
  *    commit record, duplicated on resume) cannot occur.
  *  - APPEND = prior snapshots + the new one under a new manifest;
  *    Overwrite = manifest lists only the new snapshot (old snapshot
  *    dirs become unreferenced, the Iceberg expire-snapshots analog).
  *  - MANIFEST-DRIVEN READS: `read` touches exactly the committed
  *    files; `readWhere` prunes to the partitions a predicate keeps
  *    (resume reads only the buckets it needs — CheckpointSpec pins
  *    this via inputFiles).
  *
  * If an iceberg-spark-runtime jar is present, swap the implementations
  * to `spark.read.format("iceberg")` / `writeTo` with no pipeline
  * changes.
  */
object TableIO {

  /** Commit summary returned by `write`: total committed rows across
    * the table after this commit.
    */
  case class Manifest(snapshotId: String, rowCount: Long, partitionCols: Seq[String])

  private case class Snap(id: String, dir: String, rows: Long)
  private case class Part(dir: String, path: String, rows: Long)
  private case class TableState(partitionCols: Seq[String], snaps: Seq[Snap],
                                parts: Seq[Part], schemaJson: Option[String] = None)

  private def manifestPath(table: String) = Paths.get(table, "_MANIFEST")

  /** Per-table lock: manifest commit is a read-modify-write and
    * expireOrphans deletes unreferenced dirs — two concurrent writers
    * (or a write racing an expire) on the SAME table in this JVM must
    * serialize or a snapshot can be lost / an in-flight snap dir
    * deleted pre-commit (round-3 advisor). Tables are applicationId-
    * scoped, so same-JVM is the only exposed concurrency.
    */
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    tableLocks.computeIfAbsent(
      Paths.get(table).toAbsolutePath.normalize.toString, _ => new Object)

  /** Render one partition path segment exactly as Spark writes it on
    * disk: nulls become the Hive default partition name and special
    * chars are URL-style escaped — a raw "col=value" render would
    * produce manifest paths matching no directory for string values
    * with spaces/slashes (round-3 advisor).
    */
  private def partSegment(col: String, v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val vs =
      if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(v.toString)
    s"$col=$vs"
  }

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def render(st: TableState): String = {
    val sb = new StringBuilder
    val schemaField =
      st.schemaJson.map(s => s""","schema":"${esc(s)}"""").getOrElse("")
    sb ++= s"""{"type":"table","version":2,"partition_cols":"${esc(st.partitionCols.mkString(","))}"$schemaField}\n"""
    st.snaps.foreach(s =>
      sb ++= s"""{"type":"snapshot","id":"${esc(s.id)}","dir":"${esc(s.dir)}","row_count":${s.rows}}\n""")
    st.parts.foreach(p =>
      sb ++= s"""{"type":"partition","dir":"${esc(p.dir)}","path":"${esc(p.path)}","rows":${p.rows}}\n""")
    sb.result()
  }

  // we only parse what `render` wrote: one flat JSON object per line
  private val fieldRe = """"(\w+)":(?:"((?:[^"\\]|\\.)*)"|(-?\d+))""".r

  private def parseLine(line: String): Map[String, String] =
    fieldRe.findAllMatchIn(line).map { m =>
      val v =
        if (m.group(2) != null) m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
        else m.group(3)
      m.group(1) -> v
    }.toMap

  private def loadState(table: String): Option[TableState] =
    if (!Files.exists(manifestPath(table))) None
    else {
      val maps = Files.readAllLines(manifestPath(table)).asScala.toSeq
        .filter(_.nonEmpty).map(parseLine)
      def of(t: String) = maps.filter(_.get("type").contains(t))
      val pcols = of("table").headOption
        .flatMap(_.get("partition_cols")).filter(_.nonEmpty)
        .map(_.split(",").toSeq).getOrElse(Nil)
      val schema = of("table").headOption.flatMap(_.get("schema"))
      val snaps = of("snapshot").map(m => Snap(m("id"), m("dir"), m("row_count").toLong))
      val parts = of("partition").map(m => Part(m("dir"), m("path"), m("rows").toLong))
      Some(TableState(pcols, snaps, parts, schema))
    }

  private def commitState(table: String, st: TableState): Unit = {
    Files.createDirectories(Paths.get(table))
    val tmp = Paths.get(table, "_MANIFEST.tmp")
    Files.writeString(tmp, render(st))
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private val snapCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Commit a DataFrame as a new snapshot of a (partitioned) table.
    * The data lands in a fresh snapshot directory; per-partition row
    * counts are derived from the committed files (footer scan), and
    * only then is the manifest atomically replaced — the commit point.
    * Append keeps prior snapshots; Overwrite starts the list over.
    */
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
            snapshotId: String = "s1",
            mode: SaveMode = SaveMode.Overwrite): Manifest = lockFor(table).synchronized {
    val spark = df.sparkSession
    val prior =
      (if (mode == SaveMode.Append) loadState(table) else None)
        .getOrElse(TableState(partitionBy, Nil, Nil))
    require(prior.partitionCols == partitionBy,
      s"append partitioning ${partitionBy.mkString(",")} must match table's ${prior.partitionCols.mkString(",")}")
    // partition VALUES must render identically in partSegment and in
    // Spark's on-disk directory names: true for string/integral/bool,
    // NOT for timestamp/date/decimal (their toString differs from
    // Spark's partition-path rendering) — fail loudly, don't write a
    // manifest whose paths match no directory
    partitionBy.foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case StringType | ByteType | ShortType | IntegerType | LongType |
             BooleanType => true
        case _ => false
      }
      require(ok, s"partition column $c: unsupported type " +
        s"${df.schema(c).dataType} (string/integral/boolean only)")
    }
    // attempt-unique across JVMs: a resumed run in a FRESH JVM must
    // never reuse a prior attempt's directory name (a per-JVM counter
    // alone restarts at 0 and the Overwrite below would destroy the
    // previously committed snapshot's files in place); nanoTime +
    // counter + an existence probe make collisions impossible
    def freshDir(): String = {
      val base = "snap-" + snapshotId.replaceAll("[^a-zA-Z0-9._-]", "_") +
        "-" + java.lang.Long.toHexString(System.nanoTime()) +
        "-" + snapCounter.incrementAndGet()
      if (Files.exists(Paths.get(table, base))) freshDir() else base
    }
    val snapDir = freshDir()
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$table/$snapDir")
    // stats from the COMMITTED files, not a recompute of `df`. The
    // read supplies the WRITER'S schema: inference would re-type a
    // numeric-looking string partition value ("01" -> int 1) and
    // partSegment would then render a path matching no directory
    val parts: Seq[Part] =
      try {
        val committed = spark.read.schema(df.schema).parquet(s"$table/$snapDir")
        if (partitionBy.nonEmpty)
          committed.groupBy(partitionBy.map(col): _*).count().collect().toSeq
            .map { r =>
              val path = partitionBy.zipWithIndex
                .map { case (c, i) => partSegment(c, r.get(i)) }.mkString("/")
              Part(snapDir, path, r.getLong(partitionBy.length))
            }.sortBy(_.path)
        else Seq(Part(snapDir, "", committed.count()))
      } catch { // a zero-row write leaves no readable files: empty snapshot
        case _: org.apache.spark.sql.AnalysisException => Nil
      }
    val snap = Snap(snapshotId, snapDir, parts.map(_.rows).sum)
    // the committed schema rides in the manifest so a legitimately
    // zero-row table still reads back as an empty typed DataFrame
    // instead of failing every resume forever (round-3 advisor)
    val st = TableState(partitionBy, prior.snaps :+ snap, prior.parts ++ parts,
      Some(df.schema.json))
    commitState(table, st)
    Manifest(snapshotId, st.parts.map(_.rows).sum, partitionBy)
  }

  /** Read a committed table: exactly the manifest's files, as the union
    * of its non-empty snapshot directories. Orphan directories from
    * crashed attempts are never touched. Throws if no manifest
    * (uncommitted write).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val st = state(table)
    val dirs = st.parts.map(_.dir).distinct
    if (dirs.isEmpty) {
      // a committed-but-empty table (a stage whose entire output is
      // legitimately zero rows) reads back as an empty DataFrame of the
      // manifest-recorded schema — throwing here made every resume of
      // such a stage a permanent failure (round-3 advisor)
      val schema = st.schemaJson.getOrElse(
        throw new IllegalArgumentException(s"table $table has no committed data"))
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.DataType.fromJson(schema)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    } else dirs.map(d => spark.read.parquet(s"$table/$d")).reduce(_.unionByName(_))
  }

  /** Manifest-driven partition-pruned read: only committed partitions
    * whose relative path (e.g. "pred_bucket=3") satisfies `keep` are
    * read — the scan never lists or touches other partitions' files.
    * For unpartitioned snapshots the path is "".
    */
  def readWhere(spark: SparkSession, table: String,
                keep: String => Boolean): DataFrame = {
    val st = state(table)
    val sel = st.parts.filter(p => keep(p.path))
    require(sel.nonEmpty, s"table $table: no committed partition matches the predicate")
    if (st.partitionCols.isEmpty)
      sel.map(_.dir).distinct.sorted
        .map(d => spark.read.parquet(s"$table/$d")).reduce(_.unionByName(_))
    else
      sel.groupBy(_.dir).toSeq.sortBy(_._1)
        .map { case (d, ps) =>
          spark.read.option("basePath", s"$table/$d")
            .parquet(ps.map(p => s"$table/$d/${p.path}"): _*)
        }
        .reduce(_.unionByName(_))
  }

  /** Iceberg expire-snapshots analog: delete every directory under the
    * table root the manifest does not reference — orphans from crashed
    * attempts and snapshots dropped by an Overwrite. Safe by
    * construction: the manifest is the commit point, so unreferenced
    * directories are already invisible to every read. Returns the
    * removed directory names.
    */
  def expireOrphans(table: String): Seq[String] = lockFor(table).synchronized {
    val referenced = state(table).snaps.map(_.dir).toSet
    val root = Paths.get(table)
    val doomed = scala.util.Using.resource(Files.list(root))(
      _.iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) && !referenced.contains(p.getFileName.toString)))
    doomed.foreach { d =>
      scala.util.Using.resource(Files.walk(d))(
        _.iterator().asScala.toSeq.reverse.foreach(Files.delete))
    }
    doomed.map(_.getFileName.toString).sorted
  }

  /** Distinct snapshot ids committed to a table (empty if no manifest). */
  def snapshotIds(table: String): Seq[String] =
    loadState(table).map(_.snaps.map(_.id).distinct).getOrElse(Nil)

  /** Committed per-partition row counts: (partition path, rows). */
  def partitionRows(table: String): Seq[(String, Long)] =
    state(table).parts.groupBy(_.path).toSeq.sortBy(_._1)
      .map { case (p, ps) => (p, ps.map(_.rows).sum) }

  private def state(table: String): TableState =
    loadState(table).getOrElse(
      throw new IllegalArgumentException(s"table $table has no committed manifest"))

  def manifest(table: String): Option[String] =
    if (Files.exists(manifestPath(table)))
      Some(new String(Files.readAllBytes(manifestPath(table)), StandardCharsets.UTF_8))
    else None
}
