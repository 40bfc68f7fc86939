package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Manifest-driven snapshot layout with FILE-level zone maps — the
  * Iceberg/Delta scan-planning idea (manifest lists data files with
  * per-file column statistics; a range predicate prunes whole files
  * before the scan starts) re-expressed minimally on plain parquet:
  *
  *   - [[write]] range-clusters the relation on a chosen stat column
  *     (`repartitionByRange` + `sortWithinPartitions`, so each file owns
  *     a narrow value band), then records `(file, min, max, rows)` per
  *     file in a `_manifest.tsv` beside the data — computed in ONE extra
  *     pass grouped by `input_file_name()`, never per-file jobs.
  *   - [[scan]] reads the manifest (driver-side, file-count-sized — the
  *     100 TB corpus never moves), keeps only files whose [min, max]
  *     band overlaps the predicate range, and hands Spark exactly that
  *     file list plus the residual filter. At 1000 executors the win is
  *     identical to partition pruning but on a NON-partition column:
  *     a 1% range probe of a clustered 100 TB table schedules ~1% of
  *     the splits.
  *
  * Manifests are VERSIONED (`_manifest.v<N>.tsv` + a `_current`
  * pointer): [[append]] commits a new version whose manifest is the
  * previous rows plus the increment's — O(batch), history files never
  * rescanned — and every older version stays readable (time travel).
  *
  * The schema is persisted beside the manifest (the [[Layouts]] rule:
  * an empty snapshot must read back as a valid empty relation, and
  * explicit schemas skip footer inference). `statCol` must be NON-NULL
  * (zone maps have no null band; a null row would be invisible to range
  * probes and silently dropped by [[delete]]'s rewrite) — ENFORCED at
  * commit time: the stats pass counts nulls for free and every
  * write/append fails fast on the first null rather than committing a
  * quietly incomplete table.
  */
object Snapshot {

  final case class FileStat(file: String, min: Long, max: Long, rows: Long)

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val out = fs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ---- manifest versions (time travel) ---------------------------------
  // Each write/append commits a NEW numbered manifest (_manifest.v<N>.tsv)
  // and then flips the one-line _current pointer — the Iceberg/Delta
  // commit protocol in miniature. Data files are immutable once written,
  // so every old version stays readable (time travel), the pointer flip
  // is the atomic commit point, and a crash between the manifest write
  // and the flip leaves the previous version intact.

  private def currentVersion(spark: SparkSession, path: String): Int =
    readText(spark, path + "/_current").trim.toInt

  private def statsOf(spark: SparkSession, statCol: String,
                      schema: StructType, dir: String): Seq[FileStat] = {
    // One scan for the whole manifest delta: per-file min/max/rows keyed
    // on the file identity Spark already carries with every row.
    // Explicit schema: an empty write may leave zero data files, which
    // would otherwise fail schema inference here.
    val rows = spark.read.schema(schema).parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).cast("long").as("mn"),
        max(col(statCol)).cast("long").as("mx"),
        count(lit(1)).as("rows"),
        count(when(col(statCol).isNull, 1)).as("nulls"))
      .collect() // file-count-sized, never data-sized
    // Fail FAST on null statCol values (same pass — no extra scan): zone
    // maps have no null band, so a null row would be invisible to every
    // range probe and silently dropped by delete's rewrite filter. Better
    // a loud commit-time error than a quietly incomplete table.
    val nullRows = rows.map(_.getLong(4)).sum
    require(nullRows == 0,
      s"statCol '$statCol' has $nullRows NULL row(s); zone maps require a " +
        "non-null cluster column — filter or coalesce before write/append")
    rows.map(r => FileStat(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(_.file).toSeq
  }

  private def commit(spark: SparkSession, path: String, version: Int,
                     stats: Seq[FileStat]): Unit = {
    writeText(spark, path + s"/_manifest.v$version.tsv",
      stats.map(s => s"${s.file}\t${s.min}\t${s.max}\t${s.rows}")
        .mkString("", "\n", if (stats.isEmpty) "" else "\n"))
    writeText(spark, path + "/_current", version.toString)
  }

  /** Write `df` as version 1 of a range-clustered snapshot over
    * long-typed `statCol` with `nFiles` target files, plus the zone-map
    * manifest.
    */
  def write(df: DataFrame, path: String, statCol: String,
            nFiles: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val spark = df.sparkSession
    val dataDir = path + "/v1"
    df.repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    writeText(spark, path + "/_schema.json", df.schema.json)
    commit(spark, path, 1, statsOf(spark, statCol, df.schema, dataDir))
  }

  /** Append a batch as a NEW snapshot version: the increment is
    * range-clustered and stat'd on its own (O(batch) — history files are
    * neither moved nor rescanned; their manifest rows carry over), and
    * the new manifest = history rows + increment rows. Reading the new
    * version sees history ∪ batch; every older version stays readable.
    */
  def append(df: DataFrame, path: String, statCol: String,
             nFiles: Int = 4): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val spark = df.sparkSession
    val prev = currentVersion(spark, path)
    val next = prev + 1
    val dataDir = path + s"/v$next"
    df.repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    commit(spark, path, next,
      manifest(spark, path, Some(prev)) ++
        statsOf(spark, statCol, snapshotSchema(spark, path), dataDir))
  }

  /** Copy-on-write range DELETE: commit a new version with every row
    * whose `statCol` lies in `[lo, hi]` removed. Only files whose
    * [min, max] band OVERLAPS the range are rewritten (read, filtered,
    * re-clustered); every other manifest row carries over verbatim —
    * O(overlap), never O(table) — and when no file overlaps, the delete
    * is a pure metadata commit (zero data I/O). Older versions still
    * read the pre-delete rows (time travel).
    */
  def delete(spark: SparkSession, path: String, statCol: String,
             lo: Long, hi: Long): Unit = {
    val prev = currentVersion(spark, path)
    val next = prev + 1
    val (hit, keep) = manifest(spark, path, Some(prev))
      .partition(s => s.max >= lo && s.min <= hi)
    if (hit.isEmpty) { commit(spark, path, next, keep); return }
    val schema = snapshotSchema(spark, path)
    val dataDir = path + s"/v$next"
    spark.read.schema(schema).parquet(hit.map(_.file): _*)
      .where(!(col(statCol) >= lo && col(statCol) <= hi))
      .repartitionByRange(math.max(1, hit.size), col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    commit(spark, path, next,
      keep ++ statsOf(spark, statCol, schema, dataDir))
  }

  /** IDEMPOTENT streaming append — the `foreachBatch` sink contract:
    * each micro-batch lands as one snapshot version whose commit records
    * the batch id, and a RETRY of the same batch id (Structured
    * Streaming re-delivers the last uncommitted batch after a crash) is
    * a no-op instead of a duplicate append. Exactly-once ingestion into
    * the table format falls out of the version protocol: the data write
    * is invisible until the `_current` flip, and the flip carries the
    * batch id.
    *
    * Wire as
    * `stream.writeStream.foreachBatch((df, id) => Snapshot.appendBatch(df, path, col, id))`.
    */
  def appendBatch(df: DataFrame, path: String, statCol: String,
                  batchId: Long, nFiles: Int = 4): Unit = {
    val spark = df.sparkSession
    val cur = currentVersion(spark, path)
    val fsys = fs(spark, path)
    // Replay detection scans EVERY committed batch marker (version ≤
    // current), not just the current version's: append/delete/compact
    // commits — or a second stream — can interleave between a batch's
    // commit and its crash-redelivery, and the marker-of-current check
    // alone would then let the replayed batch append twice (Delta's
    // txn-version table solves the same problem). Markers ABOVE _current
    // are rightly ignored: they belong to a commit that crashed before
    // its pointer flip, so that batch never became visible and MUST
    // re-run. Marker count = version count — driver-side and tiny.
    val replayed = fsys
      .globStatus(new org.apache.hadoop.fs.Path(path + "/_batch.v*"))
      .exists { st =>
        val v = st.getPath.getName.stripPrefix("_batch.v").toInt
        v <= cur &&
          readText(spark, st.getPath.toString).trim.toLong == batchId
      }
    if (replayed) return
    // hand-rolled commit so the batch marker lands BEFORE the pointer
    // flip: a crash anywhere before the flip leaves _current on the old
    // version, and the retry re-runs this append idempotently (the data
    // dir and manifest are simply overwritten); a crash after the flip
    // means the marker is already visible and the retry no-ops.
    val next = cur + 1
    val dataDir = path + s"/v$next"
    df.repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    val stats = manifest(spark, path, Some(cur)) ++
      statsOf(spark, statCol, snapshotSchema(spark, path), dataDir)
    writeText(spark, path + s"/_manifest.v$next.tsv",
      stats.map(s => s"${s.file}\t${s.min}\t${s.max}\t${s.rows}")
        .mkString("", "\n", if (stats.isEmpty) "" else "\n"))
    writeText(spark, path + s"/_batch.v$next", batchId.toString)
    writeText(spark, path + "/_current", next.toString)
  }

  /** Small-file COMPACTION: fold the current version's live files into
    * `nFiles` fresh range-clustered files as a new version — same rows,
    * fewer/larger files. This is the maintenance job that keeps the
    * split count healthy after many appends (each append adds its own
    * small files) and restores clustering after deletes. Data files are
    * immutable, so every older version keeps reading the originals.
    */
  def compact(spark: SparkSession, path: String, statCol: String,
              nFiles: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val prev = currentVersion(spark, path)
    val next = prev + 1
    val m = manifest(spark, path, Some(prev))
    if (m.isEmpty) { commit(spark, path, next, Nil); return }
    val schema = snapshotSchema(spark, path)
    val dataDir = path + s"/v$next"
    spark.read.schema(schema).parquet(m.map(_.file): _*)
      .repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    commit(spark, path, next, statsOf(spark, statCol, schema, dataDir))
  }

  /** The version log — one row per committed version (1..current) with
    * its file and row totals: the table-format inspection surface (what
    * `DESCRIBE HISTORY` shows on Delta). Driver-side and
    * version-count-sized.
    */
  def history(spark: SparkSession, path: String): Seq[(Int, Int, Long)] =
    (1 to currentVersion(spark, path)).map { v =>
      val m = manifest(spark, path, Some(v))
      (v, m.size, m.map(_.rows).sum)
    }

  /** The manifest rows of `version` (default: current); empty when that
    * version holds no data files.
    */
  def manifest(spark: SparkSession, path: String,
               version: Option[Int] = None): Seq[FileStat] = {
    val v = version.getOrElse(currentVersion(spark, path))
    readText(spark, path + s"/_manifest.v$v.tsv").split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(f, mn, mx, rows) = line.split("\t")
        FileStat(f, mn.toLong, mx.toLong, rows.toLong)
      }
  }

  /** The data files a `[lo, hi]` probe of `statCol` must read. */
  def selectFiles(spark: SparkSession, path: String, lo: Long, hi: Long,
                  version: Option[Int] = None): Seq[String] =
    manifest(spark, path, version)
      .filter(s => s.max >= lo && s.min <= hi).map(_.file)

  private def snapshotSchema(spark: SparkSession, path: String): StructType =
    DataType.fromJson(readText(spark, path + "/_schema.json"))
      .asInstanceOf[StructType]

  /** Range probe of a snapshot version (default: current):
    * manifest-pruned file list + the residual filter. The result is
    * exactly `read(version).where(statCol between lo and hi)`, but Spark
    * only ever lists, opens, and scans the overlapping files.
    */
  def scan(spark: SparkSession, path: String, statCol: String,
           lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    val schema = snapshotSchema(spark, path)
    val files = selectFiles(spark, path, lo, hi, version)
    val base =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.where(col(statCol) >= lo && col(statCol) <= hi)
  }
}
