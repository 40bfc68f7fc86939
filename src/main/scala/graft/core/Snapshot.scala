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
  *   - MULTI-COLUMN zone maps: [[write]] may register SECONDARY stat
  *     columns (`statCols2`); the same single stats pass records their
  *     per-file min/max too, and [[scanBy]]/[[selectFilesBy]] prune on
  *     any registered column. Secondary bands are only as tight as the
  *     physical clustering lets them be — cluster on a z-order
  *     interleave (`zorderKey`) of the probe columns to make ALL of
  *     them prune well.
  *
  * Manifests are VERSIONED (`_manifest.v<N>.tsv` + `_commit.v<N>`
  * markers): [[append]] commits a new version whose manifest is the
  * previous rows plus the increment's — O(batch), history files never
  * rescanned — and every older version stays readable (time travel).
  *
  * COMMIT PROTOCOL (optimistic concurrency, the Iceberg idea in
  * miniature): data files land under a WRITER-UNIQUE directory (two
  * in-flight commits can never overwrite each other's bytes), the
  * manifest for version N is written, and the commit point is the
  * exclusive CREATE of `_commit.v<N>` — first creator wins the version.
  * A loser re-reads the new head and, when its commit is ADDITIVE
  * (append / streaming batch: manifest = head rows + its own delta),
  * REBASES onto the next version — its already-written data files stay
  * valid verbatim. Non-additive commits (delete, compact — their
  * rewrite depends on the base manifest) abort with
  * `ConcurrentModificationException` instead of silently dropping the
  * other writer's rows; callers re-run against the new head. A crash
  * anywhere before the marker leaves the table on the old version with
  * only unreferenced data files behind (no burned version numbers —
  * versions stay dense 1..current). Same-JVM commits additionally
  * serialize on a per-table lock, so local multi-threaded writers never
  * hit the cross-process race window at all.
  *
  * SCHEMA EVOLUTION (append-only, the M1–M3 contract from
  * [[graft.etl.Migrate]]): [[append]] accepts a batch whose schema adds
  * trailing columns. The evolution is validated append-only (dropping
  * or retyping a stored column throws), committed as
  * `_schema.v<N>.json` beside the manifest, and every version reads
  * with the schema IT was committed under — old data files read through
  * a newer schema null-fill the added columns (explicit-schema parquet
  * read, no footer-merge job), and time travel to a pre-evolution
  * version sees the old shape exactly.
  *
  * The schema is persisted beside the manifest (the [[Layouts]] rule:
  * an empty snapshot must read back as a valid empty relation, and
  * explicit schemas skip footer inference). `statCol` must be NON-NULL
  * (zone maps have no null band; a null row would be invisible to range
  * probes and silently dropped by [[delete]]'s rewrite) — ENFORCED at
  * commit time: the stats pass counts nulls for free and every
  * write/append fails fast on the first null rather than committing a
  * quietly incomplete table. Secondary stat columns MAY hold nulls:
  * their min/max spans the non-null values, which prunes correctly
  * because a null never satisfies a range predicate (the residual
  * filter drops such rows anyway).
  */
object Snapshot {

  /** Per-file zone-map row. `extra` aligns positionally with the
    * table's registered secondary stat columns; `None` marks a file
    * with no non-null values in that column (prunable by every range).
    */
  final case class FileStat(file: String, min: Long, max: Long, rows: Long,
                            extra: Seq[Option[(Long, Long)]] = Nil)

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

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  private def delete(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), false)

  // ---- the commit protocol ----------------------------------------------

  /** Committed versions = versions with a `_commit.v<N>` marker; the
    * current version is the highest. Driver-side, version-count-sized.
    */
  private def committedVersions(spark: SparkSession, path: String): Seq[Int] =
    fs(spark, path)
      .globStatus(new org.apache.hadoop.fs.Path(path + "/_commit.v*"))
      .toSeq.map(_.getPath.getName.stripPrefix("_commit.v").toInt).sorted

  private def currentVersion(spark: SparkSession, path: String): Int = {
    val vs = committedVersions(spark, path)
    require(vs.nonEmpty, s"no committed snapshot version under $path")
    vs.max
  }

  /** Exclusive create — the CAS. True iff WE created the marker. */
  private def tryCommitMarker(spark: SparkSession, path: String,
                              version: Int): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path + s"/_commit.v$version")
    try {
      val out = fs(spark, path).create(p, false) // overwrite = false
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  // Same-JVM commit serialization: one lock object per table path, so
  // local concurrent writers (the local[32] test posture, or multiple
  // streams in one driver) never race the on-disk CAS at all. The
  // on-disk protocol alone covers cross-process writers.
  private val commitLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(path: String): Object =
    commitLocks.getOrElseUpdate(path, new Object)

  /** One commit attempt's immutable payload: the delta rows (data files
    * already written under a writer-unique dir) plus optional side
    * effects to persist for the winning version.
    */
  private final case class Commit(
      delta: Seq[FileStat],
      additive: Boolean, // manifest = head rows ++ delta (rebase-safe)
      basedOn: Int, // the version the delta was computed against
      newSchema: Option[StructType] = None,
      batchId: Option[Long] = None,
      bloom: Seq[(String, String)] = Nil) // (file, base64 bitmap) delta

  /** Run the optimistic-commit loop: pick `next = current + 1`, write
    * the manifest, CAS the commit marker; on a lost race, rebase
    * (additive) or abort (non-additive). Post-fence, the winner REPAIRS
    * its version's side files (a loser may have overwritten them before
    * losing) and clears stale same-numbered files from older crashed
    * attempts. Returns the committed version.
    */
  private def commitLoop(spark: SparkSession, path: String, c: Commit): Int =
    lockFor(path).synchronized {
      val attempt = c
      var done = -1
      while (done < 0) {
        val head = currentVersion(spark, path)
        if (!attempt.additive && head != attempt.basedOn)
          throw new java.util.ConcurrentModificationException(
            s"snapshot $path moved v${attempt.basedOn} -> v$head during a " +
              "non-additive commit (delete/compact); re-run against the new head")
        val next = head + 1
        val rows =
          if (attempt.additive) manifest(spark, path, Some(head)) ++ attempt.delta
          else attempt.delta
        // bloom sidecar: carry the head's entries for every file that
        // survives into this version, plus the delta's fresh entries —
        // uniform across additive and rewrite commits
        val bloomRows: Option[Seq[(String, String)]] =
          if (bloomConf(spark, path).isEmpty) None
          else {
            val live = rows.map(_.file).toSet
            Some(bloomOf(spark, path, head)
              .filter(kv => live(kv._1)).toSeq ++ attempt.bloom)
          }
        writeManifest(spark, path, next, rows)
        bloomRows.foreach(b => writeBloom(spark, path, next, b))
        attempt.newSchema.foreach(sc =>
          writeText(spark, path + s"/_schema.v$next.json", sc.json))
        attempt.batchId.foreach(id =>
          writeText(spark, path + s"/_batch.v$next", id.toString))
        if (tryCommitMarker(spark, path, next)) {
          // fenced: v<next> is ours — repair side files a concurrent
          // loser may have overwritten pre-fence, and clear stale ones
          // from crashed attempts at this number
          writeManifest(spark, path, next, rows)
          bloomRows.foreach(b => writeBloom(spark, path, next, b))
          attempt.newSchema match {
            case Some(sc) =>
              writeText(spark, path + s"/_schema.v$next.json", sc.json)
              writeText(spark, path + "/_schema.json", sc.json)
            case None =>
              if (exists(spark, path + s"/_schema.v$next.json"))
                delete(spark, path + s"/_schema.v$next.json")
          }
          attempt.batchId match {
            case Some(id) =>
              writeText(spark, path + s"/_batch.v$next", id.toString)
            case None =>
              if (exists(spark, path + s"/_batch.v$next"))
                delete(spark, path + s"/_batch.v$next")
          }
          writeText(spark, path + "/_current", next.toString)
          done = next
        } else {
          // lost the race — the head moved; loop to rebase: the next
          // pass re-reads the head and re-carries its manifest rows
          // (additive), or throws when basedOn no longer matches
          // (non-additive)
          ()
        }
      }
      done
    }

  private def writeManifest(spark: SparkSession, path: String, version: Int,
                            stats: Seq[FileStat]): Unit = {
    def cell(e: Option[(Long, Long)]) =
      e.map { case (a, b) => s"$a:$b" }.getOrElse("-")
    writeText(spark, path + s"/_manifest.v$version.tsv",
      stats.map(s => (Seq(s.file, s.min.toString, s.max.toString,
          s.rows.toString) ++ s.extra.map(cell)).mkString("\t"))
        .mkString("", "\n", if (stats.isEmpty) "" else "\n"))
  }

  // ---- stats ------------------------------------------------------------

  private def statsOf(spark: SparkSession, statCol: String,
                      cols2: Seq[String], schema: StructType,
                      dir: String): Seq[FileStat] = {
    // One scan for the whole manifest delta: per-file min/max/rows keyed
    // on the file identity Spark already carries with every row —
    // secondary columns ride the SAME pass. Explicit schema: an empty
    // write may leave zero data files, which would otherwise fail schema
    // inference here.
    val aggs =
      Seq(min(col(statCol)).cast("long").as("mn"),
        max(col(statCol)).cast("long").as("mx"),
        count(lit(1)).as("rows"),
        count(when(col(statCol).isNull, 1)).as("nulls")) ++
        cols2.flatMap(c => Seq(min(col(c)).cast("long"),
          max(col(c)).cast("long")))
    val rows = spark.read.schema(schema).parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // file-count-sized, never data-sized
    // Fail FAST on null statCol values (same pass — no extra scan): zone
    // maps have no null band, so a null row would be invisible to every
    // range probe and silently dropped by delete's rewrite filter. Better
    // a loud commit-time error than a quietly incomplete table.
    val nullRows = rows.map(_.getLong(4)).sum
    require(nullRows == 0,
      s"statCol '$statCol' has $nullRows NULL row(s); zone maps require a " +
        "non-null cluster column — filter or coalesce before write/append")
    rows.map { r =>
      val extra = cols2.indices.map { i =>
        if (r.isNullAt(5 + 2 * i)) None // all-null file: prunable always
        else Some((r.getLong(5 + 2 * i), r.getLong(6 + 2 * i)))
      }
      FileStat(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        extra)
    }.sortBy(_.file).toSeq
  }

  /** Writer-unique data directory — two in-flight commits can never
    * overwrite each other's parquet bytes, which is what makes the
    * optimistic rebase sound (a loser's already-written files stay
    * valid verbatim for its retry).
    */
  private def newDataDir(spark: SparkSession, path: String): String =
    path + "/d" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(12)

  private def clusterWrite(df: DataFrame, statCol: String, nFiles: Int,
                           dir: String): Unit =
    df.repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dir)

  /** The registered secondary stat columns ([[write]]'s `statCols2`). */
  private def statCols2(spark: SparkSession, path: String): Seq[String] =
    if (!exists(spark, path + "/_statcols")) Nil
    else readText(spark, path + "/_statcols").split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty)

  // ---- per-file bloom sidecar (equality file-skipping) -------------------
  // Zone maps prune RANGE probes on clustered columns; a per-file bloom
  // over a registered high-cardinality column prunes EQUALITY probes on a
  // column with no useful ordering at all (url, content hash — the
  // Delta/Iceberg bloom-index idea). Bits ride the engine-agnostic
  // PolyHash bloom kernel, so a membership decision — false positives
  // included — replays identically anywhere.

  /** The registered bloom column, if any: `(column, mBits, k)`. */
  private def bloomConf(spark: SparkSession, path: String)
      : Option[(String, Int, Int)] =
    if (!exists(spark, path + "/_bloomcol")) None
    else {
      val Array(c, m, k) = readText(spark, path + "/_bloomcol").trim.split("\t")
      Some((c, m.toInt, k.toInt))
    }

  private def writeBloom(spark: SparkSession, path: String, version: Int,
                         rows: Seq[(String, String)]): Unit =
    writeText(spark, path + s"/_bloom.v$version.tsv",
      rows.map { case (f, b) => s"$f\t$b" }
        .mkString("", "\n", if (rows.isEmpty) "" else "\n"))

  /** `file -> base64 bitmap` of `version`'s sidecar (empty when the
    * table has no bloom column).
    */
  private def bloomOf(spark: SparkSession, path: String,
                      version: Int): Map[String, String] =
    if (bloomConf(spark, path).isEmpty ||
        !exists(spark, path + s"/_bloom.v$version.tsv")) Map.empty
    else readText(spark, path + s"/_bloom.v$version.tsv").split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(f, b) = line.split("\t"); f -> b
      }.toMap

  /** Per-file bloom bitmaps for the files under `dir` — one aggregate in
    * the same one-pass-per-commit posture as [[statsOf]] (keyed on
    * `input_file_name()`; the shuffle carries one fixed-size bitmap per
    * file). NULL values insert nothing (an equality probe for NULL is
    * meaningless — use IS NULL semantics upstream).
    */
  private def bloomStatsOf(spark: SparkSession, conf: (String, Int, Int),
                           schema: StructType,
                           dir: String): Seq[(String, String)] = {
    val (c, mBits, k) = conf
    val elems = when(col(c).isNotNull, array(col(c).cast("string")))
      .otherwise(array().cast("array<string>"))
    spark.read.schema(schema).parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(graft.functions.native.bloomBits(elems, mBits, k).as("b"))
      .collect() // file-count-sized
      .map { r =>
        val words = r.getSeq[Long](1)
        val bb = java.nio.ByteBuffer.allocate(words.length * 8)
        words.foreach(bb.putLong)
        r.getString(0) -> java.util.Base64.getEncoder.encodeToString(bb.array())
      }.toSeq.sortBy(_._1)
  }

  private def bloomDelta(spark: SparkSession, path: String,
                         schema: StructType,
                         dir: String): Seq[(String, String)] =
    bloomConf(spark, path)
      .map(conf => bloomStatsOf(spark, conf, schema, dir)).getOrElse(Nil)

  // ---- public API ---------------------------------------------------------

  /** Write `df` as version 1 of a range-clustered snapshot over
    * long-typed `statCol` with `nFiles` target files, plus the zone-map
    * manifest. `statCols2` registers SECONDARY long-typed stat columns:
    * their per-file min/max is recorded in this and every future commit
    * (same stats pass), enabling [[scanBy]] pruning on non-cluster
    * columns. To make a secondary band tight, cluster on a z-order
    * interleave of the probe columns and register the originals here.
    */
  def write(df: DataFrame, path: String, statCol: String,
            nFiles: Int = 16, statCols2: Seq[String] = Nil,
            bloomCol: Option[String] = None, bloomBits: Int = 1024,
            bloomK: Int = 4): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val spark = df.sparkSession
    // CREATE OR REPLACE: a previous table at this path (an earlier run
    // over the same scratch dir) is dropped whole — its commit markers
    // would otherwise outrank the fresh v1 in the glob-max protocol.
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs(spark, path).exists(root)) fs(spark, path).delete(root, true)
    val dataDir = newDataDir(spark, path)
    clusterWrite(df, statCol, nFiles, dataDir)
    writeText(spark, path + "/_schema.json", df.schema.json)
    writeText(spark, path + "/_schema.v1.json", df.schema.json)
    writeText(spark, path + "/_statcols",
      statCols2.mkString("", "\n", if (statCols2.isEmpty) "" else "\n"))
    bloomCol.foreach(c =>
      writeText(spark, path + "/_bloomcol", s"$c\t$bloomBits\t$bloomK"))
    val stats = statsOf(spark, statCol, statCols2, df.schema, dataDir)
    writeManifest(spark, path, 1, stats)
    if (bloomCol.isDefined)
      writeBloom(spark, path, 1, bloomDelta(spark, path, df.schema, dataDir))
    tryCommitMarker(spark, path, 1)
    writeText(spark, path + "/_current", "1")
  }

  /** Append a batch as a NEW snapshot version: the increment is
    * range-clustered and stat'd on its own (O(batch) — history files are
    * neither moved nor rescanned; their manifest rows carry over), and
    * the new manifest = history rows + increment rows. Reading the new
    * version sees history ∪ batch; every older version stays readable.
    *
    * ADD COLUMN rides this path: a batch whose schema appends new
    * columns to the stored schema commits an append-only evolution
    * (validated by the [[graft.etl.Migrate]] contract — dropping or
    * retyping a stored column throws). Old files null-fill the new
    * columns on read; time travel below the evolution sees the old
    * shape.
    */
  def append(df: DataFrame, path: String, statCol: String,
             nFiles: Int = 4): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val spark = df.sparkSession
    val base = currentVersion(spark, path)
    val stored = schemaAt(spark, path, base)
    val evolved: Option[StructType] =
      if (df.schema.json == stored.json) None
      else {
        // append-only: every stored flattened path must survive —
        // Migrate.evolve throws on drops; retypes are caught explicitly
        graft.etl.Migrate.evolve(
          graft.etl.Flatten.columnPaths(stored), df.schema)
        val batchTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
        stored.fields.foreach { f =>
          require(batchTypes.get(f.name).contains(f.dataType),
            s"append-only migration violated: column '${f.name}' changed " +
              s"type ${f.dataType.simpleString} -> " +
              batchTypes.get(f.name).map(_.simpleString).getOrElse("<dropped>"))
        }
        val added = df.schema.fields.filterNot(f =>
          stored.fieldNames.contains(f.name))
        Some(StructType(stored.fields ++ added))
      }
    val writeSchema = evolved.getOrElse(stored)
    val dataDir = newDataDir(spark, path)
    // stored-order projection: old columns keep their position, new ones
    // append — the physical layout every version agrees on
    clusterWrite(df.select(writeSchema.fieldNames.map(col).toSeq: _*),
      statCol, nFiles, dataDir)
    val delta = statsOf(spark, statCol, statCols2(spark, path), writeSchema,
      dataDir)
    commitLoop(spark, path,
      Commit(delta, additive = true, basedOn = base, newSchema = evolved,
        bloom = bloomDelta(spark, path, writeSchema, dataDir)))
  }

  /** Copy-on-write range DELETE: commit a new version with every row
    * whose `statCol` lies in `[lo, hi]` removed. Only files whose
    * [min, max] band OVERLAPS the range are rewritten (read, filtered,
    * re-clustered); every other manifest row carries over verbatim —
    * O(overlap), never O(table) — and when no file overlaps, the delete
    * is a pure metadata commit (zero data I/O). Older versions still
    * read the pre-delete rows (time travel). Non-additive: a concurrent
    * commit aborts this one with `ConcurrentModificationException`.
    */
  def delete(spark: SparkSession, path: String, statCol: String,
             lo: Long, hi: Long): Unit = {
    val base = currentVersion(spark, path)
    val (hit, keep) = manifest(spark, path, Some(base))
      .partition(s => s.max >= lo && s.min <= hi)
    if (hit.isEmpty) {
      commitLoop(spark, path, Commit(keep, additive = false, basedOn = base))
      return
    }
    val schema = schemaAt(spark, path, base)
    val dataDir = newDataDir(spark, path)
    spark.read.schema(schema).parquet(hit.map(_.file): _*)
      .where(!(col(statCol) >= lo && col(statCol) <= hi))
      .repartitionByRange(math.max(1, hit.size), col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    val rewritten = statsOf(spark, statCol, statCols2(spark, path), schema,
      dataDir)
    commitLoop(spark, path,
      Commit(keep ++ rewritten, additive = false, basedOn = base,
        bloom = bloomDelta(spark, path, schema, dataDir)))
  }

  /** IDEMPOTENT streaming append — the `foreachBatch` sink contract:
    * each micro-batch lands as one snapshot version whose commit records
    * the batch id, and a RETRY of the same batch id (Structured
    * Streaming re-delivers the last uncommitted batch after a crash) is
    * a no-op instead of a duplicate append. Exactly-once ingestion into
    * the table format falls out of the version protocol: the data write
    * is invisible until the commit marker lands, and the marker's
    * version carries the batch id.
    *
    * Wire as
    * `stream.writeStream.foreachBatch((df, id) => Snapshot.appendBatch(df, path, col, id))`.
    */
  def appendBatch(df: DataFrame, path: String, statCol: String,
                  batchId: Long, nFiles: Int = 4): Unit = {
    val spark = df.sparkSession
    val cur = currentVersion(spark, path)
    // Replay detection scans the batch marker of EVERY COMMITTED version
    // (not just the current one): append/delete/compact commits — or a
    // second stream — can interleave between a batch's commit and its
    // crash-redelivery, and the marker-of-current check alone would then
    // let the replayed batch append twice (Delta's txn-version table
    // solves the same problem). Markers without a commit marker belong
    // to a crashed/lost attempt whose batch never became visible and
    // MUST re-run. Marker count = version count — driver-side and tiny.
    val fsys = fs(spark, path)
    val replayed = fsys
      .globStatus(new org.apache.hadoop.fs.Path(path + "/_batch.v*"))
      .exists { st =>
        val v = st.getPath.getName.stripPrefix("_batch.v").toInt
        v <= cur && exists(spark, path + s"/_commit.v$v") &&
          readText(spark, st.getPath.toString).trim.toLong == batchId
      }
    if (replayed) return
    val dataDir = newDataDir(spark, path)
    clusterWrite(df, statCol, nFiles, dataDir)
    val delta = statsOf(spark, statCol, statCols2(spark, path),
      schemaAt(spark, path, cur), dataDir)
    commitLoop(spark, path,
      Commit(delta, additive = true, basedOn = cur, batchId = Some(batchId),
        bloom = bloomDelta(spark, path, schemaAt(spark, path, cur), dataDir)))
  }

  /** Copy-on-write MERGE (key-replace upsert on the PRIMARY stat column
    * — the Delta `MERGE INTO` shape with the table clustered on the
    * merge key): every existing row whose `statCol` appears in `batch`
    * is replaced by the batch's rows for that key; keys absent from the
    * table insert. Mechanics: ONE pass over the batch's distinct keys
    * against the broadcast file bands finds exactly the files holding a
    * matched key; only those rewrite (anti-joined against the batch
    * keys), every other manifest row carries over verbatim, and the
    * batch lands as its own clustered files — O(overlap + batch), never
    * O(table). Non-additive: a concurrent commit aborts it cleanly.
    */
  def merge(batch: DataFrame, path: String, statCol: String,
            nFiles: Int = 4): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val spark = batch.sparkSession
    val base = currentVersion(spark, path)
    val m = manifest(spark, path, Some(base))
    val schema = schemaAt(spark, path, base)
    val keys = batch.select(col(statCol).cast("long").as("_mk")).distinct()
    // exact hit-file set in ONE batch pass: a file rewrites iff some
    // batch key falls inside its band (band overlap alone would rewrite
    // range-straddling files that hold none of the keys)
    val bands = spark.createDataFrame(m.map(s => (s.file, s.min, s.max)))
      .toDF("_f", "_mn", "_mx")
    val hitFiles = keys
      .join(broadcast(bands),
        col("_mk") >= col("_mn") && col("_mk") <= col("_mx"))
      .select("_f").distinct()
      .collect().map(_.getString(0)).toSet // file-count-sized
    val (hit, keep) = m.partition(s => hitFiles(s.file))
    val survivorDir =
      if (hit.isEmpty) None
      else {
        val dir = newDataDir(spark, path)
        spark.read.schema(schema).parquet(hit.map(_.file): _*)
          .join(keys, col(statCol).cast("long") === col("_mk"), "left_anti")
          .repartitionByRange(math.max(1, hit.size), col(statCol))
          .sortWithinPartitions(statCol)
          .write.mode("overwrite").parquet(dir)
        Some(dir)
      }
    val batchDir = newDataDir(spark, path)
    clusterWrite(batch.select(schema.fieldNames.map(col).toSeq: _*),
      statCol, nFiles, batchDir)
    val cols2 = statCols2(spark, path)
    val fresh = (survivorDir.toSeq :+ batchDir).flatMap(dir =>
      statsOf(spark, statCol, cols2, schema, dir))
    val bloom = (survivorDir.toSeq :+ batchDir).flatMap(dir =>
      bloomDelta(spark, path, schema, dir))
    commitLoop(spark, path,
      Commit(keep ++ fresh, additive = false, basedOn = base,
        bloom = bloom))
  }

  /** COUNT of a `[lo, hi]` range probe answered from METADATA where
    * possible (the Iceberg/Delta stats-based count): files whose band
    * lies FULLY inside the range contribute their manifest row count
    * with zero I/O; only boundary-straddling files are scanned. A probe
    * aligned to file bands — or covering the whole table — reads no
    * data at all. One row `(cnt)`.
    */
  def countRange(spark: SparkSession, path: String, statCol: String,
                 lo: Long, hi: Long,
                 version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    val m = manifest(spark, path, Some(v))
    val (full, rest) = m.filter(s => s.max >= lo && s.min <= hi)
      .partition(s => s.min >= lo && s.max <= hi)
    val fullRows = full.map(_.rows).sum
    if (rest.isEmpty)
      spark.range(1).select(lit(fullRows).as("cnt"))
    else
      spark.read.schema(schemaAt(spark, path, v)).parquet(rest.map(_.file): _*)
        .where(col(statCol) >= lo && col(statCol) <= hi)
        .agg((count(lit(1)) + lit(fullRows)).as("cnt"))
  }

  /** The data files an EQUALITY probe of the registered bloom column
    * must read: every file whose bloom has all of the value's bits set
    * (false positives keep a file — never lose one). Without a bloom
    * column, all files.
    */
  def selectFilesEq(spark: SparkSession, path: String, value: String,
                    version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, path))
    val m = manifest(spark, path, Some(v))
    bloomConf(spark, path) match {
      case None => m.map(_.file)
      case Some((_, mBits, k)) =>
        val pos = graft.functions.Bloom.positions(value, mBits, k)
        val side = bloomOf(spark, path, v)
        m.map(_.file).filter { f =>
          side.get(f).forall { b64 =>
            val bytes = java.util.Base64.getDecoder.decode(b64)
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val words = Array.fill(bytes.length / 8)(bb.getLong)
            pos.forall(p =>
              (words((p >>> 6).toInt) & (1L << (p & 63))) != 0L)
          }
        }
    }
  }

  /** Equality probe of the registered bloom column: bloom-pruned file
    * list + the exact residual filter — point lookups on a column with
    * no useful ordering (url, content hash) read ~1 file instead of the
    * table.
    */
  def lookupEq(spark: SparkSession, path: String, value: String,
               version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    val schema = schemaAt(spark, path, v)
    val c = bloomConf(spark, path)
      .map(_._1).getOrElse(throw new IllegalArgumentException(
        s"no bloom column registered under $path"))
    val files = selectFilesEq(spark, path, value, Some(v))
    val base =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.where(col(c).cast("string") === value)
  }

  /** Small-file COMPACTION: fold the current version's live files into
    * `nFiles` fresh range-clustered files as a new version — same rows,
    * fewer/larger files. This is the maintenance job that keeps the
    * split count healthy after many appends (each append adds its own
    * small files) and restores clustering after deletes. Data files are
    * immutable, so every older version keeps reading the originals.
    * Non-additive: a concurrent commit aborts it cleanly.
    */
  def compact(spark: SparkSession, path: String, statCol: String,
              nFiles: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val base = currentVersion(spark, path)
    val m = manifest(spark, path, Some(base))
    if (m.isEmpty) {
      commitLoop(spark, path, Commit(Nil, additive = false, basedOn = base))
      return
    }
    val schema = schemaAt(spark, path, base)
    val dataDir = newDataDir(spark, path)
    spark.read.schema(schema).parquet(m.map(_.file): _*)
      .repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(dataDir)
    val rewritten = statsOf(spark, statCol, statCols2(spark, path), schema,
      dataDir)
    commitLoop(spark, path,
      Commit(rewritten, additive = false, basedOn = base,
        bloom = bloomDelta(spark, path, schema, dataDir)))
  }

  /** VACUUM — the maintenance job that reclaims storage (Delta's VACUUM
    * + version expiry in one): keep the newest `keepVersions` committed
    * versions readable, drop older versions' manifests (and bloom
    * sidecars), and DELETE every data file no retained manifest
    * references — which also sweeps the orphans that crashed commits
    * and lost optimistic races leave behind (writer-unique dirs make
    * those unreferenced by construction). Commit markers and batch-id
    * markers stay (one-line files — keeping them preserves the version
    * numbering and the full exactly-once replay window); time travel
    * below the retention horizon errors on the missing manifest.
    * Run WITHOUT concurrent writers (an in-flight commit's data files
    * are unreferenced until its marker lands — the same retention
    * caveat Delta documents). Returns (expired versions, deleted data
    * files). Driver-side metadata walk; one FS delete per orphan.
    */
  def vacuum(spark: SparkSession, path: String,
             keepVersions: Int = 2): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    lockFor(path).synchronized {
      val committed = committedVersions(spark, path)
      val cur = committed.max
      val retained = committed.filter(_ > cur - keepVersions)
      val expired = committed
        .filter(v => v <= cur - keepVersions &&
          exists(spark, path + s"/_manifest.v$v.tsv"))
      val live = retained.flatMap(v => manifest(spark, path, Some(v)))
        .map(s => new org.apache.hadoop.fs.Path(s.file).toUri.getPath)
        .toSet
      expired.foreach { v =>
        delete(spark, path + s"/_manifest.v$v.tsv")
        if (exists(spark, path + s"/_bloom.v$v.tsv"))
          delete(spark, path + s"/_bloom.v$v.tsv")
      }
      // schema files: keep the one the OLDEST retained version inherits
      // (schemaAt walks downward) and everything newer
      val schemaVersions = fs(spark, path)
        .globStatus(new org.apache.hadoop.fs.Path(path + "/_schema.v*.json"))
        .toSeq.map(_.getPath.getName.stripPrefix("_schema.v")
          .stripSuffix(".json").toInt)
      val effective = schemaVersions.filter(_ <= retained.min)
        .maxOption.getOrElse(0)
      schemaVersions.filter(_ < effective).foreach(v =>
        delete(spark, path + s"/_schema.v$v.json"))
      // orphan sweep: every parquet part under the data dirs that no
      // retained manifest references
      val fsys = fs(spark, path)
      val parts = fsys
        .globStatus(new org.apache.hadoop.fs.Path(path + "/d*/*"))
        .toSeq.filter(_.isFile)
      var dropped = 0
      parts.foreach { st =>
        val p = st.getPath
        val keep = p.getName.endsWith(".parquet") &&
          live(p.toUri.getPath)
        if (!keep) { fsys.delete(p, false); dropped += 1 }
      }
      // sweep now-empty data dirs
      fsys.globStatus(new org.apache.hadoop.fs.Path(path + "/d*"))
        .foreach { st =>
          if (st.isDirectory && fsys.listStatus(st.getPath).isEmpty)
            fsys.delete(st.getPath, false)
        }
      (expired.size, dropped)
    }
  }

  /** INCREMENTAL READ between two versions (the Delta change-data-feed
    * idea restricted to what a manifest can answer): the rows of every
    * data file present in `toV`'s manifest but not in `fromV`'s. For an
    * append-only history (the ingest case — each version adds files and
    * carries the rest verbatim) this is EXACTLY the rows added in
    * `(fromV, toV]`, which is what a downstream incremental pipeline
    * consumes per crawl instead of re-reading the table. Across rewrite
    * commits (delete/compact/merge) the new files' rows include
    * rewritten SURVIVORS — row-level change tracking needs per-row
    * lineage the format deliberately does not carry; callers diff by key
    * downstream when they must span a rewrite.
    */
  def changes(spark: SparkSession, path: String, fromV: Int,
              toV: Int): DataFrame = {
    require(fromV <= toV, s"need fromV <= toV, got $fromV > $toV")
    val before = manifest(spark, path, Some(fromV)).map(_.file).toSet
    val added = manifest(spark, path, Some(toV))
      .filterNot(s => before(s.file)).map(_.file)
    val schema = schemaAt(spark, path, toV)
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(added: _*)
  }

  /** The version log — one row per committed, still-retained version
    * with its file and row totals: the table-format inspection surface
    * (what `DESCRIBE HISTORY` shows on Delta); versions expired by
    * [[vacuum]] drop out. Driver-side and version-count-sized.
    */
  def history(spark: SparkSession, path: String): Seq[(Int, Int, Long)] =
    committedVersions(spark, path)
      .filter(v => exists(spark, path + s"/_manifest.v$v.tsv"))
      .map { v =>
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
        val parts = line.split("\t")
        val extra = parts.drop(4).toSeq.map {
          case "-" => None
          case s =>
            val Array(a, b) = s.split(":")
            Some((a.toLong, b.toLong))
        }
        FileStat(parts(0), parts(1).toLong, parts(2).toLong,
          parts(3).toLong, extra)
      }
  }

  /** The data files a `[lo, hi]` probe of the PRIMARY stat column must
    * read.
    */
  def selectFiles(spark: SparkSession, path: String, lo: Long, hi: Long,
                  version: Option[Int] = None): Seq[String] =
    manifest(spark, path, version)
      .filter(s => s.max >= lo && s.min <= hi).map(_.file)

  /** The data files a `[lo, hi]` probe of registered stat column
    * `colName` (primary or secondary) must read. Files with no non-null
    * values in a secondary column prune away (null never matches a
    * range).
    */
  def selectFilesBy(spark: SparkSession, path: String, colName: String,
                    lo: Long, hi: Long,
                    version: Option[Int] = None): Seq[String] = {
    val cols2 = statCols2(spark, path)
    val i = cols2.indexOf(colName)
    if (i < 0) selectFiles(spark, path, lo, hi, version) // primary
    else manifest(spark, path, version).filter(s =>
      s.extra.lift(i).flatten.exists { case (mn, mx) =>
        mx >= lo && mn <= hi
      }).map(_.file)
  }

  /** The schema `version` was committed under: the newest evolution at
    * or below it (versions without an evolution inherit downward).
    */
  def schemaAt(spark: SparkSession, path: String, version: Int): StructType = {
    val evolutions = fs(spark, path)
      .globStatus(new org.apache.hadoop.fs.Path(path + "/_schema.v*.json"))
      .toSeq
      .map(_.getPath.getName.stripPrefix("_schema.v").stripSuffix(".json").toInt)
      .filter(_ <= version)
    val src =
      if (evolutions.isEmpty) path + "/_schema.json" // pre-evolution tables
      else path + s"/_schema.v${evolutions.max}.json"
    DataType.fromJson(readText(spark, src)).asInstanceOf[StructType]
  }

  /** Range probe of a snapshot version (default: current) on the PRIMARY
    * stat column: manifest-pruned file list + the residual filter. The
    * result is exactly `read(version).where(statCol between lo and hi)`,
    * but Spark only ever lists, opens, and scans the overlapping files.
    */
  def scan(spark: SparkSession, path: String, statCol: String,
           lo: Long, hi: Long, version: Option[Int] = None): DataFrame =
    scanBy(spark, path, statCol, lo, hi, version)

  /** Range probe on ANY registered stat column (primary or secondary) —
    * multi-column zone-map pruning: the same manifest prune and residual
    * filter, driven by that column's per-file bands.
    */
  def scanBy(spark: SparkSession, path: String, colName: String,
             lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    val schema = schemaAt(spark, path, v)
    val files = selectFilesBy(spark, path, colName, lo, hi, Some(v))
    val base =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.where(col(colName) >= lo && col(colName) <= hi)
  }
}
