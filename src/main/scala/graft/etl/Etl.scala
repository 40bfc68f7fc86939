package graft.etl

import graft.core.{Contract, Validation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bronze→silver ETL pipeline (reference: logging-service/app/etl.py:
  * 17-73): raw `(ts LONG, data STRING)` JSON log rows → contract-typed
  * struct → flattened, ordered, columnar silver table → Parquet.
  *
  * Catalyst collapses parse + flatten into a single Project over the scan
  * (JSON column pruning prunes the parse to the selected paths), so the whole
  * pipeline is one shuffle-free stage — the shape that scales linearly with
  * input bytes on a real cluster.
  */
object Etl {

  /** E1: parse the JSON payload with the contract schema. Malformed or
    * type-mismatched documents yield NULL fields (PERMISSIVE mode), which the
    * validation split then routes to the invalid side — the Spark analog of
    * Pydantic's 422 (reference: etl.py:29-38 + api.py:12-16).
    */
  def parse(bronze: DataFrame, contract: Contract): DataFrame =
    bronze.select(
      col("ts").as("__ts"),
      col("data"), // raw payload rides along for the invalid-side quarantine
      from_json(col("data"), contract.schema).as("d"))

  /** E2–E4: flatten the parsed struct to the contract's ordered column list
    * (or an explicit evolved list from Migrate).
    */
  def flatten(parsed: DataFrame, contract: Contract,
              paths: Option[Seq[String]] = None): DataFrame =
    Flatten.select(parsed, "d", contract.schema,
      paths.getOrElse(contract.columnPaths))

  /** Full pipeline: parse → default-inject → validity split → flatten valid
    * rows. Returns (silver, invalid). Invalid rows keep raw `data` plus the
    * `_violations` array for quarantine/DQ counting.
    */
  def run(bronze: DataFrame, contract: Contract,
          paths: Option[Seq[String]] = None): (DataFrame, DataFrame) = {
    val parsed = parse(bronze, contract)
    // Validation sees top-level parsed fields by name.
    val top = parsed.select(col("__ts"), col("data"), col("d"), col("d.*"))
    val (valid, invalid) = Validation.split(top, Validation.rules(contract))
    val defaulted = contract.defaults.foldLeft(valid) { case (df, (f, dflt)) =>
      df.withColumn("d", col("d").withField(f, coalesce(col(s"d.$f"), dflt)))
    }
    // Quarantine keeps the ORIGINAL payload — re-serializing the parse would
    // lose it entirely for malformed documents (from_json → null).
    (flatten(defaulted, contract, paths),
     invalid.select(col("__ts"), col("_violations"), col("data")))
  }

  /** S2: silver sink. One call site so partitioning/compaction policy is
    * centralised; partition by a date column at scale.
    */
  def sink(silver: DataFrame, out: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = silver.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(out)
  }

  /** Small-file compaction (OPTIMIZE-style table maintenance): rewrite a
    * parquet directory so files approach `targetFileBytes`. Streaming
    * sinks and frequent small batches leave thousands of KB-sized files;
    * at 100 TB the scan's task count — and the namenode/listing cost — is
    * proportional to FILE count, so compaction is what keeps a
    * continuously-ingested table scannable. Policy:
    *
    *  - target file count = ceil(current bytes / targetFileBytes), from a
    *    filesystem listing (no data job);
    *  - hive-partitioned tables compact WITHIN partitions: the rewrite
    *    repartitions by the partition columns (each output dir gets its
    *    share of files, no cross-partition mixing) and re-writes with the
    *    same partitionBy layout;
    *  - `sortCols` optionally re-applies clustering (e.g. the z-order key
    *    column list) with a range partitioner, preserving min/max
    *    prunability through the rewrite;
    *  - like [[graft.llm.SignatureStore.compact]], the new layout lands in
    *    a sibling directory and swaps in via a THREE-step rename (old aside
    *    → new in → delete old) so the canonical path is only ever absent
    *    for the instant between two renames, never for the duration of a
    *    delete — and a crash mid-swap leaves a complete copy at either the
    *    canonical path or a recovery sibling ([[recoverCompaction]] puts it
    *    back). Run while no writer is active.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                   targetFileBytes: Long = 128L << 20,
                   partitionCols: Seq[String] = Nil,
                   sortCols: Seq[String] = Nil): (Long, Long) = {
    require(partitionCols.isEmpty || sortCols.isEmpty,
      "partitioned + sorted compaction is not supported in one pass")
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(fsPath, true)
    var bytes = 0L
    var nBefore = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        bytes += f.getLen; nBefore += 1
      }
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(path)
    val arranged =
      if (partitionCols.nonEmpty) {
        // files-per-partition-value from a cheap distinct count, so a huge
        // partition value still splits toward the target size instead of
        // collapsing into one giant file
        val nValues = math.max(1L,
          df.select(partitionCols.map(col): _*).distinct().count())
        val perValue = math.max(1L, math.round(nFiles.toDouble / nValues))
        // The slot must be DETERMINISTIC in row content: a repartition keyed
        // on monotonically_increasing_id() re-deals rows differently when a
        // map task is recomputed after executor loss (SPARK-23207), and in a
        // rewrite that then deletes the original data that means silent
        // row loss/duplication. hash(all columns) is stable under retry.
        df.withColumn("_slot",
            pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(perValue.toInt)))
          .repartition(nFiles, (partitionCols.map(col) :+ col("_slot")): _*)
          .drop("_slot")
      } else if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    val tmp = path.stripSuffix("/") + "__compacting"
    val old = path.stripSuffix("/") + "__precompact"
    val w = arranged.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    // Three-step swap: the slow DELETE happens last, on the aside copy, so
    // the canonical path is absent only between two metadata renames. A
    // crash after step 1 leaves the original intact at `old`
    // ([[recoverCompaction]] renames it back); after step 2 both copies
    // exist and recovery just deletes `old`.
    val oldPath = new org.apache.hadoop.fs.Path(old)
    fs.delete(oldPath, true) // clear any leftover from a prior crash
    // HDFS rename reports many failures (missing src, existing dst, quota)
    // as a `false` return, not an exception. An unchecked false here would
    // let the final delete destroy the only remaining copy — so every
    // rename is checked and a failure aborts LOUDLY with both the original
    // and the compacted copy still on disk for [[recoverCompaction]].
    if (!fs.rename(fsPath, oldPath))
      throw new java.io.IOException(
        s"compactFiles: rename($path -> $old) returned false; " +
          s"original left at $path, compacted copy at $tmp")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), fsPath))
      throw new java.io.IOException(
        s"compactFiles: rename($tmp -> $path) returned false; " +
          s"original preserved at $old — run recoverCompaction($path)")
    fs.delete(oldPath, true)
    val it2 = fs.listFiles(fsPath, true)
    var nAfter = 0L
    while (it2.hasNext) {
      if (it2.next().getPath.getName.endsWith(".parquet")) nAfter += 1
    }
    (nBefore, nAfter)
  }

  /** Crash recovery for [[compactFiles]]' three-step swap: if the canonical
    * path is missing but the `__precompact` aside copy exists (crash between
    * rename 1 and rename 2), rename it back; if the canonical path is missing
    * and only a COMPLETE `__compacting` copy remains (its `_SUCCESS` marker
    * proves the write committed), promote it — it is the last copy of the
    * data and must never be deleted; if the canonical path exists (crash
    * before the final delete), drop the stale asides. Call at startup before
    * reading a compaction-managed table. Returns true if a recovery ran.
    */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        path: String): Boolean = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPath = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "__precompact")
    val tmpPath = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "__compacting")
    val tmpComplete = fs.exists(tmpPath) &&
      fs.exists(new org.apache.hadoop.fs.Path(tmpPath, "_SUCCESS"))
    if (fs.exists(oldPath) && !fs.exists(fsPath)) {
      if (!fs.rename(oldPath, fsPath))
        throw new java.io.IOException(
          s"recoverCompaction: rename($oldPath -> $path) returned false")
      fs.delete(tmpPath, true); true
    } else if (!fs.exists(fsPath) && tmpComplete) {
      // Canonical and aside both gone; the committed compacted copy is the
      // ONLY copy — promote it, never delete it.
      if (!fs.rename(tmpPath, fsPath))
        throw new java.io.IOException(
          s"recoverCompaction: rename($tmpPath -> $path) returned false")
      true
    } else if (fs.exists(fsPath) && (fs.exists(oldPath) || fs.exists(tmpPath))) {
      fs.delete(oldPath, true); fs.delete(tmpPath, true); true
    } else false
  }

  /** Bucketed silver sink: co-locates the table on `bucketCol` so joins and
    * aggregations on that key skip the shuffle entirely (both sides bucketed
    * with the same count → SortMergeJoin with zero Exchange). At 100 TB this
    * is the difference between a join that moves the fact table and one that
    * moves nothing.
    */
  def sinkBucketed(silver: DataFrame, tableName: String, bucketCol: String,
                   numBuckets: Int): Unit =
    silver.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Morton (Z-order) code over `cols`: each column is min/max-normalized
    * to a `bits`-bit integer (stats from a broadcast sub-aggregate — one
    * tiny job at any scale) and the bits are interleaved. Pure column
    * arithmetic, no UDF.
    */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 62)
    val statCols = cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"_mn_$c"),
      max(col(c).cast("double")).as(s"_mx_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val maxQ = (1L << bits) - 1
    val quantized = df.crossJoin(broadcast(stats)).select(
      df.columns.toIndexedSeq.map(col) ++ cols.map { c =>
        val mn = col(s"_mn_$c"); val mx = col(s"_mx_$c")
        when(mx === mn, lit(0L)).otherwise(
          least(floor((col(c).cast("double") - mn) / ((mx - mn) / (maxQ + 1))),
            lit(maxQ))).as(s"_q_$c")
      }: _*)
    val morton = (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftrightunsigned(col(s"_q_$c"), b) % 2,
          b * cols.size + i).cast("long")
      }
    }.reduce(_.bitwiseOR(_))
    quantized.withColumn("_z", morton).drop(cols.map(c => s"_q_$c"): _*)
  }

  /** Z-order-clustered silver sink: range-partition + locally sort the
    * table by the interleaved [[zOrderKey]] of `cols`, so parquet row-group
    * and file min/max stats become NEARLY DISJOINT on EVERY one of the
    * z-ordered dimensions at once — a filter on any of them prunes most
    * files before a byte is read. Bucketing co-locates one join key;
    * z-ordering is the layout for multi-dimensional selective scans (the
    * classic layout choice for a 100 TB fact table queried by several
    * dimensions). `numFiles` controls target file granularity (pruning
    * resolution); the write is one range exchange + local sorts — no
    * global single-task sort.
    */
  def sinkZOrdered(silver: DataFrame, out: String, cols: Seq[String],
                   numFiles: Int, bits: Int = 16): Unit =
    zOrderKey(silver, cols, bits)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(out)
}
