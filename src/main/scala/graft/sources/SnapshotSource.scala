package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Snapshot

/** DataSource V2 connector for the graft snapshot table format — the
  * idiomatic front door: `spark.read.format("graft-snapshot")
  * .load(path)` (plus `.option("version", n)` for time travel) gives a
  * plain DataFrame whose FILTERS Catalyst pushes into the connector,
  * where they become MANIFEST pruning:
  *
  *   - range predicates on the primary/secondary stat columns prune via
  *     the per-file zone maps ([[Snapshot.selectFilesBy]]),
  *   - equality predicates on the registered bloom column prune via the
  *     per-file bloom sidecar ([[Snapshot.selectFilesEq]]),
  *   - conjunctions intersect ([[Snapshot.selectFilesConj]]).
  *
  * The surviving file list is handed to Spark's OWN DSv2 parquet scan
  * (via [[org.apache.spark.sql.graftbridge.ParquetDelegate]]), which
  * keeps vectorized decode, whole-stage codegen, column pruning, and
  * row-group pushdown — the connector decides WHAT to read, Spark's
  * parquet reader decides HOW. Every pushed filter is ALSO returned as
  * a residual, so Spark re-applies it above the scan: a pruning bug can
  * cost performance, never correctness... and the pruned set is exact
  * anyway because the residual only ever sees surviving files' rows.
  *
  * At 100 TB this is the zone-map story with zero API: analysts write
  * `WHERE ts BETWEEN ...` over the registered columns and the probe
  * schedules ~overlap/table of the splits, same as the [[Snapshot.scan]]
  * helper but through any SQL/DataFrame front end.
  */
class SnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot needs a table path: spark.read.format(\"graft-snapshot\").load(path)")
    p
  }

  private def versionOf(spark: SparkSession, path: String,
                        options: CaseInsensitiveStringMap): Int =
    Option(options.get("version")).map(_.trim.toInt)
      .getOrElse(Snapshot.current(spark, path))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    Snapshot.schemaAt(spark, path, versionOf(spark, path, options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val spark = SparkSession.active
    val path = pathOf(options)
    new SnapshotTable(path, versionOf(spark, path, options), schema)
  }
}

private[sources] class SnapshotTable(path: String, version: Int,
                                     tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String = s"graft-snapshot `$path` v$version"
  override def schema(): StructType = tableSchema
  override def properties(): java.util.Map[String, String] = {
    // surface the registration on DESCRIBE EXTENDED / SHOW TBLPROPERTIES
    val spark = SparkSession.active
    val (primary, secondaries) = Snapshot.registeredStatCols(spark, path)
    val m = new java.util.HashMap[String, String]()
    m.put("statcol", primary)
    if (secondaries.nonEmpty) m.put("statcols2", secondaries.mkString(","))
    Snapshot.bloomColumn(spark, path).foreach(c => m.put("bloomcol", c))
    m.put("version", version.toString)
    m
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(path, version, tableSchema,
      Option(options.get("startingVersion")).map(_.trim.toInt))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SnapshotWriteBuilder(path, info.schema(), info.options(),
      info.queryId())

  // ---- DELETE FROM: the metadata path ------------------------------------
  // A predicate that folds to a single [lo, hi] conjunction on the
  // PRIMARY stat column takes Snapshot.delete's O(overlap) copy-on-write
  // (zero data I/O when no file overlaps); anything else falls through
  // to the row-level rewrite below (canDeleteWhere = false).

  private def primaryCol: String =
    Snapshot.registeredStatCols(SparkSession.active, path)._1

  private def foldRange(filters: Array[Filter])
      : Option[Option[(Long, Long)]] = {
    // None = not metadata-expressible; Some(None) = delete EVERYTHING
    // (TRUNCATE); Some(Some(lo, hi)) = one range on the primary column
    val primary = primaryCol
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Byte => Some(n.longValue())
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Long => Some(n.longValue())
      case _ => None
    }
    if (filters.isEmpty ||
        filters.forall { case _: AlwaysTrue => true; case _ => false })
      return Some(None)
    var lo = Long.MinValue
    var hi = Long.MaxValue
    val ok = filters.forall {
      case EqualTo(a, v) if a == primary =>
        num(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x); true }
      case GreaterThan(a, v) if a == primary =>
        num(v).exists { x =>
          x != Long.MaxValue && { lo = math.max(lo, x + 1); true } }
      case GreaterThanOrEqual(a, v) if a == primary =>
        num(v).exists { x => lo = math.max(lo, x); true }
      case LessThan(a, v) if a == primary =>
        num(v).exists { x =>
          x != Long.MinValue && { hi = math.min(hi, x - 1); true } }
      case LessThanOrEqual(a, v) if a == primary =>
        num(v).exists { x => hi = math.min(hi, x); true }
      case _ => false
    }
    if (ok) Some(Some((lo, hi))) else None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    foldRange(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    foldRange(filters) match {
      case Some(Some((lo, hi))) =>
        Snapshot.delete(spark, path, primaryCol, lo, hi)
      case Some(None) => // TRUNCATE: everything out, schema kept
        Snapshot.delete(spark, path, primaryCol, Long.MinValue,
          Long.MaxValue)
      case None => throw new IllegalArgumentException(
        s"deleteWhere called with non-metadata filters: " +
          filters.mkString(", "))
    }
  }

  // ---- UPDATE / MERGE INTO / general DELETE: group-based rewrite ---------
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new SnapshotRowLevelOperation(path, version, tableSchema,
      info.command())
}

/** Group-based COPY-ON-WRITE row-level operation (what Spark's
  * `RewriteMergeIntoTable` / `RewriteUpdateTable` /
  * `RewriteDeleteFromTable` plan as `ReplaceData`): the scan reads the
  * base version UNPRUNED — every file is a group being replaced — Spark
  * computes the complete post-operation contents (matched rows
  * transformed, unmatched rows copied), the connector's inline-stats
  * writers land them range-clustered, and the commit swaps the WHOLE
  * manifest at the base version through the optimistic protocol
  * (aborting loudly if anything committed concurrently). O(table) by
  * design — the Delta/Iceberg copy-on-write posture; the library
  * [[Snapshot.merge]] stays the O(overlap) path on the cluster key.
  */
private[sources] class SnapshotRowLevelOperation(
    path: String, baseVersion: Int, tableSchema: StructType,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = { () =>
    val spark = SparkSession.active
    if (Snapshot.hasDeletionVectors(spark, path, baseVersion))
      throw new IllegalStateException(
        s"graft-snapshot $path v$baseVersion carries deletion vectors, " +
          "which this SQL rewrite does not mask; compact the table first")
    // the FULL base version: a pruned file would silently vanish from
    // the table when the rewrite swaps the manifest
    val files = Snapshot.manifest(spark, path, Some(baseVersion))
      .map(_.file)
    new SnapshotScan(path, tableSchema,
      org.apache.spark.sql.graftbridge.ParquetDelegate.buildPruned(
        org.apache.spark.sql.graftbridge.ParquetDelegate.scanBuilder(
          spark, files, tableSchema, Map.empty),
        tableSchema, Array.empty, tableSchema))
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write = {
        val spark = SparkSession.active
        val (primary, secondaries) =
          Snapshot.registeredStatCols(spark, path)
        new SnapshotWrite(path, tableSchema, primary, secondaries,
          Snapshot.bloomConfExternal(spark, path),
          SnapshotCommitMode.Rewrite(baseVersion), nFiles = 0)
      }
    }
}

/** Turns Catalyst's pushed-down conjunction into manifest pruning.
  * Only filters over REGISTERED columns participate (anything else
  * stays residual-only); bounds on one column intersect.
  * `startingVersion` (the read option) turns the scan into an
  * INCREMENTAL read: only files ADDED in `(startingVersion, version]`
  * participate — the change-data-feed consumption through the plain
  * DSv2 front door, composing with zone-map/bloom pruning.
  */
private[sources] class SnapshotScanBuilder(path: String, version: Int,
                                           tableSchema: StructType,
                                           startingVersion: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private val spark = SparkSession.active
  private val (primary, secondaries) =
    Snapshot.registeredStatCols(spark, path)
  private val bloomCol = Snapshot.bloomColumn(spark, path)
  private val rangeCols = (primary +: secondaries).toSet

  private var required: StructType = tableSchema
  private var accepted: Array[Filter] = Array.empty
  private var aggPushed: Option[(StructType, Seq[Any])] = None

  // ---- aggregate pushdown: COUNT/MIN/MAX answered from the MANIFEST ----
  // Spark only attempts this when every filter was consumed (none are —
  // we keep all residual), so an accepted aggregation is WHOLE-TABLE:
  // count(*) = manifest row totals, min/max of a registered stat column
  // = the extremes of its per-file bands (nulls excluded on both sides —
  // SQL MIN/MAX ignore nulls and secondary bands span non-null values).
  // The scan then produces ONE pre-aggregated row and reads NO data —
  // `SELECT count(*) FROM t` through any SQL front end is a pure
  // metadata answer, the Iceberg/Delta stats-count through Spark's own
  // pushdown contract. Refused whenever it cannot be exact: group-bys,
  // unsupported functions, unregistered columns, deletion-vector masks
  // (count could subtract them, but a masked row may hold the min),
  // or an incremental-read window.
  private def aggAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (agg.groupByExpressions().nonEmpty || accepted.nonEmpty ||
        startingVersion.isDefined ||
        Snapshot.hasDeletionVectors(spark, path, version))
      return None
    val m = Snapshot.manifest(spark, path, Some(version))
    def bandOf(name: String): Option[(Option[Long], Option[Long])] =
      if (name == primary)
        Some((m.map(_.min).minOption, m.map(_.max).maxOption))
      else {
        val i = secondaries.indexOf(name)
        if (i < 0) None
        else Some((m.flatMap(_.extra.lift(i).flatten.map(_._1)).minOption,
          m.flatMap(_.extra.lift(i).flatten.map(_._2)).maxOption))
      }
    def typed(name: String, v: Option[Long]): Option[Any] =
      tableSchema.fields.find(_.name == name).map(_.dataType match {
        case org.apache.spark.sql.types.IntegerType =>
          v.map(_.toInt).orNull
        case org.apache.spark.sql.types.LongType =>
          v.map(Long.box).orNull
        case _ => return None // non-integral stat columns never registered
      })
    val cols = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.types.StructField]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    agg.aggregateExpressions().foreach {
      case _: CountStar =>
        cols += org.apache.spark.sql.types.StructField("count(*)",
          org.apache.spark.sql.types.LongType, nullable = false)
        vals += m.map(_.rows).sum
      case mn: Min => mn.column() match {
        case f: NamedReference if f.fieldNames().length == 1 =>
          val name = f.fieldNames()(0)
          val band = bandOf(name).getOrElse(return None)
          val v = typed(name, band._1).getOrElse(return None)
          cols += tableSchema.fields.find(_.name == name).get
            .copy(name = s"min($name)", nullable = true)
          vals += v
        case _ => return None
      }
      case mx: Max => mx.column() match {
        case f: NamedReference if f.fieldNames().length == 1 =>
          val name = f.fieldNames()(0)
          val band = bandOf(name).getOrElse(return None)
          val v = typed(name, band._2).getOrElse(return None)
          cols += tableSchema.fields.find(_.name == name).get
            .copy(name = s"max($name)", nullable = true)
          vals += v
        case _ => return None
      }
      case _ => return None
    }
    Some((StructType(cols.toSeq), vals.toSeq))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = aggAnswer(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    aggPushed = aggAnswer(agg)
    aggPushed.isDefined
  }

  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => rangeCols(a) || bloomCol.contains(a)
    case GreaterThan(a, _) => rangeCols(a)
    case GreaterThanOrEqual(a, _) => rangeCols(a)
    case LessThan(a, _) => rangeCols(a)
    case LessThanOrEqual(a, _) => rangeCols(a)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(prunable)
    filters // EVERYTHING stays residual: pruning is an optimization tier
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    aggPushed.foreach { case (schema, values) =>
      return new SnapshotAggScan(path, schema, values)
    }
    // fold the accepted conjunction into per-column [lo, hi] bounds and
    // bloom equality probes
    var ranges = Map.empty[String, (Long, Long)]
    var bloomEq = List.empty[String]
    // INTEGRAL literals only: zone-map bands are longs, and deriving a
    // bound from a fractional literal via longValue() truncation would
    // PRUNE WRONG (LessThan(a, 10.5) -> hi = 9 drops files whose band
    // starts at 10 — rows the residual can never recover because pruned
    // files are never scanned). Spark's unwrap-cast rule normalizes
    // literals to the integral column type today; this guard keeps the
    // tier safe if a decimal/double stat column ever reaches pushdown.
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Byte => Some(n.longValue())
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Long => Some(n.longValue())
      case _ => None
    }
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges += c -> (math.max(l0, lo), math.min(h0, hi))
    }
    accepted.foreach {
      case EqualTo(a, v) if rangeCols(a) =>
        num(v).foreach(x => tighten(a, x, x))
      case EqualTo(a, v) if bloomCol.contains(a) =>
        bloomEq ::= String.valueOf(v)
      case GreaterThan(a, v) => num(v).foreach(x =>
        if (x != Long.MaxValue) tighten(a, x + 1, Long.MaxValue))
      case GreaterThanOrEqual(a, v) => num(v).foreach(x => tighten(a, x, Long.MaxValue))
      case LessThan(a, v) => num(v).foreach(x =>
        if (x != Long.MinValue) tighten(a, Long.MinValue, x - 1))
      case LessThanOrEqual(a, v) => num(v).foreach(x => tighten(a, Long.MinValue, x))
      case _ => ()
    }
    // reader-version gate: this scan tier delegates wholesale to Spark's
    // parquet batch and cannot apply row-ordinal masks — REFUSE a table
    // with deletion vectors loudly rather than leak deleted rows (the
    // same gate real formats apply when rolling DVs out to old readers)
    if (Snapshot.hasDeletionVectors(spark, path, version))
      throw new IllegalStateException(
        s"graft-snapshot $path v$version carries deletion vectors, which " +
          "this DSv2 reader does not mask; compact the table first or " +
          "read via Snapshot.scan")
    val pruned = Snapshot.selectFilesConj(spark, path, ranges, bloomEq,
      Some(version)).toSet
    // incremental read: restrict to the files ADDED in the window
    val before: Set[String] = startingVersion match {
      case Some(sv) if sv > 0 =>
        Snapshot.manifest(spark, path, Some(sv)).map(_.file).toSet
      case _ => Set.empty
    }
    val stats = Snapshot.manifest(spark, path, Some(version))
      .filter(s => pruned(s.file) && !before(s.file))
    val files = stats.map(_.file)
    new SnapshotScan(path, tableSchema,
      org.apache.spark.sql.graftbridge.ParquetDelegate.buildPruned(
        org.apache.spark.sql.graftbridge.ParquetDelegate.scanBuilder(
          spark, files, tableSchema, Map.empty),
        required, accepted, tableSchema),
      // exact post-pruning cardinality from the manifest — Catalyst's
      // join planning (broadcast thresholds) sees the PRUNED size, not
      // the whole table's
      rowCount = Some(stats.map(_.rows).sum),
      rowWidth = required.defaultSize)
  }
}

/** The connector's Scan: batch reads delegate wholesale; streaming
  * reads turn the VERSION LOG into micro-batches
  * ([[SnapshotMicroBatchStream]]). Reports MANIFEST-exact statistics
  * for the pruned file set (`SupportsReportStatistics`), so Catalyst's
  * cost decisions — the broadcast-join threshold above all — see the
  * size a probe actually reads instead of a whole-table guess.
  */
private[sources] class SnapshotScan(
    path: String, tableSchema: StructType,
    delegate: Scan, rowCount: Option[Long] = None, rowWidth: Int = 0)
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    delegate.toBatch
  override def description(): String = s"graft-snapshot $path"
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        rowCount.map(n => java.util.OptionalLong.of(
          n * math.max(1, rowWidth))).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        rowCount.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
    }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SnapshotMicroBatchStream(path, tableSchema)
}

/** The pre-aggregated one-row Scan a complete aggregate pushdown
  * returns: the values came from the manifest on the driver; the "scan"
  * reads zero data files.
  */
private[sources] class SnapshotAggScan(path: String, aggSchema: StructType,
                                       values: Seq[Any])
    extends Scan with org.apache.spark.sql.connector.read.Batch {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"graft-snapshot $path [manifest aggregate]"
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    Array(SnapshotAggPartition(values))
  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    SnapshotAggReaderFactory()
}

private[sources] final case class SnapshotAggPartition(values: Seq[Any])
    extends org.apache.spark.sql.connector.read.InputPartition

private[sources] final case class SnapshotAggReaderFactory()
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(
      partition: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val vs = partition.asInstanceOf[SnapshotAggPartition].values
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(vs)
      override def close(): Unit = ()
    }
}

/** STREAMING source over the table format — tail the version log (the
  * Delta streaming-source idea): each committed version is an offset,
  * each micro-batch reads exactly the data files that version window
  * ADDED ([[Snapshot.changes]] semantics — append-only ingest is the
  * intended producer; a rewrite commit's batch includes rewritten
  * survivors). Offsets are plain version numbers, so restarts resume
  * from the checkpoint exactly; the actual reading is Spark's own
  * parquet batch over the window's files.
  *
  * Wire as `spark.readStream.format("graft-snapshot").load(path)` —
  * the stream starts from version 0 (a full-table bootstrap batch, the
  * changes(0, v) read) and then follows new commits.
  */
private[sources] class SnapshotMicroBatchStream(
    path: String, tableSchema: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // The offset carries the table's INCARNATION id beside the version:
  // bare version numbers would let a checkpointed stream silently stall
  // after an overwrite (new table's current < old offset) and then
  // resume mid-stream with wrong windows once the numbers climb back.
  private case class VersionOffset(epoch: String, v: Int) extends Offset {
    override def json(): String = s"$epoch:$v"
  }

  private def spark = SparkSession.active

  private def currentEpoch: String = Snapshot.tableEpoch(spark, path)

  private def checkEpoch(o: VersionOffset): Int = {
    if (o.epoch != currentEpoch)
      throw new IllegalStateException(
        s"snapshot $path was REPLACED since this stream's checkpoint " +
          s"(offset epoch ${o.epoch}, table epoch $currentEpoch); " +
          "restart the stream with a fresh checkpoint")
    o.v
  }

  override def initialOffset(): Offset = VersionOffset(currentEpoch, 0)

  override def latestOffset(): Offset =
    VersionOffset(currentEpoch, Snapshot.current(spark, path))

  override def deserializeOffset(json: String): Offset = {
    val i = json.lastIndexOf(':')
    VersionOffset(json.take(i), json.drop(i + 1).trim.toInt)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val fromV = checkEpoch(start.asInstanceOf[VersionOffset])
    val toV = checkEpoch(end.asInstanceOf[VersionOffset])
    if (fromV >= toV)
      return Array.empty
    if (Snapshot.hasDeletionVectors(spark, path, toV))
      throw new IllegalStateException(
        s"graft-snapshot $path v$toV carries deletion vectors, which the " +
          "streaming reader does not mask; compact the table first")
    val before =
      if (fromV == 0) Set.empty[String]
      else Snapshot.manifest(spark, path, Some(fromV)).map(_.file).toSet
    val added = Snapshot.manifest(spark, path, Some(toV))
      .filterNot(s => before(s.file)).map(_.file)
    org.apache.spark.sql.graftbridge.ParquetDelegate
      .batchFor(spark, added, tableSchema).planInputPartitions()
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    // file-agnostic: the parquet reader factory reads any FilePartition
    // of this schema, whichever window planned it
    org.apache.spark.sql.graftbridge.ParquetDelegate
      .batchFor(spark, Nil, tableSchema).createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---- the WRITE path -------------------------------------------------------

/** `df.write.format("graft-snapshot").mode("append"|"overwrite")
  * .save(path)` — the DSv2 write half of the connector, over an
  * EXISTING snapshot table (creation stays [[Snapshot.write]], where
  * the stat/bloom registration lives):
  *
  *   - the Write declares `RequiresDistributionAndOrdering` on the
  *     table's PRIMARY stat column, so SPARK plans the range exchange
  *     and local sort that give each output file a narrow zone-map band
  *     — the clustering contract is declarative, not imperative;
  *   - every writer computes its file's statistics INLINE while
  *     streaming rows through Spark's own parquet writer (bridged): the
  *     zone-map min/max, secondary bands, null fail-fast, and the bloom
  *     sidecar bits all ride the write itself — ZERO post-write stats
  *     pass (the helper API pays one);
  *   - the driver commit assembles the per-file messages into a
  *     manifest delta and runs the SAME optimistic commit protocol as
  *     every other writer (append rebases, overwrite replaces as a
  *     transactional v1).
  *
  * Task retries are safe by construction: files are attempt-unique and
  * only files named in COMMIT MESSAGES enter the manifest — an aborted
  * attempt's file is an unreferenced orphan [[Snapshot.vacuum]] sweeps.
  */
private[sources] class SnapshotWriteBuilder(
    path: String, writeSchema: StructType,
    options: CaseInsensitiveStringMap, queryId: String = "")
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var replaceAll = false

  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    replaceAll = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    val spark = SparkSession.active
    val (primary, secondaries) = Snapshot.registeredStatCols(spark, path)
    val stored = Snapshot.schemaAt(spark, path,
      Snapshot.current(spark, path))
    val storedSet = stored.fields.map(f => (f.name, f.dataType)).toSet
    val writeSet = writeSchema.fields.map(f => (f.name, f.dataType)).toSet
    require(storedSet == writeSet,
      s"graft-snapshot write schema must match the stored schema exactly " +
        s"(stored: ${stored.simpleString}; write: ${writeSchema.simpleString}); " +
        "evolve through Snapshot.append")
    val nFiles = Option(options.get("nfiles")).map(_.toInt).getOrElse(0)
    new SnapshotWrite(path, writeSchema, primary, secondaries,
      Snapshot.bloomConfExternal(spark, path),
      if (replaceAll) SnapshotCommitMode.Truncate
      else SnapshotCommitMode.Append, nFiles, queryId = queryId)
  }
}

/** How a DSv2 batch write commits: an additive append, a whole-table
  * REPLACE (fresh incarnation), or a manifest REWRITE at a known base
  * version (the row-level-operation path).
  */
private[sources] sealed trait SnapshotCommitMode
private[sources] object SnapshotCommitMode {
  case object Append extends SnapshotCommitMode
  case object Truncate extends SnapshotCommitMode
  final case class Rewrite(baseVersion: Int) extends SnapshotCommitMode
}

private[sources] class SnapshotWrite(
    path: String, writeSchema: StructType, primary: String,
    secondaries: Seq[String], bloom: Option[(String, Int, Int)],
    mode: SnapshotCommitMode, nFiles: Int, queryId: String = "")
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}

  private def order = Array(
    Expressions.sort(Expressions.column(primary), SortDirection.ASCENDING))

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.ordered(order)

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = order

  override def requiredNumPartitions(): Int = nFiles // 0 = Spark decides

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
    val spark = SparkSession.active
    new SnapshotBatchWrite(path,
      Snapshot.dataDirFor(spark, path),
      org.apache.spark.sql.graftbridge.ParquetWriteDelegate
        .writeConf(spark, writeSchema),
      writeSchema, primary, secondaries, bloom, mode)
  }

  /** NATIVE streaming sink —
    * `df.writeStream.format("graft-snapshot").start(path)`: each
    * micro-batch commits as one snapshot version through the SAME
    * optimistic protocol, with the stream's query id as the txn-map
    * writer identity — so a crash-redelivered epoch is a no-op and
    * ingestion is exactly-once end to end, with no `foreachBatch`
    * wrapper. Spark plans the range clustering from the declared
    * distribution exactly as in batch writes.
    */
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(mode == SnapshotCommitMode.Append,
      "graft-snapshot streaming writes are append-only (outputMode " +
        "append); complete/truncate is not supported")
    val spark = SparkSession.active
    new SnapshotStreamingWrite(path,
      Snapshot.dataDirFor(spark, path),
      org.apache.spark.sql.graftbridge.ParquetWriteDelegate
        .writeConf(spark, writeSchema),
      writeSchema, primary, secondaries, bloom,
      if (queryId == null || queryId.isEmpty) "stream" else queryId)
  }
}

private[sources] class SnapshotStreamingWrite(
    path: String, dataDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    writeSchema: StructType, primary: String, secondaries: Seq[String],
    bloom: Option[(String, Int, Int)], writerId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    SnapshotStreamingWriterFactory(dataDir, conf, writeSchema, primary,
      secondaries, bloom)

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val spark = SparkSession.active
    val ms = messages.collect {
      case m: SnapshotCommitMessage if m.rows > 0 => m
    }.sortBy(_.file)
    graft.core.Snapshot.commitExternalBatch(spark, path,
      ms.map(m => graft.core.Snapshot.FileStat(m.file, m.min, m.max,
        m.rows, m.extra)).toSeq,
      ms.flatMap(m => m.bloomB64.map(b => m.file -> b)).toSeq,
      batchId = epochId, writerId = writerId)
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    messages.foreach {
      case m: SnapshotCommitMessage if m.file != null =>
        val p = new org.apache.hadoop.fs.Path(m.file)
        p.getFileSystem(hconf).delete(p, false)
      case _ => ()
    }
  }
}

private[sources] final case class SnapshotStreamingWriterFactory(
    dataDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    writeSchema: StructType, primary: String, secondaries: Seq[String],
    bloom: Option[(String, Int, Int)])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new SnapshotDataWriter(dataDir, conf, writeSchema, primary,
      secondaries, bloom, partitionId, taskId)
}

private[sources] final case class SnapshotCommitMessage(
    file: String, min: Long, max: Long, rows: Long,
    extra: Seq[Option[(Long, Long)]], bloomB64: Option[String])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class SnapshotBatchWrite(
    path: String, dataDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    writeSchema: StructType, primary: String, secondaries: Seq[String],
    bloom: Option[(String, Int, Int)], mode: SnapshotCommitMode)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    SnapshotWriterFactory(dataDir, conf, writeSchema, primary,
      secondaries, bloom)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val spark = SparkSession.active
    val ms = messages.collect {
      case m: SnapshotCommitMessage if m.rows > 0 => m
    }.sortBy(_.file)
    val delta = ms.map(m =>
      graft.core.Snapshot.FileStat(m.file, m.min, m.max, m.rows, m.extra))
    val bloomRows = ms.flatMap(m => m.bloomB64.map(b => m.file -> b))
    mode match {
      case SnapshotCommitMode.Rewrite(base) =>
        graft.core.Snapshot.commitExternalRewrite(spark, path,
          delta.toSeq, bloomRows.toSeq, base)
      case m =>
        graft.core.Snapshot.commitExternal(spark, path, delta.toSeq,
          bloomRows.toSeq, m == SnapshotCommitMode.Truncate)
    }
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    messages.foreach {
      case m: SnapshotCommitMessage if m.file != null =>
        val p = new org.apache.hadoop.fs.Path(m.file)
        p.getFileSystem(hconf).delete(p, false)
      case _ => ()
    }
  }
}

private[sources] final case class SnapshotWriterFactory(
    dataDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    writeSchema: StructType, primary: String, secondaries: Seq[String],
    bloom: Option[(String, Int, Int)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new SnapshotDataWriter(dataDir, conf, writeSchema, primary,
      secondaries, bloom, partitionId, taskId)
}

/** One output file per (range-clustered, sorted) input partition, with
  * the file's zone-map row and bloom bits computed inline. Lazy open:
  * an empty partition writes nothing (no empty-file manifest rows).
  */
private[sources] class SnapshotDataWriter(
    dataDir: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    writeSchema: StructType, primary: String, secondaries: Seq[String],
    bloom: Option[(String, Int, Int)], partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[
      org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  private val file = f"$dataDir/part-$partitionId%05d-" +
    java.util.UUID.randomUUID().toString.replace("-", "").take(12) +
    ".snappy.parquet"
  private var writer:
    org.apache.spark.sql.graftbridge.ParquetWriteDelegate.ParquetRowWriter = _

  private def longAt(row: InternalRow, i: Int): Long =
    writeSchema.fields(i).dataType match {
      case LongType => row.getLong(i)
      case IntegerType => row.getInt(i).toLong
      case dt => throw new IllegalArgumentException(
        s"stat column '${writeSchema.fields(i).name}' must be integral, " +
          s"got ${dt.simpleString}")
    }

  private val pIdx = writeSchema.fieldIndex(primary)
  private val sIdx = secondaries.map(writeSchema.fieldIndex)
  private val bIdx = bloom.map(b => writeSchema.fieldIndex(b._1))

  private var rows = 0L
  private var mn = Long.MaxValue
  private var mx = Long.MinValue
  private val sMn = Array.fill(sIdx.size)(Long.MaxValue)
  private val sMx = Array.fill(sIdx.size)(Long.MinValue)
  private val sSeen = Array.fill(sIdx.size)(false)
  private val bits: Array[Long] =
    bloom.map(b => new Array[Long](b._2 / 64)).getOrElse(Array.empty)

  // Spark's group-based row-level rewrite (ReplaceData) PREPENDS an int
  // `__row_operation` column to every row and only projects it away for
  // operations that declare metadata attributes — a connector without
  // them receives the raw layout. Detect it by arity and view the data
  // columns through a projection; reject any op code that isn't a plain
  // "write this row" so a future delta-shaped plan can never be
  // silently misread as data.
  private val opView = new org.apache.spark.sql.catalyst.ProjectingInternalRow(
    writeSchema, (1 to writeSchema.length).toIndexedSeq)
  private def unwrap(row: InternalRow): InternalRow =
    if (row.numFields == writeSchema.length) row
    else if (row.numFields == writeSchema.length + 1) {
      val op = row.getInt(0)
      require(op == org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_OPERATION ||
          op == org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
        s"unexpected row-level operation code $op in a group-based write")
      opView.project(row)
      opView
    } else throw new IllegalStateException(
      s"write row has ${row.numFields} fields for a " +
        s"${writeSchema.length}-column table")

  override def write(rawRow: InternalRow): Unit = {
    val row = unwrap(rawRow)
    if (writer == null)
      writer = org.apache.spark.sql.graftbridge.ParquetWriteDelegate
        .openWriter(conf, file, partitionId, taskId)
    if (row.isNullAt(pIdx))
      throw new IllegalArgumentException(
        s"statCol '$primary' has a NULL row; zone maps require a " +
          "non-null cluster column")
    val k = longAt(row, pIdx)
    if (k < mn) mn = k
    if (k > mx) mx = k
    sIdx.indices.foreach { j =>
      if (!row.isNullAt(sIdx(j))) {
        val v = longAt(row, sIdx(j))
        sSeen(j) = true
        if (v < sMn(j)) sMn(j) = v
        if (v > sMx(j)) sMx(j) = v
      }
    }
    bIdx.foreach { i =>
      if (!row.isNullAt(i)) {
        val s = writeSchema.fields(i).dataType match {
          case StringType => row.getUTF8String(i).toString
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case dt => String.valueOf(row.get(i, dt))
        }
        val (_, mBits, kk) = bloom.get
        graft.functions.Bloom.positions(s, mBits, kk).foreach { p =>
          bits((p >>> 6).toInt) |= (1L << (p & 63))
        }
      }
    }
    rows += 1
    writer.write(row)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (writer != null) writer.close()
    val extra = sIdx.indices.map(j =>
      if (sSeen(j)) Some((sMn(j), sMx(j))) else None)
    val b64 =
      if (bits.isEmpty || rows == 0) None
      else {
        val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
        bits.foreach(bb.putLong)
        Some(java.util.Base64.getEncoder.encodeToString(bb.array()))
      }
    // record the FULLY-QUALIFIED URI (scheme + authority from the
    // file's own filesystem — hdfs://nn/..., s3a://..., file:/...): a
    // hardcoded scheme would point manifest entries of a remote table
    // at the LOCAL filesystem
    val p = new org.apache.hadoop.fs.Path(file)
    val uri = p.getFileSystem(conf.value).makeQualified(p).toUri.toString
    SnapshotCommitMessage(if (rows == 0) null else uri, mn, mx, rows,
      extra, b64)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val p = new org.apache.hadoop.fs.Path(file)
    p.getFileSystem(conf.value).delete(p, false)
  }

  override def close(): Unit = ()
}
