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
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot `$path` v$version"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(path, version, tableSchema)
}

/** Turns Catalyst's pushed-down conjunction into manifest pruning.
  * Only filters over REGISTERED columns participate (anything else
  * stays residual-only); bounds on one column intersect.
  */
private[sources] class SnapshotScanBuilder(path: String, version: Int,
                                           tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val spark = SparkSession.active
  private val (primary, secondaries) =
    Snapshot.registeredStatCols(spark, path)
  private val bloomCol = Snapshot.bloomColumn(spark, path)
  private val rangeCols = (primary +: secondaries).toSet

  private var required: StructType = tableSchema
  private var accepted: Array[Filter] = Array.empty

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
    // fold the accepted conjunction into per-column [lo, hi] bounds and
    // bloom equality probes
    var ranges = Map.empty[String, (Long, Long)]
    var bloomEq = List.empty[String]
    def num(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
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
      case GreaterThan(a, v) => num(v).foreach(x => tighten(a, x + 1, Long.MaxValue))
      case GreaterThanOrEqual(a, v) => num(v).foreach(x => tighten(a, x, Long.MaxValue))
      case LessThan(a, v) => num(v).foreach(x => tighten(a, Long.MinValue, x - 1))
      case LessThanOrEqual(a, v) => num(v).foreach(x => tighten(a, Long.MinValue, x))
      case _ => ()
    }
    val files = Snapshot.selectFilesConj(spark, path, ranges, bloomEq,
      Some(version))
    org.apache.spark.sql.graftbridge.ParquetDelegate.buildPruned(
      org.apache.spark.sql.graftbridge.ParquetDelegate.scanBuilder(
        spark, files, tableSchema, Map.empty),
      required, accepted, tableSchema)
  }
}
