package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Snapshot

/** SQL front door for the snapshot table format — a Spark
  * `TableCatalog` (the Iceberg/Delta catalog-integration idea), so the
  * whole tier is reachable from PURE SQL with zero library API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.SnapshotCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  *
  *   CREATE TABLE graft.db.events (k BIGINT, v STRING)
  *     TBLPROPERTIES ('statcol' = 'k')          -- zone-map cluster key
  *   INSERT INTO graft.db.events ...            -- DSv2 append (inline stats)
  *   SELECT * FROM graft.db.events WHERE k > 5  -- manifest pruning
  *   SELECT * FROM graft.db.events VERSION AS OF 1   -- time travel
  *   DELETE FROM graft.db.events WHERE k BETWEEN 2 AND 9
  *   UPDATE graft.db.events SET v = 'x' WHERE k = 3
  *   MERGE INTO graft.db.events t USING batch s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Tables are directories under the warehouse
  * (`<warehouse>/<namespace...>/<name>`); every identifier maps to the
  * same on-disk protocol the library API drives, so SQL and library
  * callers interoperate on one table. `CREATE TABLE` registers the
  * zone-map/bloom columns from table properties (`statcol` required;
  * `statcols2` comma-separated; `bloomcol` optional) and commits an
  * empty v1. DELETE takes the METADATA path when its predicate is a
  * range/equality conjunction on the cluster key
  * ([[SnapshotTable.canDeleteWhere]] → [[Snapshot.delete]]'s
  * O(overlap) copy-on-write); everything else — general DELETE, UPDATE,
  * MERGE INTO — rides Spark's group-based row-level-operation plan
  * (`ReplaceData`): the operation's scan reads the base version
  * UNPRUNED (every file is a group being replaced), Spark computes the
  * full new contents, the connector's writers land it with inline
  * stats, and the commit swaps the whole manifest at the base version —
  * optimistic-abort on any concurrent commit. That is O(table) by
  * design, exactly Delta/Iceberg's copy-on-write posture without file
  * filtering; the library [[Snapshot.merge]] stays the O(overlap) path
  * for key-clustered upserts.
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def fs = new org.apache.hadoop.fs.Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def isTable(path: String): Boolean =
    Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(path + "/_commit.v*")))
      .exists(_.nonEmpty) // some FileSystems glob nonexistent -> null

  override def tableExists(ident: Identifier): Boolean =
    isTable(pathOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(_.isDirectory)
      .filter(st => isTable(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    new SnapshotTable(path, Snapshot.current(spark, path),
      Snapshot.schemaAt(spark, path, Snapshot.current(spark, path)))
  }

  /** `VERSION AS OF <n>` time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    val v = version.toInt
    new SnapshotTable(path, v, Snapshot.schemaAt(spark, path, v))
  }

  /** `TIMESTAMP AS OF <t>` time travel: the newest version committed at
    * or before the timestamp (markers record commit wall time).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    val v = Snapshot.versionAsOf(spark, path, timestampMicros)
    new SnapshotTable(path, v, Snapshot.schemaAt(spark, path, v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft-snapshot tables cluster on 'statcol' instead of partitioning")
    val props = properties.asScala
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    val statCol = prop("statcol").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE needs TBLPROPERTIES('statcol' = '<cluster column>')"))
    val statCols2 = prop("statcols2").toSeq
      .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty)
    Snapshot.create(spark, pathOf(ident), schema, statCol, statCols2,
      bloomCol = prop("bloomcol"),
      bloomBits = prop("bloombits").map(_.toInt).getOrElse(1024),
      bloomK = prop("bloomk").map(_.toInt).getOrElse(4))
    loadTable(ident)
  }

  /** `ALTER TABLE ADD COLUMN(S)` — the one DDL evolution the append-only
    * contract allows: top-level columns appended as a pure-metadata
    * commit ([[Snapshot.addColumns]]); anything else (drop, rename,
    * retype, reposition, nesting) is rejected loudly.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val added = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "graft-snapshot supports adding TOP-LEVEL columns only")
        require(a.position() == null,
          "append-only evolution adds columns at the END only")
        org.apache.spark.sql.types.StructField(a.fieldNames()(0),
          a.dataType(), a.isNullable)
      case other => throw new UnsupportedOperationException(
        s"append-only evolution supports ADD COLUMN only, got $other")
    }
    Snapshot.addColumns(spark, pathOf(ident), added)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (!isTable(path)) false
    else fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent))
      throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    fs.rename(new org.apache.hadoop.fs.Path(pathOf(oldIdent)),
      new org.apache.hadoop.fs.Path(pathOf(newIdent)))
  }

  // ---- namespaces: directories under the warehouse ----------------------

  override def listNamespaces(): Array[Array[String]] = {
    val p = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .filterNot(st => isTable(st.getPath.toString))
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace))
        throw new NoSuchNamespaceException(namespace)
      Array.empty // one level is enough for the warehouse layout
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      fs.exists(new org.apache.hadoop.fs.Path(
        (warehouse +: namespace.toSeq).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit =
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq).mkString("/")))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) false
    else fs.delete(new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq).mkString("/")), cascade)
  }
}
