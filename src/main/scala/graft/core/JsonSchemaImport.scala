package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** JSON-Schema / OpenAPI → StructType importer (reference:
  * logging-service/app/lib/jsonschema.py:104-135): an EXTERNAL schema
  * document — not a compiled case class — can drive the whole ETL.
  *
  * Faithful to the reference's mapping:
  *   - `$ref` resolves (by trailing path segment) to a named schema and
  *     becomes a nested struct (`to_structure`, :103-109);
  *   - `array` recurses into `items` (:115-117);
  *   - an engine-type override wins over the JSON type — the reference's
  *     `duckdb_type` escape hatch (:121-122); here `spark_type` (a Spark DDL
  *     string) is the native spelling and `duckdb_type` is honoured through
  *     a small alias table for cross-engine documents;
  *   - a plain `object` is an UNTYPED document → VariantType (the
  *     reference's `JSON` column, :123-124 — SURVEY §1.2 maps untyped JSON
  *     to Spark 4 VARIANT);
  *   - `string`/`integer`/`number`/`boolean` → VARCHAR/BIGINT/DOUBLE/BOOLEAN
  *     (:125-132);
  *   - anything else raises, never silently degrades (:134).
  */
final class JsonSchemaImport private (schemas: Map[String, JsonNode]) {

  def schemaNames: Seq[String] = schemas.keys.toSeq.sorted

  /** The named schema as a StructType (must be `"type": "object"`). */
  def structType(name: String): StructType = {
    val node = schemas.getOrElse(name,
      throw new IllegalArgumentException(s"unknown schema $$ref '$name'"))
    require(node.path("type").asText() == "object",
      s"schema '$name' is not an object schema")
    StructType(node.path("properties").properties().asScala.toSeq.map { e =>
      StructField(e.getKey, fieldType(e.getValue), nullable = true)
    })
  }

  /** The schema's `required` field list (drives Validation rules). */
  def required(name: String): Seq[String] =
    schemas.get(name).map(_.path("required").elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Nil)

  /** Schema document → full Contract: parse schema + required fields +
    * numeric bounds (JSON-Schema `minimum`/`maximum`, the properties the
    * reference's profiler writes back, dataops/app/profile.py:21-39).
    */
  def contract(table: String, name: String): Contract = {
    val node = schemas(name)
    val bounds = node.path("properties").properties().asScala.toSeq.flatMap { e =>
      val mn = Option(e.getValue.get("minimum")).map(_.asDouble())
      val mx = Option(e.getValue.get("maximum")).map(_.asDouble())
      if (mn.isDefined || mx.isDefined) Some(e.getKey -> FieldBounds(mn, mx)) else None
    }.toMap
    Contract(table, structType(name), required(name), bounds)
  }

  private val duckdbAliases = Map(
    "VARCHAR" -> StringType, "BIGINT" -> LongType, "INTEGER" -> IntegerType,
    "DOUBLE" -> DoubleType, "FLOAT" -> FloatType, "BOOLEAN" -> BooleanType,
    "TIMESTAMP" -> TimestampType, "DATE" -> DateType, "JSON" -> VariantType)

  private def fieldType(config: JsonNode): DataType = {
    if (config.has("$ref")) {
      structType(config.get("$ref").asText().split("/").last)
    } else if (config.has("spark_type")) {
      DataType.fromDDL(config.get("spark_type").asText())
    } else if (config.has("duckdb_type")) {
      val t = config.get("duckdb_type").asText().toUpperCase
      duckdbAliases.getOrElse(t, DataType.fromDDL(t))
    } else config.path("type").asText() match {
      case "array"   => ArrayType(fieldType(config.path("items")))
      case "object"  => VariantType
      case "string"  => StringType
      case "integer" => LongType
      case "number"  => DoubleType
      case "boolean" => BooleanType
      case other     =>
        throw new IllegalArgumentException(s"Unknown type $other")
    }
  }
}

object JsonSchemaImport {

  /** Parse a schema document: an OpenAPI file (`components.schemas`), a
    * JSON-Schema bundle (`$defs`), or a single self-titled object schema.
    */
  def parse(doc: String): JsonSchemaImport = {
    val root = new ObjectMapper().readTree(doc)
    val named =
      if (root.path("components").has("schemas")) root.path("components").path("schemas")
      else if (root.has("$defs")) root.path("$defs")
      else null
    val schemas =
      if (named != null)
        named.properties().asScala.map(e => e.getKey -> e.getValue).toMap
      else {
        val title = if (root.has("title")) root.get("title").asText() else "root"
        Map(title -> root)
      }
    new JsonSchemaImport(schemas)
  }
}
