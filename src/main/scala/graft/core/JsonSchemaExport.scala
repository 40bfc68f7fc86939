package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

/** StructType/Contract → JSON-Schema (OpenAPI-style) exporter — the inverse
  * of [[JsonSchemaImport]] and the analog of the reference's schema
  * snapshot writer (logging-service/app/lib/jsonschema.py:52-56
  * `save_as_current` dumps the openapi.json document the services then
  * re-read). Emitting the same document shape closes the round trip:
  * `parse(document(cs)).contract(t, t)` rebuilds every contract.
  *
  * Mapping (each arm chosen so [[JsonSchemaImport.fieldType]] maps it
  * back to the original Spark type):
  *   - STRING/BIGINT/DOUBLE/BOOLEAN → `string`/`integer`/`number`/`boolean`;
  *   - ArrayType → `array` + `items`;
  *   - VariantType (untyped document) → plain `object`;
  *   - a nested StructType hoists into `components.schemas` under a
  *     deterministic `<Parent>_<field>` name and is referenced by `$ref` —
  *     JSON Schema's (and the reference openapi.json's) shape for nested
  *     records;
  *   - every other Spark type uses the importer's native `spark_type`
  *     escape hatch (`DataType.fromDDL(t.sql)` is the identity);
  *   - `required` lists and numeric bounds (`minimum`/`maximum`, the
  *     fields the profiler writes back, dataops/app/profile.py:21-39)
  *     ride the schema node.
  *
  * Nullability is NOT encoded: JSON Schema expresses presence via
  * `required`, and the importer (faithful to the reference) builds every
  * field nullable — so the round trip is identity modulo nullable flags.
  * Column DEFAULTS are runtime Column expressions and likewise have no
  * JSON-Schema spelling (the reference's defaults live in Pydantic code,
  * not in openapi.json).
  */
object JsonSchemaExport {

  private val mapper = new ObjectMapper()

  /** OpenAPI-style document for `contracts`: `components.schemas` holds one
    * object schema per contract (named by its table) plus hoisted nested
    * structs, and `paths` carries the reference's `POST /log/<table>` →
    * schema wiring (jsonschema.py:61-68 reads it back as tabledefs).
    */
  def document(contracts: Seq[Contract]): String = {
    val root = mapper.createObjectNode()
    val schemas = mapper.createObjectNode()
    val paths = root.putObject("paths")
    contracts.foreach { c =>
      val post = paths.putObject(s"/log/${c.table}").putObject("post")
      post.putObject("requestBody").putObject("content")
        .putObject("application/json").putObject("schema")
        .put("$ref", s"#/components/schemas/${c.table}")
      schemas.set[ObjectNode](c.table, schemaNode(c, schemas))
      ()
    }
    root.putObject("components").set[ObjectNode]("schemas", schemas)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** The object-schema node for one contract; nested structs hoist into
    * `into` (the shared components.schemas node).
    */
  private def schemaNode(c: Contract, into: ObjectNode): ObjectNode = {
    val node = objectNode(c.table, c.schema, into)
    if (c.required.nonEmpty) {
      val req = node.putArray("required")
      c.required.foreach(req.add)
    }
    c.bounds.toSeq.sortBy(_._1).foreach { case (field, b) =>
      val props = node.get("properties").asInstanceOf[ObjectNode]
      val fn = props.get(field) match {
        case o: ObjectNode => o
        case _ => props.putObject(field)
      }
      b.min.foreach(fn.put("minimum", _))
      b.max.foreach(fn.put("maximum", _))
    }
    node
  }

  private def objectNode(name: String, st: StructType,
                         into: ObjectNode): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("type", "object")
    val props = node.putObject("properties")
    st.fields.foreach { f =>
      props.set[ObjectNode](f.name, typeNode(s"${name}_${f.name}", f.dataType, into))
      ()
    }
    node
  }

  private def typeNode(path: String, dt: DataType,
                       into: ObjectNode): ObjectNode = dt match {
    case StringType => mapper.createObjectNode().put("type", "string")
    case LongType => mapper.createObjectNode().put("type", "integer")
    case DoubleType => mapper.createObjectNode().put("type", "number")
    case BooleanType => mapper.createObjectNode().put("type", "boolean")
    case VariantType => mapper.createObjectNode().put("type", "object")
    case ArrayType(e, _) =>
      val n = mapper.createObjectNode().put("type", "array")
      n.set[ObjectNode]("items", typeNode(path, e, into))
      n
    case st: StructType =>
      into.set[ObjectNode](path, objectNode(path, st, into))
      mapper.createObjectNode().put("$ref", s"#/components/schemas/$path")
    case other =>
      // the importer's engine-type escape hatch: DDL round-trips exactly
      mapper.createObjectNode().put("spark_type", other.sql)
  }
}
