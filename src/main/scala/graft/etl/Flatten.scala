package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema flattening: nested struct/array-of-struct schemas → a flat, ordered
  * list of `__`-joined column paths, and the Column expressions that extract
  * them.
  *
  * Semantics follow the reference ETL (reference: logging-service/app/
  * migrate.py:13-29 for path generation, etl.py:40-65 for extraction):
  *   - a struct hop is plain field access (`a__b` → `d.a.b`);
  *   - an array hop maps the remaining path over the elements
  *     (`transform(col, x => …)`), producing a *list column* — row count is
  *     preserved, never exploded (reference: tests/test_searches.py:61-67
  *     pins `results__score = [1.0]`).
  *
  * Arbitrary nesting (struct-in-array-in-struct …) is supported; each array
  * level contributes one level of list nesting, exactly like DuckDB's
  * `list_transform` composition in the reference.
  */
object Flatten {

  /** Flattened `__`-joined column paths of `schema`, in schema field order.
    * Arrays recurse into their element type without adding a path segment.
    */
  def columnPaths(schema: StructType): Seq[String] = {
    def walk(dt: DataType, prefix: Vector[String]): Seq[Vector[String]] = dt match {
      case s: StructType   => s.fields.toSeq.flatMap(f => walk(f.dataType, prefix :+ f.name))
      case ArrayType(e, _) => walk(e, prefix)
      case _               => Seq(prefix)
    }
    walk(schema, Vector.empty).map(_.mkString("__"))
  }

  /** Data type of each flattened path's extracted column: struct hops
    * descend, each array hop wraps the remainder in one list level (the
    * row-preserving list semantics of [[extract]]).
    */
  def pathTypes(schema: StructType): Map[String, DataType] = {
    def walk(dt: DataType, prefix: Vector[String]): Seq[(Vector[String], DataType)] = dt match {
      case s: StructType   => s.fields.toSeq.flatMap(f => walk(f.dataType, prefix :+ f.name))
      case ArrayType(e, n) => walk(e, prefix).map { case (p, t) => (p, ArrayType(t, n)) }
      case leaf            => Seq((prefix, leaf))
    }
    walk(schema, Vector.empty).map { case (p, t) => p.mkString("__") -> t }.toMap
  }

  /** Column extracting `path` (already split on `__`) from `col`, whose data
    * type is `dt`. Struct hops become field accesses; array hops become
    * `transform` over the element type.
    */
  def extract(col: Column, dt: DataType, path: List[String]): Column = (dt, path) match {
    case (_, Nil) => col
    case (s: StructType, h :: t) =>
      val idx = s.fieldIndex(h) // throws on unknown field, like the reference
      extract(col.getField(h), s.fields(idx).dataType, t)
    case (ArrayType(el, _), p) =>
      transform(col, x => extract(x, el, p))
    case (other, p) =>
      throw new IllegalArgumentException(
        s"cannot descend into $other with remaining path ${p.mkString("__")}")
  }

  /** Select the flattened projection of struct column `structCol` (typed
    * `schema`) of `df`, one output column per entry of `paths`, each aliased
    * to its `__`-joined path.
    */
  def select(df: DataFrame, structCol: String, schema: StructType,
             paths: Seq[String]): DataFrame = {
    val cols = paths.map { p =>
      extract(df(structCol), schema, p.split("__").toList).as(p)
    }
    df.select(cols: _*)
  }
}
