package graft

import graft.core.Contracts
import graft.etl.{Etl, Flatten}
import org.apache.spark.sql.Row

/** Mirrors the reference's only automated test (tests/test_searches.py):
  * round-trip a canonical search event through validate→flatten→parquet and
  * assert the exact flattened values, including list-typed results__*.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private val goodJson =
    """{"user":{"id":1},"query_id":"123","raw_query":"test",""" +
      """"results":[{"document_id":1,"position":1,"score":1.0}]}"""
  private val badJson = """{"user":{"id":1},"raw_query":"test"}""" // no query_id

  test("searches column paths match the reference CSV layout") {
    assert(Contracts.searches.columnPaths == Seq(
      "timestamp_micros", "user__id", "query_id", "raw_query",
      "results__document_id", "results__position", "results__score"))
  }

  test("canonical event flattens to the reference's expected values") {
    val bronze = Seq((1L, goodJson), (2L, badJson)).toDF("ts", "data")
    val (silver, invalid) = Etl.run(bronze, Contracts.searches)

    val rows = silver.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("user__id") == 1L)
    assert(r.getAs[String]("query_id") == "123")
    assert(r.getAs[String]("raw_query") == "test")
    assert(r.getAs[scala.collection.Seq[Long]]("results__document_id").toSeq == Seq(1L))
    assert(r.getAs[scala.collection.Seq[Long]]("results__position").toSeq == Seq(1L))
    assert(r.getAs[scala.collection.Seq[Double]]("results__score").toSeq == Seq(1.0))
    assert(r.getAs[Long]("timestamp_micros") > 0L) // default injected

    val inv = invalid.collect()
    assert(inv.length == 1)
    val v = inv.head.getAs[scala.collection.Seq[Row]]("_violations")
    assert(v.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(("query_id", "missing")))
  }

  test("silver survives a parquet round trip") {
    val bronze = Seq((1L, goodJson)).toDF("ts", "data")
    val (silver, _) = Etl.run(bronze, Contracts.searches)
    val out = tmpDir("etl") + "/searches"
    Etl.sink(silver, out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Contracts.searches.columnPaths)
    assert(back.select("results__score").as[Seq[Double]].collect().head == Seq(1.0))
  }

  test("malformed JSON routes to the invalid side, not a crash") {
    val bronze = Seq((1L, "{not json"), (2L, goodJson)).toDF("ts", "data")
    val (silver, invalid) = Etl.run(bronze, Contracts.searches)
    assert(silver.count() == 1)
    assert(invalid.count() == 1)
  }

  test("flatten handles struct-in-array-in-struct nesting") {
    import org.apache.spark.sql.types._
    val inner = StructType(Seq(StructField("c", LongType)))
    val elem = StructType(Seq(StructField("b", inner)))
    val a = StructType(Seq(StructField("xs", ArrayType(elem))))
    val schema = StructType(Seq(StructField("a", a)))
    assert(Flatten.columnPaths(schema) == Seq("a__xs__b__c"))
    val df = spark.read.json(Seq("""{"a":{"xs":[{"b":{"c":7}},{"b":{"c":8}}]}}""").toDS)
    val flat = df.select(
      Flatten.extract(df("a"), schema.fields.head.dataType, List("xs", "b", "c")).as("v"))
    assert(flat.as[Seq[Long]].collect().head == Seq(7L, 8L))
  }
}
