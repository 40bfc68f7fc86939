package graft

import graft.core.{Contracts, FieldBounds, Validation}
import graft.etl.Migrate
import graft.profile.Profile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("bounds violations are collected per (loc, type)") {
    val df = Seq(("a", 0.5), ("b", 1.5), ("c", -0.1), ("d", 1.0))
      .toDF("key", "probability")
    val rules = Validation.boundsRules(
      Map("probability" -> FieldBounds(Some(0.0), Some(1.0))))
    val counts = Validation.violationCounts(df, rules).collect()
    assert(counts.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("probability", "range", 2L)))
    val (valid, invalid) = Validation.split(df, rules)
    assert(valid.count() == 2 && invalid.count() == 2)
  }

  test("countsWithValid fuses valid total and per-rule counts in one pass") {
    val df = Seq(("a", 0.5), ("b", 1.5), ("c", -0.1), ("d", 1.0))
      .toDF("key", "probability")
    val rules = Validation.boundsRules(
      Map("probability" -> FieldBounds(Some(0.0), Some(1.0)))) ++
      Seq(Validation.Rule("key", "missing", col("key").isNull))
    val rows = Validation.countsWithValid(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // valid total agrees with split(); zero-count rules omitted, valid kept
    assert(rows == Set(("_valid", "ok", 2L), ("probability", "range", 2L)))
    // one wide aggregate: the plan scans the source exactly once
    val scans = Validation.countsWithValid(df, rules).queryExecution
      .executedPlan.toString.split("\n").count(_.contains("LocalTableScan"))
    assert(scans == 1)
    // empty input: the ok row reports 0 (split()._1.count() parity), never
    // NULL (sum over zero rows)
    val empty = Validation.countsWithValid(df.limit(0), rules).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(empty == Seq(("_valid", "ok", 0L)))
  }

  test("required rules treat null as missing; defaults fill nulls") {
    val df = Seq((Some(1L), "x"), (None, "y")).toDF("id", "name")
    val rules = Validation.requiredRules(
      Contracts.searches.copy(required = Seq("id")))
    val (valid, invalid) = Validation.split(df, rules)
    assert(valid.count() == 1 && invalid.count() == 1)
    val filled = Validation.withDefaults(df, Map("id" -> lit(99L)))
    assert(filled.where($"id" === 99L).count() == 1)
  }

  test("profile summarize matches hand-computed stats and feeds bounds") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val p = Profile.summarize(df, Seq("x"), exact = true)
    val r = p.collect().head
    assert(r.getAs[Double]("col_min") == 1.0)
    assert(r.getAs[Double]("col_max") == 4.0)
    assert(r.getAs[Double]("col_avg") == 2.5)
    assert(r.getAs[Double]("q50") == 2.5)
    assert(r.getAs[Long]("col_cnt") == 4L)
    assert(r.getAs[Long]("null_cnt") == 0L)
    assert(r.getAs[Long]("n_distinct") == 4L)
    val (bounds, required) = Profile.toBounds(p)
    assert(bounds("x") == FieldBounds(Some(1.0), Some(4.0)))
    assert(required == Seq("x"))
  }

  test("dround matches binary-value rounding on the boundary that breaks Spark round()") {
    import graft.functions.Rounding
    // 0.42574999999999996 * 1e4 == 4257.5 exactly in fp: DuckDB rounds to
    // 0.4258; Spark's decimal-string round() yields 0.4257. dround must take
    // the binary path. (Regression for the quality_score sf0.1 mismatch.)
    val vals = Seq(0.42574999999999996, 2.5, -2.5, 0.494999999, 1.0051234)
      .toDF("x")
    val got = vals.select(Rounding.dround($"x", 4).as("r")).as[Double].collect().toSeq
    assert(got == Seq(0.4258, 2.5, -2.5, 0.495, 1.0051))
    // x*100*100 hits the same exact-4257.5 product → rounds up, consistently
    assert(vals.select(Rounding.cents($"x" * 100)).as[Long].collect().toSeq ==
      Seq(4258, 25000, -25000, 4950, 10051))
  }

  test("table cache flag resolves repeated loads to one in-memory relation") {
    import graft.core.Tables
    spark.conf.set("spark.graft.cacheTables", "true")
    try {
      val a = Tables(spark, "/root/testdata/sf0.001", "region")
      a.count() // materialize
      val b = Tables(spark, "/root/testdata/sf0.001", "region")
      assert(b.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
    } finally {
      spark.conf.unset("spark.graft.cacheTables")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("table loads are memoized per session and re-cache after clearCache") {
    import graft.core.Tables
    // memoization: the same session gets the same resolved plan object —
    // no repeated directory listing / footer read
    val a = Tables(spark, "/root/testdata/sf0.001", "nation")
    val b = Tables(spark, "/root/testdata/sf0.001", "nation")
    assert(a eq b)
    // the cache guard consults the CacheManager on every call, so a
    // clearCache() between loads re-engages the warehouse cache
    spark.conf.set("spark.graft.cacheTables", "true")
    try {
      Tables(spark, "/root/testdata/sf0.001", "nation").count()
      spark.sharedState.cacheManager.clearCache()
      val c = Tables(spark, "/root/testdata/sf0.001", "nation")
      c.count()
      assert(c.queryExecution.withCachedData.toString.contains("InMemoryRelation"))
    } finally {
      spark.conf.unset("spark.graft.cacheTables")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("flatten rejects unknown fields and non-descendable paths") {
    import graft.etl.Flatten
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", StructType(Seq(StructField("b", LongType))))))
    intercept[IllegalArgumentException] {
      Flatten.extract(col("x"), schema, List("a", "b", "c")) // descend into a leaf
    }
    intercept[IllegalArgumentException] {
      Flatten.extract(col("x"), schema, List("nope"))
    }
  }

  test("reference contracts carry their declared bounds and requireds") {
    val d = Contracts.decisions
    assert(d.bounds("probability") == FieldBounds(Some(0.0), Some(1.0)))
    assert(d.required == Seq("key", "context", "action", "probability"))
    assert(Contracts.searches.defaults.contains("timestamp_micros"))
    // the agrawal contract mirrors the dataops table shape
    assert(Contracts.agrawal.schema.fieldNames.toSeq ==
      Seq("salary", "commission", "age", "elevel", "car", "zipcode", "hvalue", "hyears", "loan"))
  }

  test("GraftSession builder config and extensions wire up") {
    // can't start a second context cheaply; assert builder-produced settings
    // via a session derived from the active one + explicit registration
    import graft.core.GraftSession
    GraftSession.registerFunctions(spark)
    assert(spark.sql("SELECT graft_dotd(array(1.0d), array(2.0d))").collect().head.getDouble(0) == 2.0)
    // bad literal arg for minhash k is rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('a'), 'oops')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("oops"))
  }

  test("migration is append-only and old parquet reads null-filled") {
    val prev = StructType(Seq(StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", LongType))))))
    val next = StructType(Seq(StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", LongType),
        StructField("d", StringType)))),
      StructField("e", DoubleType)))
    assert(Migrate.addedPaths(prev, next) == Seq("b__d", "e"))
    val evolved = Migrate.evolve(Seq("a", "b__c"), next)
    assert(evolved == Seq("a", "b__c", "b__d", "e"))
    // dropping a stored column must throw
    val dropped = StructType(Seq(StructField("a", LongType)))
    intercept[IllegalArgumentException] { Migrate.evolve(Seq("a", "b__c"), dropped) }
    // old file lacks the new column; read back null-filled in evolved order
    val dir = tmpDir("migrate") + "/t"
    Seq((1L, 2L)).toDF("a", "b__c").write.parquet(dir)
    val back = Migrate.readWithColumns(spark, dir, evolved,
      Map("b__d" -> StringType, "e" -> DoubleType))
    assert(back.columns.toSeq == evolved)
    val row = back.collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(2) && row.isNullAt(3))
    // round-trip of the column-list file format
    assert(Migrate.parseList(Migrate.render(evolved)) == evolved)
  }

  test("deterministic Agrawal generator: reproducible, partition-invariant, contract-conforming") {
    import graft.etl.Synthetic
    val a = Synthetic.agrawal(spark, 500).collect().toSeq
    val b = Synthetic.agrawal(spark, 500).collect().toSeq
    assert(a == b) // same seed → identical corpus
    val c = Synthetic.agrawal(spark, 500, numPartitions = 7)
      .orderBy("id").collect().toSeq
    assert(c == a.sortBy(_.getLong(0))) // partitioning never changes values
    // a different seed is a different corpus
    assert(Synthetic.agrawal(spark, 500, seed = 7L).collect().toSeq != a)
    // domains conform to the agrawal contract shape (the DQ-loop input)
    val df = Synthetic.agrawal(spark, 500)
    val fields = graft.core.Contracts.agrawal.schema.fieldNames.toSeq
    assert(fields.forall(df.columns.contains))
    val r = df.agg(min("salary"), max("salary"), min("age"), max("age"),
      min("zipcode"), max("zipcode"), max("commission")).collect().head
    assert(r.getDouble(0) >= 20000.0 && r.getDouble(1) <= 150000.0)
    assert(r.getInt(2) >= 20 && r.getInt(3) <= 80)
    assert(r.getInt(4) >= 0 && r.getInt(5) <= 8)
    assert(r.getDouble(6) <= 75000.0)
    // commission rule: zero iff salary >= 75k
    assert(df.where(col("salary") >= 75000.0 && col("commission") =!= 0.0).count() == 0)
    assert(df.where(col("salary") < 75000.0 && col("commission") < 10000.0).count() == 0)
    // the generated corpus passes its own profiled bounds (closed DQ loop)
    val rules = Validation.boundsRules(
      Map("salary" -> FieldBounds(Some(20000.0), Some(150000.0)),
        "loan" -> FieldBounds(Some(0.0), Some(500000.0))))
    val (valid, invalid) = Validation.split(df, rules)
    assert(valid.count() == 500 && invalid.count() == 0)
  }

  test("an external JSON-Schema document drives the ETL end-to-end") {
    import graft.core.JsonSchemaImport
    // openapi-style document: $ref nesting, arrays, required, bounds, the
    // engine-type escape hatch, and an untyped object
    val doc =
      """{"components": {"schemas": {
        |  "UserRef": {"type": "object", "properties": {"id": {"type": "integer"}},
        |              "required": ["id"]},
        |  "SearchResult": {"type": "object", "properties": {
        |      "document_id": {"type": "integer"}, "position": {"type": "integer"},
        |      "score": {"type": "number"}}},
        |  "SearchEvent": {"type": "object", "properties": {
        |      "timestamp_micros": {"type": "integer"},
        |      "user": {"$ref": "#/components/schemas/UserRef"},
        |      "query_id": {"type": "string"},
        |      "raw_query": {"type": "string"},
        |      "probability": {"type": "number", "minimum": 0, "maximum": 1},
        |      "note": {"type": "string", "spark_type": "decimal(10,2)"},
        |      "flags": {"type": "string", "duckdb_type": "BIGINT"},
        |      "extra": {"type": "object"},
        |      "results": {"type": "array",
        |                  "items": {"$ref": "#/components/schemas/SearchResult"}}},
        |    "required": ["user", "query_id", "raw_query"]}
        |}}}""".stripMargin
    val imp = JsonSchemaImport.parse(doc)
    val st = imp.structType("SearchEvent")
    // reference mapping: integer→BIGINT, number→DOUBLE, $ref→struct,
    // array→list, object→untyped (VARIANT), engine overrides win
    assert(st("timestamp_micros").dataType == LongType)
    assert(st("user").dataType == StructType(Seq(StructField("id", LongType))))
    assert(st("results").dataType ==
      ArrayType(StructType(Seq(StructField("document_id", LongType),
        StructField("position", LongType), StructField("score", DoubleType)))))
    assert(st("note").dataType == DecimalType(10, 2))
    assert(st("flags").dataType == LongType)
    assert(st("extra").dataType == VariantType)
    // unknown types raise, like the reference (jsonschema.py:134)
    intercept[IllegalArgumentException] {
      JsonSchemaImport.parse("""{"title": "X", "type": "object",
        "properties": {"f": {"type": "mystery"}}}""").structType("X")
    }
    // the imported contract carries required + bounds and runs the real ETL
    val contract = imp.contract("searches_ext", "SearchEvent")
    assert(contract.required == Seq("user", "query_id", "raw_query"))
    assert(contract.bounds ==
      Map("probability" -> graft.core.FieldBounds(Some(0.0), Some(1.0))))
    val bronze = Seq(
      (1L, """{"user":{"id":7},"query_id":"q1","raw_query":"spark","probability":0.5,"results":[{"document_id":3,"position":1,"score":0.9}]}"""),
      (2L, """{"query_id":"q2","raw_query":"missing user"}"""),
      (3L, """{"user":{"id":8},"query_id":"q3","raw_query":"oob","probability":7.5}"""))
      .toDF("ts", "data")
    val (silver, invalid) = graft.etl.Etl.run(bronze, contract)
    assert(silver.columns.toSeq == Seq("timestamp_micros", "user__id",
      "query_id", "raw_query", "probability", "note", "flags", "extra",
      "results__document_id", "results__position", "results__score"))
    val ok = silver.select("user__id", "query_id").as[(Long, String)].collect().toSeq
    assert(ok == Seq((7L, "q1")))
    assert(invalid.count() == 2) // missing required user + probability bound
  }

  test("JSON-Schema export round-trips every contract through the importer") {
    import graft.core.{Contract, Contracts, JsonSchemaExport, JsonSchemaImport}
    // the importer (reference-faithful) builds every field nullable; the
    // round-trip identity is modulo that flag
    def nn(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nn(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(nn(a.elementType), containsNull = true)
      case m: MapType => MapType(nn(m.keyType), nn(m.valueType),
        valueContainsNull = true)
      case o => o
    }
    val all = Seq(Contracts.searches, Contracts.clicks, Contracts.decisions,
      Contracts.rewards, Contracts.agrawal)
    val doc = JsonSchemaExport.document(all)
    val imp = JsonSchemaImport.parse(doc)
    all.foreach { c =>
      val back = imp.contract(c.table, c.table)
      assert(back.schema == nn(c.schema), s"schema drift for ${c.table}")
      assert(back.required == c.required, s"required drift for ${c.table}")
      assert(back.bounds == c.bounds, s"bounds drift for ${c.table}")
    }
    // exotic Spark types travel via the spark_type escape hatch
    val exotic = Contract("exotic", StructType(Seq(
      StructField("d", DecimalType(10, 2)), StructField("t", TimestampType),
      StructField("i", IntegerType), StructField("f", FloatType),
      StructField("bin", BinaryType),
      StructField("m", MapType(StringType, LongType)))), required = Seq("d"))
    val back = JsonSchemaImport.parse(JsonSchemaExport.document(Seq(exotic)))
      .contract("exotic", "exotic")
    assert(back.schema == nn(exotic.schema) && back.required == Seq("d"))
    // the document carries the reference's paths -> schema wiring
    assert(doc.contains("/log/searches") &&
      doc.contains("#/components/schemas/searches"))
  }

  test("schema snapshots drive migration purely from disk state") {
    val dir = tmpDir("schemastore") + "/t"
    val v1 = StructType(Seq(StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", LongType))))))
    val v2 = StructType(Seq(StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", LongType),
        StructField("d", StringType)))),
      StructField("tags", ArrayType(StructType(Seq(StructField("t", StringType)))))))
    // first migration: version 1, snapshot written
    assert(Migrate.migrateFromDisk(spark, dir, v1) == ((1, Seq("a", "b__c"))))
    // second migration reads ONLY the disk snapshot — no in-memory state
    val (ver2, cols2) = Migrate.migrateFromDisk(spark, dir, v2)
    assert(ver2 == 2 && cols2 == Seq("a", "b__c", "b__d", "tags__t"))
    // the persisted snapshot round-trips the full StructType
    val (loadedSchema, loadedCols) = Migrate.loadVersion(spark, dir, 2)
    assert(loadedSchema == v2 && loadedCols == cols2)
    assert(Migrate.latestVersion(spark, dir).contains(2))
    // dropping a stored path is rejected, and no new version is written
    val droppedSchema = StructType(Seq(StructField("a", LongType)))
    intercept[IllegalArgumentException] {
      Migrate.migrateFromDisk(spark, dir, droppedSchema)
    }
    assert(Migrate.latestVersion(spark, dir).contains(2))
    // pathTypes from the loaded snapshot feeds the null-filled read path:
    // array-of-struct leaf reads back as a list column
    val types = graft.etl.Flatten.pathTypes(loadedSchema)
    assert(types("tags__t") == ArrayType(StringType))
    val pdir = tmpDir("schemastore_data")
    Seq((1L, 2L)).toDF("a", "b__c").write.mode("overwrite").parquet(pdir)
    val back = Migrate.readWithColumns(spark, pdir, loadedCols, types)
    assert(back.columns.toSeq == loadedCols)
    assert(back.schema("tags__t").dataType == ArrayType(StringType))
  }
}
