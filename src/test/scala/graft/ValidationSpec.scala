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
}
