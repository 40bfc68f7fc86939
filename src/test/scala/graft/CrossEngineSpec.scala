package graft

import graft.functions.Rounding
import org.apache.spark.sql.functions._

/** Pins the cross-engine numeric contract the oracle strategy rests on,
  * against values computed BY DuckDB over bit-exact parquet inputs
  * (tools/gen_cross_engine_fixture.py):
  *   - Rounding.dround(x, s) == DuckDB round(x, s) exactly, for arbitrary
  *     doubles including boundary-adversarial ones (Spark's own round()
  *     fails dozens of these);
  *   - DotProductD is within 1 ulp of DuckDB list_inner_product (DuckDB
  *     accumulates pairwise, not sequentially), which is why per-pair dot
  *     products are always rounded (6 dp) before oracle comparison.
  */
class CrossEngineSpec extends SparkSpec {

  private lazy val fixture =
    spark.read.parquet("src/test/resources/duckdb_cross_engine.parquet")

  test("dround agrees exactly with DuckDB round() incl. boundary values") {
    val rounds = fixture.where(col("is_round"))
    assert(rounds.count() == 1000)
    val bad = rounds.where(
      Rounding.dround(col("x"), 4) =!= col("r4") ||
        Rounding.dround(col("x"), 6) =!= col("r6"))
    assert(bad.count() == 0, bad.select("x", "r4", "r6").collect().take(3).mkString(" "))
    // and Spark's built-in round() does NOT hold this contract
    val sparkRoundBad = rounds.where(round(col("x"), 4) =!= col("r4"))
    assert(sparkRoundBad.count() > 0)
  }

  test("DotProductD within 1 ulp of list_inner_product; 6dp-rounded equal") {
    val dots = fixture.where(!col("is_round"))
    assert(dots.count() == 500)
    val withDiff = dots.withColumn("mine", graft.functions.native.dotd(col("a"), col("b")))
    val tol = abs(col("dot")) * 1e-15 + lit(1e-15)
    assert(withDiff.where(abs(col("mine") - col("dot")) > tol).count() == 0)
    assert(withDiff.where(
      Rounding.dround(col("mine"), 6) =!= Rounding.dround(col("dot"), 6)).count() == 0)
  }
}
