package graft.etl

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic load generator — the Agrawal data-quality corpus
  * (reference: dataops/locustfile.py:9-17 streams `river synth.Agrawal(seed=
  * 1729)` records one HTTP POST at a time; the Spark-native equivalent is a
  * partition-parallel `spark.range` + pure column arithmetic: same field
  * domains, deterministic per (seed, id), no driver-side iterator — a
  * billion-row load corpus is one shuffle-free codegen'd stage).
  *
  * The per-field PRNG is engine-agnostic modular arithmetic (PolyHash's
  * affine family over 1e9+7, constants splitmix64-derived from the seed):
  * u_k(id) = ((a_k · ((id+1) mod p) + b_k) mod p) / p — every operation is
  * BIGINT-safe and double-exact, so any SQL engine regenerates the identical
  * corpus (the oracle replays it from the same literal constants).
  */
object Synthetic {

  private val P = PolyHash.P1

  /** k-th uniform [0,1) draw for the row id. */
  private def u(id: Column, k: Int, seed: Long): (Column, Long, Long) = {
    val a = Math.floorMod(PolyHash.splitmix(seed * 1000003L + 2L * k), P - 1) + 1
    val b = Math.floorMod(PolyHash.splitmix(seed * 1000003L + 2L * k + 1), P)
    (((lit(a) * ((id + 1) % P) + b) % P).cast("double") / P, a, b)
  }

  /** The affine constants for draws 0..8 of `seed` — shared with the oracle
    * SQL so both engines compute the identical corpus.
    */
  def drawConstants(seed: Long): Seq[(Long, Long)] =
    (0 until 9).map { k =>
      val a = Math.floorMod(PolyHash.splitmix(seed * 1000003L + 2L * k), P - 1) + 1
      val b = Math.floorMod(PolyHash.splitmix(seed * 1000003L + 2L * k + 1), P)
      (a, b)
    }

  /** `n` Agrawal records (classic field domains, Agrawal et al. — salary
    * uniform [20k,150k], commission 0 above 75k salary else [10k,75k], age
    * 20..80, elevel 0..4, car 1..20, zipcode 0..8, zipcode-scaled hvalue,
    * hyears 1..30, loan [0,500k]) conforming to
    * [[graft.core.Contracts.agrawal]], plus the row `id`.
    */
  def agrawal(spark: SparkSession, n: Long, seed: Long = 1729L,
              numPartitions: Int = 0): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
      else spark.range(n)
    val id = col("id")
    def d(k: Int): Column = u(id, k, seed)._1
    val salary = lit(20000.0) + lit(130000.0) * d(0)
    val zipcode = floor(d(5) * 9).cast("int")
    base.select(
      id,
      salary.as("salary"),
      when(salary >= 75000.0, lit(0.0))
        .otherwise(lit(10000.0) + lit(65000.0) * d(1)).as("commission"),
      (lit(20) + floor(d(2) * 61)).cast("int").as("age"),
      floor(d(3) * 5).cast("int").as("elevel"),
      (lit(1) + floor(d(4) * 20)).cast("int").as("car"),
      zipcode.as("zipcode"),
      floor((zipcode + 1) * lit(100000.0) * (lit(0.5) + d(6))).cast("int").as("hvalue"),
      (lit(1) + floor(d(7) * 30)).cast("int").as("hyears"),
      (d(8) * lit(500000.0)).as("loan"))
  }
}
