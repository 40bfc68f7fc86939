package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering primitives for tabular training data — the
  * encode/scale steps between the warehouse tables and a trainer.
  */
object Features {

  /** Smoothed target encoding: each category's mean target, shrunk toward
    * the global mean by a pseudo-count `m` (the standard leakage-resistant
    * categorical encoding): `enc = (Σ_cat target + m·μ) / (n_cat + m)`.
    *
    * Scale shape: ONE map-side-combined keyed aggregate over (category) —
    * the encoding table is category-sized — plus a one-row global
    * aggregate re-entered as a broadcast. Determinism: targets are summed
    * as exact integer cents ([[graft.functions.Rounding.cents]]) so the
    * sums are associative and engine-identical; the final encode divides
    * exact longs in a fixed operand shape and rounds to `scale` dp.
    */
  def targetEncode(df: DataFrame, categoryCol: String, target: Column,
                   m: Int = 10, scale: Int = 6): DataFrame = {
    require(m >= 0, s"smoothing pseudo-count must be >= 0: $m")
    val cents = graft.functions.Rounding.cents(target)
    val perCat = df.select(col(categoryCol), cents.as("_c"))
      .groupBy(categoryCol)
      .agg(count(lit(1)).as("n"), sum(col("_c")).as("_sc"))
    val tot = perCat.agg(sum(col("_sc")).as("_tc"), sum(col("n")).as("_tn"))
    perCat.crossJoin(broadcast(tot))
      .select(col(categoryCol), col("n"),
        graft.functions.Rounding.dround(
          (col("_sc").cast("double") / 100.0 +
            lit(m) * (col("_tc").cast("double") / 100.0 / col("_tn"))) /
            (col("n") + lit(m)), scale).as("enc"))
  }
}
