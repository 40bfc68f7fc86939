package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round()` on doubles rounds the value's shortest *decimal*
  * representation (BigDecimal HALF_UP); DuckDB (and C/C++ engines generally)
  * round the *binary* value via `std::round(x·10^s)/10^s`. The two disagree
  * whenever x·10^s lands exactly on .5 while the decimal string does not
  * (e.g. x = 0.42574999999999996: x·10⁴ == 4257.5 exactly → DuckDB 0.4258,
  * Spark 0.4257). `dround` replicates the binary formula, so identical
  * input doubles round identically in both engines.
  */
object Rounding {
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    when(c >= 0, floor(c * p + lit(0.5)) / p)
      .otherwise(-(floor(-c * p + lit(0.5)) / p))
  }

  /** Dollar doubles → exact integer cents with the same binary-value
    * rounding; integer sums are then associative and engine-identical.
    */
  def cents(c: Column): Column =
    when(c >= 0, floor(c * 100 + lit(0.5)))
      .otherwise(-floor(-c * 100 + lit(0.5)))
      .cast("long")
}
