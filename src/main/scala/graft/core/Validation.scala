package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contract enforcement as Column predicates — the Spark-native analog of
  * Pydantic validation (reference: logging-service/app/contracts.py:34-58
  * required/typed fields; dataops/app/profile.py:31-33 generated bounds;
  * join-service/app/main.py:134-136 probability range; dataops/app/api.py:
  * 62-69 per-(loc,type) violation counters).
  *
  * Everything is a codegen-friendly built-in expression evaluated row-wise in
  * one pass — no UDFs, no driver-side loops — so a validation sweep over
  * 100 TB is a single scan.
  */
object Validation {

  /** One validation rule: `violated` is true on rows that FAIL it.
    * `loc`/`kind` match the reference's Prometheus counter labels
    * (dataops/app/constants.py:4-5: loc = field, type = error kind).
    */
  final case class Rule(loc: String, kind: String, violated: Column)

  /** Required-field rules: a missing or type-mismatched field in a parsed
    * JSON document surfaces as NULL after `from_json` (V1).
    */
  def requiredRules(contract: Contract): Seq[Rule] =
    contract.required.map(f => Rule(f, "missing", col(f).isNull))

  /** Numeric bounds rules (V2); NULLs are handled by requiredRules, so a NULL
    * is not a bounds violation.
    */
  def boundsRules(bounds: Map[String, FieldBounds]): Seq[Rule] =
    bounds.toSeq.sortBy(_._1).map { case (f, b) =>
      val lo = b.min.map(col(f) < lit(_)).getOrElse(lit(false))
      val hi = b.max.map(col(f) > lit(_)).getOrElse(lit(false))
      Rule(f, "range", col(f).isNotNull && (lo || hi))
    }

  def rules(contract: Contract): Seq[Rule] =
    requiredRules(contract) ++ boundsRules(contract.bounds)

  /** Array column of `(loc, type)` violation structs for each row (empty
    * array = valid row). Single projection; feeds both split() and
    * violations().
    */
  private def violationArray(rs: Seq[Rule]): Column =
    filter(
      array(rs.map(r =>
        when(r.violated, struct(lit(r.loc).as("loc"), lit(r.kind).as("type")))): _*),
      _.isNotNull)

  /** Split into (valid, invalid) — invalid rows carry a `_violations`
    * array<struct<loc,type>> column. The Pydantic-422-vs-persist split
    * (reference: api.py:12-16 + tests/test_searches.py:71-79).
    */
  def split(df: DataFrame, rs: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("_violations", violationArray(rs))
    (tagged.where(size(col("_violations")) === 0).drop("_violations"),
     tagged.where(size(col("_violations")) > 0))
  }

  /** Exploded violations stream: one row per (row, failed rule) with columns
    * `loc`, `type` — the analog of the reference's validation-error counter
    * increments (dataops/app/api.py:62-69). Aggregate it with
    * `groupBy("loc","type").count()` for counter totals, or window it by an
    * event-time column for the P4 alert feed.
    */
  def violations(df: DataFrame, rs: Seq[Rule]): DataFrame =
    df.select(explode(violationArray(rs)).as("v"))
      .select(col("v.loc").as("loc"), col("v.type").as("type"))

  /** Per-(loc,type) violation counts — the Prometheus counter snapshot.
    * One wide aggregate (a conditional sum per rule), not explode+groupBy:
    * a single map-side-combined pass with #rules output values, no shuffle
    * of per-violation rows. Zero-count rules are omitted, matching the
    * counter semantics (a counter that never fired doesn't exist).
    */
  def violationCounts(df: DataFrame, rs: Seq[Rule]): DataFrame = {
    val aggs = rs.zipWithIndex.map { case (r, i) =>
      sum(when(r.violated, 1L).otherwise(0L)).as(s"_v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rs.zipWithIndex.map { case (r, i) =>
      struct(lit(r.loc).as("loc"), lit(r.kind).as("type"), col(s"_v$i").as("n"))
    }
    wide.select(explode(array(rows: _*)).as("v")).select("v.*")
      .where(col("n") > 0)
  }

  /** [[violationCounts]] plus the VALID-row total (`('_valid', 'ok', n)`) in
    * the SAME wide aggregate — the ingest-report query (how many rows passed,
    * how many failed per rule) as ONE scan. The naive form — `split()._1
    * .count() UNION violationCounts` — scans the source twice, and when the
    * rules read parsed-JSON fields the parse runs twice too; at 100 TB the
    * second scan is the whole cost. Here the valid counter is just one more
    * conditional sum (no rule fired) riding the existing map-side-combined
    * pass.
    */
  def countsWithValid(df: DataFrame, rs: Seq[Rule]): DataFrame = {
    // A NULL rule predicate means "not violated" (violationCounts counts
    // only TRUE), so valid = no rule strictly TRUE.
    val anyViolated = coalesce(rs.map(_.violated).reduce(_ || _), lit(false))
    // sum() over ZERO rows is NULL; coalesce to 0 so an empty input reports
    // 0 valid rows (the pre-fused split()._1.count() behavior), not NULL
    val aggs =
      coalesce(sum(when(!anyViolated, 1L).otherwise(0L)), lit(0L)).as("_ok") +:
      rs.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(r.violated, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      struct(lit("_valid").as("loc"), lit("ok").as("type"), col("_ok").as("n")) +:
      rs.zipWithIndex.map { case (r, i) =>
        struct(lit(r.loc).as("loc"), lit(r.kind).as("type"), col(s"_v$i").as("n"))
      }
    wide.select(explode(array(rows: _*)).as("v")).select("v.*")
      .where(col("type") === "ok" || col("n") > 0)
  }

  /** Default-value injection (V3, reference contracts.py:9-12):
    * `coalesce(col, default)` per configured field.
    */
  def withDefaults(df: DataFrame, defaults: Map[String, Column]): DataFrame =
    defaults.foldLeft(df) { case (d, (f, dflt)) =>
      d.withColumn(f, coalesce(col(f), dflt))
    }
}
