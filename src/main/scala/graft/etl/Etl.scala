package graft.etl

import graft.core.{Contract, Validation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bronze→silver ETL pipeline (reference: logging-service/app/etl.py:
  * 17-73): raw `(ts LONG, data STRING)` JSON log rows → contract-typed
  * struct → flattened, ordered, columnar silver table → Parquet.
  *
  * Catalyst collapses parse + flatten into a single Project over the scan
  * (JSON column pruning prunes the parse to the selected paths), so the whole
  * pipeline is one shuffle-free stage — the shape that scales linearly with
  * input bytes on a real cluster.
  */
object Etl {

  /** E1: parse the JSON payload with the contract schema. Malformed or
    * type-mismatched documents yield NULL fields (PERMISSIVE mode), which the
    * validation split then routes to the invalid side — the Spark analog of
    * Pydantic's 422 (reference: etl.py:29-38 + api.py:12-16).
    */
  def parse(bronze: DataFrame, contract: Contract): DataFrame =
    bronze.select(
      col("ts").as("__ts"),
      col("data"), // raw payload rides along for the invalid-side quarantine
      from_json(col("data"), contract.schema).as("d"))

  /** E2–E4: flatten the parsed struct to the contract's ordered column list
    * (or an explicit evolved list from Migrate).
    */
  def flatten(parsed: DataFrame, contract: Contract,
              paths: Option[Seq[String]] = None): DataFrame =
    Flatten.select(parsed, "d", contract.schema,
      paths.getOrElse(contract.columnPaths))

  /** Full pipeline: parse → default-inject → validity split → flatten valid
    * rows. Returns (silver, invalid). Invalid rows keep raw `data` plus the
    * `_violations` array for quarantine/DQ counting.
    */
  def run(bronze: DataFrame, contract: Contract,
          paths: Option[Seq[String]] = None): (DataFrame, DataFrame) = {
    val parsed = parse(bronze, contract)
    // Validation sees top-level parsed fields by name.
    val top = parsed.select(col("__ts"), col("data"), col("d"), col("d.*"))
    val (valid, invalid) = Validation.split(top, Validation.rules(contract))
    val defaulted = contract.defaults.foldLeft(valid) { case (df, (f, dflt)) =>
      df.withColumn("d", col("d").withField(f, coalesce(col(s"d.$f"), dflt)))
    }
    // Quarantine keeps the ORIGINAL payload — re-serializing the parse would
    // lose it entirely for malformed documents (from_json → null).
    (flatten(defaulted, contract, paths),
     invalid.select(col("__ts"), col("_violations"), col("data")))
  }

  /** S2: silver sink. One call site so partitioning/compaction policy is
    * centralised; partition by a date column at scale.
    */
  def sink(silver: DataFrame, out: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = silver.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(out)
  }

  /** Bucketed silver sink: co-locates the table on `bucketCol` so joins and
    * aggregations on that key skip the shuffle entirely (both sides bucketed
    * with the same count → SortMergeJoin with zero Exchange). At 100 TB this
    * is the difference between a join that moves the fact table and one that
    * moves nothing.
    */
  def sinkBucketed(silver: DataFrame, tableName: String, bucketCol: String,
                   numBuckets: Int): Unit =
    silver.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
