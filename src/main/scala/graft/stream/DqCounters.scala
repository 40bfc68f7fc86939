package graft.stream

import graft.core.Validation
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-(loc,type) validation-error counters — the analog of the reference's
  * Prometheus `Counter(labels=[loc,type]).inc()` (dataops/app/api.py:15-19,
  * 62-69).
  *
  * Counting rides on `Dataset.observe`: the per-rule violation sums are
  * computed inside the job that processes the data (zero extra scans, zero
  * extra shuffles — an accumulator per metric), and a
  * QueryExecutionListener folds each completed query's observed metrics into
  * a process-wide registry that a metrics endpoint would scrape.
  */
object DqCounters {

  /** Attach violation observation to a DataFrame. Metric columns are named
    * `<loc>:<kind>`; counts materialise when any action runs on the result.
    */
  def observed(df: DataFrame, rules: Seq[Validation.Rule],
               name: String = "dq"): DataFrame = {
    val metrics = rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(s"${r.loc}:${r.kind}")) :+
      count(lit(1)).as("rows:total")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Process-wide counter registry + listener. Register once per session:
    * `spark.listenerManager.register(new DqCounters.Listener("dq"))`.
    */
  final class Listener(observationName: String = "dq")
      extends QueryExecutionListener {
    val counters = new ConcurrentHashMap[String, LongAdder]()

    private def record(qe: QueryExecution): Unit =
      qe.observedMetrics.get(observationName).foreach { row =>
        row.schema.fieldNames.zipWithIndex.foreach { case (metric, i) =>
          if (!row.isNullAt(i)) {
            counters.computeIfAbsent(metric, _ => new LongAdder).add(row.getLong(i))
          }
        }
      }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(qe)
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      record(qe)

    def snapshot: Map[String, Long] = {
      val it = counters.entrySet().iterator()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.sum() }
      b.result()
    }

    /** Prometheus exposition-format rendering of the counter registry —
      * what a `/metrics` endpoint would serve (the reference's counter is
      * `validation_checks_total{loc,type}`, dataops/app/constants.py:4-5).
      */
    def renderPrometheus(metric: String = "graft_validation_checks_total"): String = {
      val lines = snapshot.toSeq.sortBy(_._1).map { case (key, n) =>
        key.split(":", 2) match {
          case Array(loc, kind) => s"""$metric{loc="$loc",type="$kind"} $n"""
          case _ => s"""$metric{loc="$key",type=""} $n"""
        }
      }
      (s"# TYPE $metric counter" +: lines).mkString("", "\n", "\n")
    }
  }
}
