package graft.stream

import graft.core.FieldBounds
import org.apache.spark.sql.SparkSession

/** Alert-rule codegen: profiled bounds → a Prometheus alerting-rules YAML
  * document (reference: dataops/app/profile.py:61-78, which writes
  * `promconfig/data_quality_rules.yml` — one `increase(<counter>_total{
  * loc="<field>"}[1m]) > 0` alert per bounded field). This is the artifact
  * that closes the reference's DQ loop: Profile.toBounds supplies the
  * bounds, Validation + DqCounters expose the counter this expression
  * scrapes, and the rules file wires the alerting side.
  */
object DqRules {

  /** Render the rules YAML for every field that carries a min or max bound
    * (unbounded fields get no alert, matching the reference's
    * `"minimum" in prop or "maximum" in prop` guard). Field order follows
    * the input sequence, so callers control it; the Map overload sorts by
    * name for determinism.
    */
  def alertRulesYaml(contractName: String, bounds: Seq[(String, FieldBounds)],
                     counter: String = "graft_validation_checks",
                     window: String = "1m"): String = {
    val rules = bounds.collect {
      case (field, fb) if fb.min.isDefined || fb.max.isDefined =>
        s"""  - alert: ${contractName}_$field
           |    expr: increase(${counter}_total{loc="$field"}[$window]) > 0
           |    for: 0m
           |    labels:
           |      severity: warning
           |    annotations:
           |      summary: DQ Violation $field
           |      description: Data quality rule violation for $field""".stripMargin
    }
    s"""groups:
       |- name: ${contractName.toLowerCase}
       |  rules:
       |${rules.mkString("\n")}
       |""".stripMargin
  }

  def alertRulesYaml(contractName: String, bounds: Map[String, FieldBounds]): String =
    alertRulesYaml(contractName, bounds.toSeq.sortBy(_._1))

  /** Write the artifact (Hadoop FileSystem path — local, HDFS, or object
    * store; driver-side metadata, a few KB).
    */
  def save(spark: SparkSession, path: String, contractName: String,
           bounds: Seq[(String, FieldBounds)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(alertRulesYaml(contractName, bounds).getBytes("UTF-8"))
    finally out.close()
  }
}
