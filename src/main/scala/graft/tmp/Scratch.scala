package graft.tmp
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.cacheTables", "true")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    graft.core.Tables.all.foreach(n => graft.core.Tables(spark, d, n).count())
    val q = graft.SparkEntry.queries
    for (aqe <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      time(s"profile_summarize aqe=$aqe") {
        q("profile_summarize")(spark, d).write.format("noop").mode("overwrite").save()
      }
      time(s"group_quantiles aqe=$aqe") {
        q("group_quantiles")(spark, d).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
