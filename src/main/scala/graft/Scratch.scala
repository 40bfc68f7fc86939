package graft

import org.apache.spark.sql.SparkSession

/** Perf scratch harness — times individual SparkEntry queries with
  * per-job timelines (job count, start offset, duration). Not part of the
  * library surface; edit the query list below while iterating. Run with
  * `runMain graft.Scratch` (honors SPARK_GRAFT_SF_DIR).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.cacheTables", "true")
    graft.core.Tables.all.foreach(n => graft.core.Tables(spark, sfDir, n).count())

    var jobs = 0
    val jobLog = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]
    val jobStart = new scala.collection.mutable.HashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart.synchronized {
          jobStart(j.jobId) = (System.nanoTime(),
            (Option(j.properties.getProperty("callSite.short")) orElse
              Option(j.properties.getProperty("spark.job.description")))
              .getOrElse("?").take(80))
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.synchronized {
          jobStart.remove(j.jobId).foreach { case (t0, d) =>
            jobLog += ((j.jobId, t0, System.nanoTime(), d))
          }
        }
    })

    def time(name: String)(f: => Unit): Unit = {
      // warmup, then best-of-3 (box stalls attach to arbitrary runs; the
      // min is the steady-state read, same protocol as Bench). The job
      // timeline shown is the best run's.
      f
      var best = Double.MaxValue
      var bestLog: Seq[(Int, Long, Long, String)] = Nil
      var bestT0 = 0L
      var bestJobs = 0
      for (_ <- 1 to 3) {
        Thread.sleep(200)
        val j0 = jobs
        jobLog.clear()
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) {
          best = dt; bestLog = jobLog.toSeq; bestT0 = t0; bestJobs = jobs - j0
        }
      }
      println(f"[scratch] $name%-30s ${best}%8.3f s  jobs=$bestJobs")
      bestLog.sortBy(_._2).foreach { case (id, s, e, d) =>
        println(f"[scratch]   job $id%3d  +${(s - bestT0) / 1e6}%7.1f ms  ${(e - s) / 1e6}%7.1f ms  $d")
      }
    }

    for (q <- Seq("lm_score", "lm_score_tri")) {
      val fn = SparkEntry.queries(q)
      time(q) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
