package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one catalog query N times in a warm session and print
  * its physical plan. `runMain graft.ProfileQuery <name> [n] [sfDir]`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStarts.get(je.jobId)).getOrElse(0L)
        println(f"PROFILE   job ${je.jobId}%3d: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })
    name.split(",").foreach { nm =>
      val fn = SparkEntry.queries(nm)
      (1 to n).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"PROFILE $nm run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    if (sys.env.contains("PROFILE_EXPLAIN"))
      SparkEntry.queries(name.split(",").last)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
