package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named catalog queries to
  * files — `runMain graft.DumpPlans <outDir> <q1,q2,...> [sfDir]`.
  * Used to commit the before/after plan evidence the optimization
  * rounds require (plans/r14/<query>_{before,after}.txt).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val suffix = if (args.length > 3) args(3) else ""
    names.foreach { nm =>
      val fn = SparkEntry.queries.getOrElse(nm,
        throw new IllegalArgumentException(s"unknown query $nm"))
      // queryExecution.explainString, not explain() — capture to file.
      // NOTE: building the frame runs the query's EAGER prelude (state
      // builds, checkpoints); the plan written is the returned frame's.
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$nm$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plans] wrote $outDir/$nm$suffix.txt")
    }
    spark.stop()
  }
}
