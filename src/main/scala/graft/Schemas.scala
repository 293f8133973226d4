package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: print schema + head of every testdata table. */
object Schemas {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { t =>
      println(s"== $t")
      try {
        val df = Tables.read(spark, sfDir, t)
        df.printSchema()
        df.show(2, 60)
      } catch { case e: Throwable => println(s"READ FAILED: $e") }
    }
    spark.stop()
  }
}
