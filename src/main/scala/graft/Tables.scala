package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All operators in this library are pure `DataFrame => DataFrame`
  * transformations; reading is isolated here so the same pipelines run
  * against any scale factor (or, on a real cluster, any warehouse path).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) refuses to read natively. We read it as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and derive:
    *   - `ts_us`: epoch microseconds (ns div 1000 — same truncation DuckDB
    *     applies when it narrows ns → its µs timestamps)
    *   - `ts`:    a proper TimestampType column for window/date functions
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, sfDir, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
  }
}
