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

  /** `events.ts` is parquet TIMESTAMP(MICROS) without a UTC-adjustment
    * flag, which Spark reads as TIMESTAMP_NTZ (naive — exactly how
    * DuckDB reads it). Every session here runs with
    * `spark.sql.session.timeZone = UTC`, so casting the naive value to
    * TimestampType re-interprets it as UTC and:
    *   - `ts_us`: epoch microseconds — bit-identical to DuckDB's
    *     `epoch_us(ts)` over the same naive column
    *   - `ts`:    a proper TimestampType column for window/date
    *     functions (UTC session ⇒ same field values as the naive form)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("cast(ts as timestamp)"))
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("unix_micros(ts)"))
}
