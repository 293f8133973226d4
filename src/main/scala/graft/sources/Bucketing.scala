package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage — the storage-side half of shuffle
  * elimination for the joins a warehouse runs every day.
  *
  * A fact table hash-bucketed by its join key is ALREADY distributed
  * the way the join wants: when both sides are bucketed on the key with
  * compatible bucket counts, Spark's scan reports the hash distribution
  * and the sort-merge join runs with ZERO exchanges — at 100 TB that is
  * the difference between re-shuffling the whole fact table per query
  * and never shuffling it at all (pay the shuffle once at write time,
  * amortized over every subsequent join). `BucketingSpec` locks the
  * no-exchange plan in as a test.
  *
  * This is the DataFrame-native equivalent of "pre-partition your data
  * by join key" — the reference has no storage layer at all (it re-reads
  * CSV and reshuffles per run; SURVEY.md §1).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table
    * registered in the session catalog. `path` keeps the data external
    * (explicit location) rather than inside the default warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join two catalog tables on `key` — shuffle-free when both are
    * bucketed on `key` with compatible bucket counts.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
