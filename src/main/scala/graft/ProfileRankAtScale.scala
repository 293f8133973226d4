package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: the q216 crossover measurement. Round 9 rewrote q216's
  * vocabulary rank from a global `ROW_NUMBER` window over the FULL
  * vocabulary counter to `orderBy().limit(10000)`
  * (TakeOrderedAndProject) + ExactRank inside the bounded table — a
  * deliberate scale-safety trade that costs ~1.6× at sf0.1 (the
  * range-partition pass outweighs a toy window) and is supposed to WIN
  * once the vocabulary is big enough that a single-task global sort is
  * the bottleneck. The catalog bench never demonstrates the crossover
  * (sf0.1's vocabulary is ~50k types); this main does, on a synthetic
  * Zipf-shaped vocabulary counter of `n` types (default 2×10⁷ —
  * the sf1-ish regime; web corpora reach 10⁸–10⁹, where the windowed
  * plan's single ordered task is simply not runnable).
  *
  * Both plans compute the identical q216 tail (top-10000 ranks →
  * coverage at k ∈ {1,…,10000}) from the same materialized counter, so
  * the measured delta is exactly the rank strategy. Usage:
  * `runMain graft.ProfileRankAtScale [nTypes] [reps]`; prints one
  * PROFILE line per rep and a JSON summary (median of reps).
  */
object ProfileRankAtScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-shaped counter: cnt(i) = n/(i+1), md5-keyed tokens so the
    // (cnt desc, token) order is not the generation order. Materialized
    // once — generation cost is outside both timers.
    val vc = spark.range(n).select(
        md5(concat(lit("t"), col("id"))).as("token"),
        (lit(n) / (col("id") + 1)).cast("long").as("cnt"))
      .repartition(cpus.toInt)
      .localCheckpoint()
    val ks = spark.range(1)
      .select(explode(expr("array(1L, 10L, 100L, 1000L, 10000L)")).as("k"))

    def coverageTail(ranked: DataFrame): DataFrame =
      broadcast(ks).join(ranked, col("rk") <= col("k"))
        .groupBy("k").agg(sum("cnt").cast("long").as("covered"))
        .orderBy("k")

    def bounded(): DataFrame = {
      val top = vc.orderBy(col("cnt").desc, col("token")).limit(10000)
      val (ranked, _) = graft.operators.ExactRank.withRowNumber(
        top, Seq(col("cnt").desc, col("token")), "rk")
      coverageTail(ranked)
    }

    def windowed(): DataFrame = {
      val w = Window.orderBy(col("cnt").desc, col("token"))
      coverageTail(vc.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 10000))
    }

    def time(tag: String)(mk: () => DataFrame): Double = {
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $tag rep $i: $s%.2f s")
        s
      }.sorted
      times(times.length / 2)
    }

    // equal-results sanity before timing (also warms both paths)
    val a = bounded().collect().map(_.toSeq).toSeq
    val b = windowed().collect().map(_.toSeq).toSeq
    require(a == b, s"plans disagree: $a vs $b")

    val tb = time("bounded")(bounded _)
    val tw = time("windowed")(windowed _)
    println(s"""{"n_types":$n,"bounded_sec":$tb,"windowed_sec":$tw,""" +
      f""""ratio_windowed_over_bounded":${tw / tb}%.3f}""")
    spark.stop()
  }
}
