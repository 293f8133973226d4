package graft

import graft.operators.RobustStats
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def counters(rows: (String, Double, Long)*) =
    rows.toDF("g", "v", "cnt")

  private def values(rows: (String, Double)*) =
    rows.toDF("g", "v").groupBy("g", "v").agg(count(lit(1)).as("cnt"))

  test("weighted median matches percentile_cont semantics, odd and even n") {
    val got = RobustStats.weightedMedian(
      values(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 100), // odd
        ("b", 5), ("b", 5), ("b", 5), ("b", 7), // even, tie middle
        ("c", 9), // singleton
        ("d", 2), ("d", 4)), // even, true interpolation
      Seq("g"), "v", "cnt")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("a", 5L, 3.0), ("b", 4L, 5.0), ("c", 1L, 9.0),
      ("d", 2L, 3.0)))
  }

  test("weights expand exactly: a counter row with cnt=3 is three values") {
    val got = RobustStats.weightedMedian(
      counters(("w", 1.0, 3L), ("w", 10.0, 1L)), Seq("g"), "v", "cnt")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((4L, 1.0))) // [1,1,1,10] -> median 1
  }

  test("weighted median equals Spark's exact percentile(0.5) on random data") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      g <- Seq("p", "q", "r"); _ <- 1 to (rnd.nextInt(40) + 3)
    } yield (g, rnd.nextInt(200).toDouble)
    val df = values(rows: _*)
    val ours = RobustStats.weightedMedian(df, Seq("g"), "v", "cnt")
      .select("g", "med").orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ref = df.select(col("g"), explode(array_repeat(col("v"), col("cnt").cast("int"))).as("v"))
      .groupBy("g").agg(expr("percentile(v, 0.5)").as("med")).orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(ours.toSeq === ref.toSeq)
  }

  test("MAD outlier report: hand-computed fences, including MAD = 0 degeneracy") {
    val got = RobustStats.madOutliers(
      values(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 100),
        ("b", 5), ("b", 5), ("b", 5), ("b", 7),
        ("c", 9)),
      Seq("g"), "v", "cnt")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    // a: med 3, devs [2,1,0,1,97] -> mad 1, fence 4.4478 -> only 100 is out
    // b: med 5, devs [0,0,0,2] -> mad 0, fence 0 -> the 7 is out (dev 2 > 0)
    // c: singleton -> med 9, mad 0, nothing out (dev 0 is not > 0)
    assert(got.toSeq === Seq(
      ("a", 5L, 3.0, 1.0, 1L, 0.2),
      ("b", 4L, 5.0, 0.0, 1L, 0.25),
      ("c", 1L, 9.0, 0.0, 0L, 0.0)))
  }
}
