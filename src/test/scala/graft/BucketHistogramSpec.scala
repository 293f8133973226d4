package graft

import graft.functions.BucketHistogram
import org.apache.spark.sql.functions._

/** BucketHistogram semantics: counter determinism, merge ≡ monolith,
  * the in-bucket quantile guarantee against a driver-side sort, and
  * the width-1 degenerate case where the sketch IS the exact discrete
  * quantile. (Value-level engine parity is q152's DuckDB gate.)
  */
class BucketHistogramSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic value pool: two groups with different shapes
  private def h(parts: Any*): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString(":").getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(md).getLong(0) & 0x7fffffffL
  }
  private val rows: Seq[(String, Long)] =
    (1 to 500).map(i => ("a", h("a", i) % 100000L)) ++
      (1 to 300).map(i => ("b", 50000L + h("b", i) % 1000L))
  private def df = rows.toDF("g", "cv")

  test("merging arbitrary shards equals the monolithic sketch") {
    val whole = BucketHistogram.sketch(df, col("cv"), Seq("g"), 7919L)
    val parts = (0 to 2).map(i => BucketHistogram.sketch(
      df.where(col("cv") % 3 === i), col("cv"), Seq("g"), 7919L))
    val merged = BucketHistogram.merge(parts: _*)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("the true quantile lies inside the reported bucket, any width") {
    for (width <- Seq(1L, 13L, 1000L, 50000L); (num, den) <- Seq((1, 2), (19, 20), (1, 1))) {
      val sk = BucketHistogram.sketch(df, col("cv"), Seq("g"), width)
      val got = BucketHistogram.quantiles(sk, Seq("g"), Seq((num, den)))
        .select("g", "n_total", "qrank", "bucket")
        .as[(String, Long, Long, Long)].collect()
      assert(got.length === 2)
      for ((g, n, qrank, bucket) <- got) {
        val vals = rows.filter(_._1 == g).map(_._2).sorted
        assert(n === vals.length)
        assert(qrank === (num.toLong * n + den - 1) / den)
        val trueQ = vals(qrank.toInt - 1) // rank is 1-based
        assert(trueQ >= bucket * width && trueQ < (bucket + 1) * width,
          s"g=$g width=$width p=$num/$den: quantile $trueQ outside " +
            s"[${bucket * width}, ${(bucket + 1) * width})")
      }
    }
  }

  test("negative values: floor-division buckets and the quantile guarantee") {
    // refund/adjustment cents — values straddle zero. Truncation toward
    // zero would hand bucket 0 the double-width span (−width, width) and
    // shift every negative bucket's range; floor division keeps all of
    // them at [bucket·width, (bucket+1)·width).
    val neg = rows.map { case (g, v) => (g, v - 50000L) }
    val ndf = neg.toDF("g", "cv")
    for (width <- Seq(13L, 7919L)) {
      val sk = BucketHistogram.sketch(ndf, col("cv"), Seq("g"), width)
      val expect = neg.groupBy { case (g, v) => (g, Math.floorDiv(v, width)) }
        .map { case ((g, b), xs) => (g, b, xs.size.toLong) }.toSet
      val got = sk.as[(String, Long, Long)].collect().toSet
      assert(got === expect, s"width=$width: buckets must be floor(cv/width)")
      for ((num, den) <- Seq((1, 2), (19, 20))) {
        val q = BucketHistogram.quantiles(sk, Seq("g"), Seq((num, den)))
          .select("g", "n_total", "qrank", "bucket")
          .as[(String, Long, Long, Long)].collect()
        for ((g, n, qrank, bucket) <- q) {
          val vals = neg.filter(_._1 == g).map(_._2).sorted
          assert(n === vals.length)
          val trueQ = vals(qrank.toInt - 1)
          assert(trueQ >= bucket * width && trueQ < (bucket + 1) * width,
            s"g=$g width=$width p=$num/$den: quantile $trueQ outside " +
              s"[${bucket * width}, ${(bucket + 1) * width})")
        }
      }
    }
  }

  test("width 1 degenerates to the exact discrete quantile") {
    val sk = BucketHistogram.sketch(df, col("cv"), Seq("g"), 1L)
    val got = BucketHistogram.quantiles(sk, Seq("g"), Seq((1, 2)))
      .select("g", "bucket").as[(String, Long)].collect().toMap
    for (g <- Seq("a", "b")) {
      val vals = rows.filter(_._1 == g).map(_._2).sorted
      assert(got(g) === vals((vals.length + 1) / 2 - 1))
    }
  }
}
