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

  /** Driver-side restatement of the log-linear bucket index, written
    * independently of the expr strings.
    */
  private def logB(v: Long, s: Int): Long = {
    def pos(x: Long): Long = {
      val dec = x.toString.length - 1
      val p10 = math.pow(10, dec).toLong
      dec.toLong * 9 * s + (x * s) / p10 - s
    }
    if (v == 0) -1L else if (v > 0) pos(v) else -2L - pos(-v)
  }

  test("log buckets: expr equals the closed form; monotone over the signed domain") {
    val s8 = 8
    val vals = Seq(-123456789L, -100L, -10L, -9L, -1L, 0L, 1L, 7L, 9L, 10L,
      11L, 79L, 80L, 81L, 99L, 100L, 125L, 999L, 1000L, 123456789L,
      999999999999L)
    val got = vals.toDF("cv")
      .select(col("cv"), BucketHistogram.logBucketExpr("cv", s8).as("b"))
      .as[(Long, Long)].collect().toMap
    for (v <- vals) assert(got(v) === logB(v, s8), s"bucket($v)")
    // monotone: sorted values get nondecreasing buckets
    val sorted = vals.sorted.map(got)
    assert(sorted === sorted.sorted, "bucket index must be monotone in value")
  }

  test("log buckets: every positive bucket keeps the 1/s relative-width contract") {
    val s8 = 8
    // every bucket that any value up to 10^6 can land in
    val bs = (1L to 1000000L by 997L).map(logB(_, s8)).distinct
    val edges = bs.toDF("bucket")
      .select(col("bucket"),
        BucketHistogram.logBucketEdgesExpr("bucket", s8)._1.as("lo"),
        BucketHistogram.logBucketEdgesExpr("bucket", s8)._2.as("hi"))
      .as[(Long, Long, Long)].collect()
    for ((b, lo, hi) <- edges) {
      assert((hi - lo) * s8 <= lo + s8, s"bucket $b: [$lo, $hi) too wide")
      assert(lo < hi, s"bucket $b: empty range")
    }
    // edges really bracket: each sampled value sits inside its bucket's range
    val probe = Seq(1L, 9L, 10L, 99L, 100L, 12345L, 999999L)
    for (v <- probe) {
      val b = logB(v, s8)
      val (lo, hi) = edges.find(_._1 == b).map(e => (e._2, e._3))
        .getOrElse {
          val e = Seq(b).toDF("bucket").select(
            BucketHistogram.logBucketEdgesExpr("bucket", s8)._1,
            BucketHistogram.logBucketEdgesExpr("bucket", s8)._2)
            .as[(Long, Long)].head()
          e
        }
      assert(v >= lo && v < hi, s"$v outside its bucket $b range [$lo, $hi)")
    }
  }

  test("log sketch: merge equals monolith and the quantile guarantee holds") {
    val s8 = 8
    // heavy-tailed pool: cubes spread over ~6 decades
    val heavy = rows.map { case (g, v) => (g, v * v % 900000007L + 1L) }
    val hdf = heavy.toDF("g", "cv")
    val whole = BucketHistogram.logSketch(hdf, col("cv"), Seq("g"), s8)
    val parts = (0 to 2).map(i => BucketHistogram.logSketch(
      hdf.where(col("cv") % 3 === i), col("cv"), Seq("g"), s8))
    val merged = BucketHistogram.merge(parts: _*)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    val q = BucketHistogram.quantiles(whole, Seq("g"), Seq((1, 2), (19, 20)))
      .select("g", "qrank", "bucket").as[(String, Long, Long)].collect()
    for ((g, qrank, bucket) <- q) {
      val vals = heavy.filter(_._1 == g).map(_._2).sorted
      val trueQ = vals(qrank.toInt - 1)
      val (lo, hi) = Seq(bucket).toDF("bucket").select(
        BucketHistogram.logBucketEdgesExpr("bucket", s8)._1,
        BucketHistogram.logBucketEdgesExpr("bucket", s8)._2)
        .as[(Long, Long)].head()
      assert(trueQ >= lo && trueQ < hi,
        s"g=$g: log quantile $trueQ outside [$lo, $hi)")
    }
  }
}
