package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width bucket histogram over EXACT long values (scaled-integer
  * cents) — the quantile member of the portable-sketch family
  * ([[CountMin]] frequencies, [[HyperLogLog]] distinct counts, Bloom
  * membership): per `keys` group, one counter per non-empty
  * `value div width` bucket. Quantiles come out with error bounded by
  * `width` BY CONSTRUCTION — the true p-quantile provably lies inside
  * the reported bucket (an integer count argument the oracle can
  * verify exactly; q152) — which is the honest contract an equi-width
  * sketch can make, stated in the unit the caller picked.
  *
  * Scale shape: building is ONE hash aggregation whose group count is
  * bounded by value-range/width, not rows — partial counts collapse
  * before the exchange, the shuffle moves counter rows. Two sketches
  * over the same width merge by counter ADDITION (shard-parallel
  * build-where-the-data-lives; q152 proves merge ≡ monolith under the
  * gate). Everything is long arithmetic: counters, ranks
  * (`ceil(p·n)` as `(p_num·n + p_den − 1) div p_den`), bucket edges —
  * so every row hash-matches any engine with no rounding anywhere.
  *
  * The quantile pass runs a cumulative-sum window over the COUNTER
  * table (rows ≤ range/width per key — bounded by the dial, not the
  * corpus; the q43/q141 bounded-window adjudication).
  */
object BucketHistogram {

  /** One counter row per non-empty (keys..., bucket): bucket =
    * floor(value / width), n = row count. `value` must be an exact
    * integral column (cents); width > 0. FLOOR division — not `div`'s
    * truncation toward zero — so every bucket, negative ones included
    * (refund/adjustment cents), covers the same half-open range
    * [bucket·width, (bucket+1)·width): `cv - pmod(cv, width)` is the
    * largest multiple of width ≤ cv, and dividing an exact multiple
    * cannot truncate.
    */
  def sketch(df: DataFrame, value: Column, keys: Seq[String], width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.select(keys.map(col) :+ value.cast("long").as("cv"): _*)
      .withColumn("bucket", expr(s"(cv - pmod(cv, $width)) div $width"))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** LOG-SPACED mode for heavy-tailed values (revenue, token counts):
    * fixed width wastes buckets at the head and loses resolution at
    * the tail; log-linear buckets give RELATIVE-error quantiles with
    * the same counter-table state. The naive `floor(ln v / ln b)` is
    * rejected outright: the bucket function must be BIT-EXACT across
    * engines, and a 1-ulp libm `ln` divergence at a bucket boundary
    * silently splits them. Instead, the HdrHistogram shape in exact
    * integer arithmetic: decade = digit count − 1 (string length —
    * both engines agree exactly), then `subPerDecade` linear
    * sub-buckets within the decade via `(v·s) div 10^decade`
    * (10^decade built as '1' + repeated '0's — never a float pow).
    * Bucket index is monotone in v over the FULL long domain:
    * negatives mirror below (−2 − bucket(−v)), zero sits at −1, so
    * [[quantiles]] works unchanged. Relative width of every positive
    * bucket is ≤ 1/s by construction: (hi − lo)·s ≤ lo + s (q227
    * gates exactly that, plus the true-quantile-in-bucket count
    * argument). Values must satisfy |v| < 2^63 / s (v·s stays a
    * long) — cents-scaled money and token counts sit far below it.
    */
  def logSketch(df: DataFrame, value: Column, keys: Seq[String],
                subPerDecade: Int): DataFrame = {
    require(subPerDecade >= 1 && subPerDecade <= 1000,
      s"subPerDecade must be in [1, 1000], got $subPerDecade")
    df.select(keys.map(col) :+ value.cast("long").as("cv"): _*)
      .withColumn("bucket", logBucketExpr("cv", subPerDecade))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Spark-SQL log-linear bucket index of the exact-long column named
    * `v`. Every operation is integer/string — `div`, `%`, digit count
    * — so the SQL mirror ([[logBucketSql]]) is bit-identical.
    */
  def logBucketExpr(v: String, s: Int): Column = {
    def pb(x: String): String = {
      val dec = s"(length(cast($x as string)) - 1)"
      val p10 = s"cast(concat('1', repeat('0', $dec)) as bigint)"
      s"(cast($dec as bigint) * ${9L * s} + (($x * $s) div $p10) - $s)"
    }
    expr(s"(CASE WHEN $v = 0 THEN cast(-1 as bigint) WHEN $v > 0 THEN ${pb(v)} " +
      s"ELSE -2 - ${pb(s"(- ($v))")} END)")
  }

  /** DuckDB mirror of [[logBucketExpr]] — same digit-count decade, same
    * integer floor-divisions, bit-identical bucket for every long.
    */
  def logBucketSql(v: String, s: Int): String = {
    def pb(x: String): String = {
      val dec = s"(length(CAST($x AS VARCHAR)) - 1)"
      val p10 = s"CAST('1' || repeat('0', $dec) AS BIGINT)"
      s"(CAST($dec AS BIGINT) * ${9L * s} + (($x * $s) // $p10) - $s)"
    }
    s"(CASE WHEN $v = 0 THEN CAST(-1 AS BIGINT) WHEN $v > 0 THEN ${pb(v)} " +
      s"ELSE -2 - ${pb(s"(- ($v))")} END)"
  }

  /** Value range [lo, hi) of a POSITIVE log bucket index `b`, Spark-SQL
    * form — exact integer ceil-divisions: decade = b div 9s,
    * sub = b mod 9s + s, lo = ceil(sub·10^decade / s), hi = the next
    * sub-bucket's lo. Relative width ≤ 1/s: (hi − lo)·s ≤ lo + s.
    */
  def logBucketEdgesExpr(b: String, s: Int): (Column, Column) = {
    val p10 = s"cast(concat('1', repeat('0', cast($b div ${9L * s} as int))) as bigint)"
    val sub = s"(($b % ${9L * s}) + $s)"
    (expr(s"(($sub * $p10 + ${s - 1}) div $s)"),
      expr(s"((($sub + 1) * $p10 + ${s - 1}) div $s)"))
  }

  /** DuckDB mirror of [[logBucketEdgesExpr]]. */
  def logBucketEdgesSql(b: String, s: Int): (String, String) = {
    val p10 = s"CAST('1' || repeat('0', CAST($b // ${9L * s} AS INTEGER)) AS BIGINT)"
    val sub = s"(($b % ${9L * s}) + $s)"
    (s"(($sub * $p10 + ${s - 1}) // $s)",
      s"((($sub + 1) * $p10 + ${s - 1}) // $s)")
  }

  /** Counter-wise addition of sketches built with the SAME width dial —
    * exactly the sketch of the concatenated inputs.
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    val keys = sketches.head.columns.filterNot(_ == "n")
    sketches.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(sum("n").as("n"))
  }

  /** Per (keys, p) quantile bucket: the smallest bucket whose running
    * count reaches rank = ceil(p_num/p_den · n_total). Emits
    * (keys..., p_num, p_den, n_total, qrank, bucket); the true
    * p-quantile value lies in [bucket·width, (bucket+1)·width) — pure
    * integer selection, no float boundary anywhere.
    */
  def quantiles(sk: DataFrame, keys: Seq[String],
                ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p._1 >= 1 && p._1 <= p._2),
      s"each p must satisfy 1 <= p_num <= p_den, got $ps")
    val cumW = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    val cum = sk.withColumn("cum", sum(col("n")).over(cumW))
    val tot = sk.groupBy(keys.map(col): _*).agg(sum(col("n")).as("n_total"))
    cum.join(tot, keys)
      .select(col("*"), explode(array(ps.map(p =>
        struct(lit(p._1).as("p_num"), lit(p._2).as("p_den"))): _*)).as("p"))
      .select((keys.map(col) :+ col("bucket") :+ col("cum") :+
        col("n_total") :+ col("p.p_num").as("p_num") :+
        col("p.p_den").as("p_den")): _*)
      .withColumn("qrank", expr("(p_num * n_total + p_den - 1) div p_den"))
      .where(col("cum") >= col("qrank"))
      .groupBy((keys :+ "p_num" :+ "p_den" :+ "n_total" :+ "qrank").map(col): _*)
      .agg(min(col("bucket")).as("bucket"))
      .select((keys.map(col) :+ col("p_num") :+ col("p_den") :+
        col("n_total") :+ col("qrank") :+ col("bucket")): _*)
  }
}
