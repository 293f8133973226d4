package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

/** The Efraimidis–Spirakis draw (q165): priority ln(u)/w with a
  * deterministic md5 uniform, top-k per group = a weight-proportional
  * without-replacement sample. The spec pins (1) the mergeable k-slot
  * selection against the window formulation it replaces — same total
  * order, so they must agree row for row — and (2) the weighting
  * actually biting: under ln(u)/w, a weight-10000 doc loses to a
  * weight-1 doc only on a ~1-in-10000 uniform tail, so the heavy
  * handful must sweep the sample.
  */
class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private def esKey(idCol: String, wCol: String) =
    log((conv(substring(md5(concat(col(idCol).cast("string"), lit(":w"))),
      1, 13), 16, 10).cast("long") + 1) / lit(4503599627370496.0)) / col(wCol)

  test("mergeable k-slot selection equals the row_number window formulation") {
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b",
      1L + i % 17)).toDF("id", "grp", "w")
      .withColumn("key", esKey("id", "w"))
    val viaAgg = docs.groupBy("grp")
      .agg(TopKAggregator.topK(7)(col("key"), col("id")).as("tk"))
      .select(col("grp"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("grp"), (col("pos") + 1).as("rk"), col("t.cand_id").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = docs.withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("key").desc, col("id"))))
      .where(col("rk") <= 7).select("grp", "rk", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("weight-proportional: heavy docs sweep the draw; sample is without replacement") {
    // 5 docs at weight 10000 among 95 at weight 1 — an E-S top-10 must
    // contain all 5 (each would need a ~1e-4 uniform tail to lose)
    val docs = (1L to 100L).map(i => (i, if (i <= 5) 10000L else 1L))
      .toDF("id", "w").withColumn("key", esKey("id", "w"))
    val picked = docs.agg(TopKAggregator.topK(10)(col("key"), col("id")).as("tk"))
      .select(explode(col("tk")).as("t")).select(col("t.cand_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(picked.size === 10)
    assert(picked.distinct.size === 10, "without replacement: no repeats")
    assert((1L to 5L).forall(picked.contains),
      s"all heavy docs must be drawn, got ${picked.sorted}")
  }

  test("the uniform is in (0, 1]: every priority is finite and non-positive") {
    val docs = (1L to 500L).map(i => (i, 1L + i % 9)).toDF("id", "w")
      .withColumn("key", esKey("id", "w"))
    val stats = docs.agg(min("key"), max("key"), count(when(isnan(col("key"))
      || col("key").isNull, 1))).collect()(0)
    assert(stats.getLong(2) === 0L, "no NaN/null priorities")
    assert(stats.getDouble(1) <= 0.0, "ln of a (0,1] uniform is <= 0")
    assert(stats.getDouble(0) > Double.NegativeInfinity,
      "the +1 offset keeps u > 0 — ln never hits -inf")
  }
}
