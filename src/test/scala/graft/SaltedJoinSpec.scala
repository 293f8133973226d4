package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salting must never change results — only how they are distributed. */
class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  private lazy val skewed = ((1 to 900).map(i => (1L, i.toDouble)) ++
    (1 to 100).map(i => (1L + i % 17, i.toDouble))).toDF("k", "v")
  private lazy val dim = (1L to 20L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedEquiJoin returns exactly the plain join's rows, any nSalts") {
    val plain = skewed.join(dim, "k")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    for (n <- Seq(1, 4, 13)) {
      val salted = SaltedJoin.saltedEquiJoin(skewed, dim, "k", n)
        .select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(salted === plain, s"multiplicity mismatch at nSalts=$n")
    }
  }

  test("saltedEquiJoin spreads a hot key over multiple shuffle keys") {
    val n = 8
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(n)))
    val spread = l.where(col("k") === 1L).select("_salt").distinct().count()
    assert(spread >= n / 2,
      s"hot key must spread over many salts, got $spread of $n")
  }

  test("saltedCollectSet equals direct collect_set with bounded partials") {
    val direct = skewed.groupBy("k")
      .agg(array_sort(collect_set(col("v"))).as("v_set"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val salted = SaltedJoin.saltedCollectSet(skewed, "k", "v", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(salted === direct)
  }
}
