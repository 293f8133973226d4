package graft

import graft.functions.SimHistogram
import org.apache.spark.sql.functions._

class HistogramAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  private val sims = Seq(0.0, 0.004, 0.01, 0.5, 0.55, 0.999, 1.0, 0.5)

  test("bins match the reference accumulator semantics: (sim*100).toInt, element-wise merge") {
    val hist = sims.toDF("sim").repartition(4) // force partial buffers + merge
      .agg(udaf(new SimHistogram()).apply(col("sim")).as("h"))
      .as[Seq[Long]].collect()(0)
    assert(hist.length === 101)
    assert(hist(0) === 2)    // 0.0, 0.004
    assert(hist(1) === 1)    // 0.01
    assert(hist(50) === 2)   // 0.5 twice
    assert(hist(55) === 1)
    assert(hist(99) === 1)   // 0.999
    assert(hist(100) === 1)  // 1.0
    assert(hist.sum === sims.length)
  }

  test("agrees with the production groupBy histogram on random data") {
    val df = spark.range(5000)
      .select((abs(hash(col("id"))) % 1000 / 1000.0).as("sim")).cache()
    val viaUdaf = df.agg(udaf(new SimHistogram()).apply(col("sim")))
      .as[Seq[Long]].collect()(0)
    val viaGroupBy = df.groupBy(floor(col("sim") * 100).cast("int").as("bin"))
      .count().as[(Int, Long)].collect().toMap
    (0 to 100).foreach { b =>
      assert(viaUdaf(b) === viaGroupBy.getOrElse(b, 0L), s"bin $b")
    }
  }

  test("registered as a SQL aggregate") {
    spark.udf.register("sim_histogram", udaf(new SimHistogram()))
    sims.toDF("sim").createOrReplaceTempView("sims_v")
    val h = spark.sql("SELECT sim_histogram(sim) FROM sims_v")
      .as[Seq[Long]].collect()(0)
    assert(h(50) === 2)
  }
}
