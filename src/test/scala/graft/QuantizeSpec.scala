package graft

import graft.ann.Quantize
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("codes span 0..255, reconstruction cosine near 1, constant vectors safe") {
    val df = Seq(
      (1L, Array(0.0f, 1.0f, 2.0f, 3.0f)),
      (2L, Array(-5.0f, 0.0f, 5.0f, 10.0f)),
      (3L, Array(2.5f, 2.5f, 2.5f, 2.5f))  // constant → scale 0
    ).toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"),
        Quantize.quantizeCodes(col("embedding")).as("codes"),
        Quantize.reconstructionCosine(col("embedding")).as("rc"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(rows(1L)._1 === Seq(0, 85, 170, 255))
    assert(rows(1L)._2.get > 0.999)
    assert(rows(2L)._1.head === 0)
    assert(rows(2L)._1.last === 255)
    assert(rows(2L)._2.get > 0.999)
    assert(rows(3L)._1 === Seq(0, 0, 0, 0))    // no div-by-zero under ANSI
  }

  test("native fidelity kernel matches the higher-order spec bit-for-bit") {
    val df = (Seq(
      (1000L, Array(0.0f, 0.0f, 0.0f)),          // zero vector → NULL cosine
      (1001L, Array(2.5f, 2.5f, 2.5f)),          // constant → all-zero codes
      (1002L, Array(-1.5f, 0.0f, 7.25f, 3.3f))
    ) ++ Seq.tabulate(200)(i =>
      (i.toLong, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 9).toFloat))))
      .toDF("vec_id", "embedding")
    val kernel = Quantize.fidelity(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val hof = Quantize.fidelityHof(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(kernel.keySet === hof.keySet)
    kernel.foreach { case (id, (cs, rc)) =>
      assert(cs === hof(id)._1, s"code_sum diverges for $id")
      assert(rc === hof(id)._2, s"recon_cos diverges for $id (bit-exactness required)")
    }
    assert(kernel(1000L)._2.isEmpty)
    assert(kernel(1001L)._1 === 0L)
  }

  test("dequantize returns values within half a quantization step") {
    val df = Seq((1L, Array.tabulate(64)(i => (math.sin(i) * 7).toFloat)))
      .toDF("vec_id", "embedding")
    val err = df.select(
        aggregate(zip_with(
          transform(col("embedding"), _.cast("double")),
          Quantize.dequantize(col("embedding"), Quantize.quantizeCodes(col("embedding"))),
          (a, b) => abs(a - b)), lit(0.0), (m, v) => greatest(m, v)).as("maxerr"),
        ((array_max(col("embedding")) - array_min(col("embedding"))) / 255.0 / 2.0 + 1e-12)
          .as("halfstep"))
      .collect()(0)
    assert(err.getDouble(0) <= err.getDouble(1))
  }
}
