package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact-parity replacement for the reference's custom Spark accumulator
  * (`VectorAccumulatorParam.scala:5-14` + the ±1 bin updates in
  * `ScalableEntityResolution.scala:161-171,329-347`): a typed
  * `Aggregator` that folds similarity values into a 101-bin count
  * vector, bin = (sim*100).toInt, merged element-wise.
  *
  * The production path uses a plain `groupBy(bin).count()`
  * (`graft.er.ErEvaluation`) — this Aggregator exists as the engine's
  * custom-UDAF surface (registerable for SQL via `spark.udf.register`)
  * and as a semantic spec of the reference's accumulator: partial
  * buffers per partition, element-wise merge, one pass, no driver
  * mutation.
  */
class SimHistogram(nBins: Int = 101) extends Aggregator[Double, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](nBins)

  override def reduce(buf: Array[Long], sim: Double): Array[Long] = {
    // reference binning: (sim * 100).toInt (ScalableEntityResolution.scala:340);
    // clamp so out-of-range similarities can't corrupt the buffer
    val bin = math.min(math.max((sim * 100).toInt, 0), nBins - 1)
    buf(bin) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
