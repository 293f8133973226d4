package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document chunking: split a token array into fixed-size windows with
  * overlap — the precursor to sequence packing in a pretraining
  * pipeline (long docs become `chunkSize`-token chunks every `stride`
  * tokens; `chunkSize > stride` gives `chunkSize − stride` tokens of
  * overlap so no boundary context is lost). Pure column expressions:
  * map-side, engine-portable, no UDF.
  */
object Chunking {

  /** ARRAY<ARRAY<STRING>> of chunks: chunk i = tokens[i·stride ..
    * i·stride + chunkSize − 1] (clamped at the tail, so the last chunk
    * may be short), chunk count = 1 + ceil(max(n − chunkSize, 0) /
    * stride) — the last chunk is the FIRST one reaching the end of the
    * doc, so every token is covered and no chunk is fully contained in
    * its predecessor. Empty docs yield no chunks.
    */
  def chunks(tokens: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val n = size(tokens)
    val lastIdx = ceil(greatest(n - chunkSize, lit(0)).cast("double") / stride).cast("int")
    // sequence(a, b) DESCENDS when a > b — guard the empty-doc case
    when(n === 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), lastIdx),
        i => slice(tokens, i * stride + 1, lit(chunkSize))))
  }
}
