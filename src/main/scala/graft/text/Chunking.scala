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

  /** CONTENT-DEFINED chunking (Rabin-style): a boundary falls after any
    * token whose trailing `window`-token hash ≡ 0 (mod `divisor`), so
    * boundaries depend only on local CONTENT — an insertion early in a
    * document shifts only the chunk it lands in, and chunking re-syncs
    * at the next content boundary (the property fixed-size chunking
    * lacks; the basis of storage-level dedup). Input (idCol,
    * tokensCol); output one row per chunk: (idCol, chunk_idx,
    * chunk_start 1-based, chunk_len, fp = md5 of the chunk's tokens).
    * Both windows partition per doc — bounded by one document at any
    * corpus size. Expected chunk length ≈ `divisor` tokens.
    */
  def cdcChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
                tokensCol: String, window: Int = 4,
                divisor: Int = 8): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && divisor >= 1,
      s"need positive window/divisor, got window=$window divisor=$divisor")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val wPrev = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tok = df.where(size(col(tokensCol)) >= 1)
      .select(col(idCol), posexplode(col(tokensCol)).as(Seq("p0", "token")))
      .select(col(idCol), (col("p0") + 1).cast("int").as("pos"), col("token"))
    val windowText = concat_ws(" ",
      ((window - 1) to 1 by -1).map(k => lag(col("token"), k).over(w)) :+ col("token"): _*)
    val hash = conv(substring(md5(windowText), 1, 4), 16, 10).cast("long")
    val chunked = tok
      .withColumn("brk",
        when(col("pos") >= window && hash % divisor === 0, lit(1)).otherwise(lit(0)))
      .withColumn("cid", coalesce(sum("brk").over(wPrev), lit(0L)))
    chunked.groupBy(col(idCol), col("cid"))
      .agg(min("pos").cast("int").as("chunk_start"),
        count(lit(1)).cast("int").as("chunk_len"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")))).as("fp"))
      .select(col(idCol), col("cid").cast("int").as("chunk_idx"),
        col("chunk_start"), col("chunk_len"), col("fp"))
  }
}
