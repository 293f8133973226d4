package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — the multi-column half of
  * storage locality (see [[PartitionedLayout]] for directory pruning
  * and [[Bucketing]] for shuffle elimination): bit-interleaving the
  * quantized values of several columns produces ONE sort key under
  * which rows close in ANY of the dimensions land in the same files,
  * so parquet min/max statistics prune scans filtered on ANY clustered
  * column — a linearly sorted layout serves only its leading sort
  * column, and a 100 TB fact table cannot afford one copy per query
  * dimension.
  *
  * Everything is closed-form column arithmetic (quantize = scale into
  * 2^bits buckets against broadcast bounds; interleave = shift-and-or
  * over the bit positions) — codegen-friendly, no UDFs, and the write
  * is one `repartitionByRange` on the z-key (range partitioning makes
  * file boundaries contiguous z-ranges) plus an in-partition sort that
  * tightens per-row-group statistics.
  */
object ZOrder {

  /** Quantize a numeric column into [0, 2^bits) against [lo, hi]
    * bounds (broadcast scalars): the per-dimension grid coordinate of
    * the Morton curve. Degenerate lo = hi maps to bucket 0.
    */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val buckets = 1L << bits
    val scaled = when(hi <= lo, lit(0L))
      .otherwise(least(lit(buckets - 1),
        floor((c.cast("double") - lo) / (hi - lo) * buckets).cast("long")))
    greatest(lit(0L), scaled)
  }

  /** Bit-interleave k grid coordinates (each already in [0, 2^bits))
    * into the Morton z-value: output bit i·k + j takes bit i of
    * column j. k·bits must fit a long (≤ 63).
    */
  def interleave(coords: Seq[Column], bits: Int): Column = {
    val k = coords.size
    require(k >= 1 && k * bits <= 63, s"$k cols x $bits bits exceeds a long")
    val terms = for {
      i <- 0 until bits; (c, j) <- coords.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(1), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` into `nFiles` parquet files clustered on the Z-curve
    * over `zCols` (numeric). Bounds for quantization come from one
    * min/max aggregation broadcast back — never a driver-side collect.
    * The z-key is internal: dropped before the write, once the range
    * exchange and in-partition sort have consumed it.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int, bits: Int = 16): Unit = {
    require(zCols.nonEmpty, "at least one z-order column required")
    val aggs = zCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"_lo$i"),
        max(col(c)).cast("double").as(s"_hi$i"))
    }
    val b = df.agg(aggs.head, aggs.tail: _*)
    val withKey = df.crossJoin(broadcast(b))
    val coords = zCols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), col(s"_lo$i"), col(s"_hi$i"), bits)
    }
    withKey
      .withColumn("_zkey", interleave(coords, bits))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop(zCols.indices.flatMap(i => Seq(s"_lo$i", s"_hi$i")) :+ "_zkey": _*)
      .write.mode("overwrite").parquet(path)
  }
}
