package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as pure relational
  * algebra — the fixed-size frequency summary of the approx-sketch
  * family (HLL distinct q87, KLL percentile q86, Bloom membership q74):
  * estimate any item's frequency from depth×width counters instead of
  * a corpus-sized count table.
  *
  * The sketch IS a (row, bucket) → count table: row i hashes item x to
  * bucket h_i(x) and sums weights; the estimate is the MIN over rows of
  * the hit counter — never an undercount (every occurrence of x lands
  * in counter (i, h_i(x))), overcounting only by hash collisions, and
  * the d independent rows make a lucky-collision estimate exponentially
  * unlikely (w.p. 1−(1/e)^d the error is ≤ e·N/width).
  *
  * Scale shape: building is ONE hash aggregation onto at most
  * depth·width groups — partial aggregation collapses each partition
  * to sketch size before the shuffle, so the exchange moves
  * O(partitions · depth · width) rows regardless of corpus size, and
  * two sketches merge by adding counters (the hash agg does exactly
  * that), which is what makes the artifact streamable and unionable
  * across corpus shards. Estimation is a bounded equi-join against the
  * depth·width-row sketch.
  *
  * Determinism: h_i(x) = first 8 md5 hex digits of "i:x" mod width —
  * engine-portable (md5 is bit-identical everywhere; the hex→int→mod
  * chain mirrors verbatim in SQL), so the whole sketch, estimates and
  * overcounts hash-match the DuckDB oracle EXACTLY (q142) — no
  * probabilistic bound rows needed.
  */
object CountMin {

  /** Bucket of `item` in sketch row `i`: md5-based, engine-portable. */
  def bucket(item: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), item)), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch over item instances (one input row = `weight`
    * occurrences of `item`; pass lit(1L) for plain counting). Returns
    * (r, b, cnt) with one row per NON-EMPTY counter — at most
    * depth·width rows.
    */
  def sketch(items: DataFrame, item: Column, weight: Column,
             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch dims $depth x $width")
    items
      .select(posexplode(array((0 until depth).map(i => bucket(item, i, width)): _*))
        .as(Seq("r", "b")), weight.as("w"))
      .groupBy("r", "b").agg(sum("w").as("cnt"))
  }

  /** Merge sketches built with the SAME (depth, width, hash) dial by
    * counter-wise addition — the property that makes the artifact
    * unionable across corpus shards and streamable: build per shard
    * where the data lives, ship only depth·width counters, add. The
    * result is EXACTLY the sketch of the concatenated corpora
    * (CountMinSpec proves it; q146 proves it under the DuckDB gate),
    * because each counter is a plain sum over its hash bucket.
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("r", "b").agg(sum("cnt").as("cnt"))
  }

  /** Point-estimate the frequency of every item in `queries`: join each
    * (item, row-i bucket) against the sketch and take the min over
    * rows. Items whose every counter is empty estimate 0 (the min
    * coalesces — an item never inserted can still collide, so this
    * matters only for width ≫ items). Returns `queries` plus `cms_est`.
    */
  def estimate(queries: DataFrame, item: Column, sketch: DataFrame,
               depth: Int, width: Int): DataFrame = {
    val cols = queries.columns
    val probes = queries
      .select(col("*"), posexplode(
        array((0 until depth).map(i => bucket(item, i, width)): _*)).as(Seq("r", "b")))
    probes.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(cols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** [[estimate]] without any aggregation — one broadcast left join per
    * sketch row and a `least` across them — so it composes into a
    * STATELESS Structured-Streaming pipeline (stream-static joins need
    * no watermark or state store; a per-item min over probe rows
    * would). Same ESTIMATE per item as [[estimate]], but different row
    * multiplicity: [[estimate]] groups by all query columns and so
    * collapses duplicate query rows into one output row, while this
    * form preserves every input row (a stream can't collapse across
    * rows statelessly). Deduplicate the query side first if you need
    * the two to agree row for row. Depth is small (3–5), so the join
    * chain stays a constant factor.
    */
  def estimateStateless(queries: DataFrame, item: Column, sketch: DataFrame,
                        depth: Int, width: Int): DataFrame = {
    val joined = (0 until depth).foldLeft(queries) { (df, i) =>
      df.join(
        broadcast(sketch.where(col("r") === i)
          .select(col("b").as(s"_cms_b$i"), col("cnt").as(s"_cms_c$i"))),
        bucket(item, i, width) === col(s"_cms_b$i"), "left")
    }
    val est = least((0 until depth).map(i => coalesce(col(s"_cms_c$i"), lit(0L))): _*)
    joined.withColumn("cms_est", est)
      .drop((0 until depth).flatMap(i => Seq(s"_cms_b$i", s"_cms_c$i")): _*)
  }
}
