package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k minimum values, Bar-Yossef et al. 2002) — the distinct-
  * SAMPLING member of the portable-sketch family ([[CountMin]]
  * frequencies, [[HyperLogLog]] distinct counts, Bloom membership,
  * [[BucketHistogram]] quantiles): keep the k smallest distinct hash
  * values of a key set. One bounded buffer answers three questions at
  * once — a distinct-count estimate ((k−1)·H/h_k, relative error
  * ≈ 1/√(k−2)), a UNIFORM SAMPLE of the distinct keys (what HLL
  * cannot give back), and set resemblance: for two sketches over the
  * same hash, |bottomK(A∪B) ∩ A ∩ B| / |bottomK(A∪B)| estimates
  * Jaccard — the sketch-sized answer to "how similar are these two
  * audiences" that needs no pass over either set again.
  *
  * Scale shape: building is ONE hash aggregation; the k-slot DISTINCT
  * buffer partial-aggregates ([[KmvAggregator]], the [[KSlotAggregator]]
  * discipline), so each partition collapses to ≤ k values before the
  * exchange and the shuffle moves O(partitions·k) rows regardless of
  * corpus size. Two sketches merge by bottom-k of the union —
  * idempotent and commutative (re-delivered shards are harmless).
  *
  * Determinism and engine parity: the hash is the md5-hex integer
  * trick ([[HyperLogLog]]) — chars 1..15 as a 60-bit integer, exact in
  * any engine's BIGINT — and the estimate divides two exactly-known
  * doubles (long→double casts and division are correctly rounded
  * IEEE 754 in both engines, unlike libm transcendentals), so every
  * emitted value hash-matches DuckDB with NO rounding anywhere.
  */
object Kmv {

  /** 2^60 as an exact double (and the exclusive upper bound of
    * [[hash60]] + 1).
    */
  val Scale: Double = 1152921504606846976.0

  /** Uniform 60-bit integer hash: md5 hex chars 1..15 as a BIGINT in
    * [0, 2^60). Mirror: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def hash60(item: Column): Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")

  /** Column form: aggregate `hash60(item)` values into the sorted
    * array of the ≤ k smallest DISTINCT hashes.
    */
  def bottomKDistinct(k: Int)(h: Column): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(h)

  /** Column form over GLOBALLY-UNIQUE hashes (deduplicate upstream):
    * the O(log k) heap buffer instead of the O(k) distinct-checking
    * sorted insert.
    */
  def bottomKUnique(k: Int)(h: Column): Column =
    udaf(new BottomKHeapAggregator(k), Encoders.scalaLong).apply(h)

  /** One sketch row per `keys` group: (keys..., kmv ARRAY<BIGINT> —
    * sorted ascending, ≤ k distinct hashes). Duplicate items are free,
    * so the input needs no pre-distinct.
    *
    * Two physically different plans, one output: BATCH inputs dedup
    * (keys, hash) relationally first — map-side partial dedup makes the
    * exchange move near-distinct rows, and the buffer then never sees a
    * duplicate, so the cheap O(log k)-insert heap ([[BottomKHeapAggregator]])
    * replaces the O(k) sorted-insert distinct buffer (7× on the q153
    * bench shape at k = 2048). STREAMING inputs skip the dedup — a
    * streaming `distinct` would grow state with cardinality, the exact
    * failure the sketch exists to avoid — and pay the distinct-checking
    * buffer ([[KmvAggregator]]) whose state stays keys·k longs.
    */
  def sketch(items: org.apache.spark.sql.DataFrame, item: Column,
             keys: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    if (items.isStreaming)
      items.groupBy(keys.map(col): _*)
        .agg(bottomKDistinct(k)(hash60(item)).as("kmv"))
    else
      items.select(keys.map(col) :+ hash60(item).as("h"): _*)
        .distinct()
        .groupBy(keys.map(col): _*)
        .agg(bottomKUnique(k)(col("h")).as("kmv"))

  /** Merge two sketch ARRAYS built with the SAME (k, hash) dial:
    * bottom-k of the distinct union — exactly the sketch of the
    * concatenated inputs, idempotent under re-delivery.
    */
  def mergeArrays(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** MAP-SIDE sketch of one row's item ARRAY (e.g. a document's
    * shingle set): bottom-k distinct hashes as pure higher-order
    * functions — no aggregation, no shuffle, no state. The per-row twin
    * of [[sketch]]: routing/scoring a stream of documents against
    * stored audience sketches stays embarrassingly parallel because
    * each row's sketch is computed where the row already is.
    */
  def arraySketch(items: Column, k: Int): Column =
    slice(array_sort(array_distinct(transform(items, hash60(_)))), 1, k)

  /** DuckDB SQL mirroring [[arraySketch]] over a list column. */
  def arraySketchSql(itemsSql: String, k: Int): String =
    s"list_sort(list_distinct(list_transform($itemsSql, x -> ${hash60Sql("x")})))[1:$k]"

  /** Distinct-count estimate from a sketch array: exact |sketch| when
    * the buffer never filled (fewer than k distinct keys exist — the
    * sketch IS the distinct hash set), else the KMV estimator
    * (k−1)·2^60 / h_k with h_k the k-th smallest hash. Pure
    * long→double casts + one IEEE division — bit-exact cross-engine.
    */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Scale)
        / element_at(kmv, k).cast("double"))

  /** Jaccard resemblance of the key sets behind sketches `a` and `b`:
    * the fraction of the merged sketch (a uniform bottom-k sample of
    * A∪B's distinct hashes) present in BOTH inputs. Exact integer
    * set algebra + one IEEE division; error ≈ 1/√k. Empty-union pairs
    * estimate 0.
    *
    * The union is BOUND AS A LAMBDA VARIABLE (a one-element transform)
    * before the three places that read it: written naively, Catalyst
    * re-inlines the k-element sort/distinct subtree into every
    * reference — 3× the array work per call, which dominated q158's
    * per-doc routing. A lambda variable is an already-computed value,
    * so the union is built once and the native hash-based
    * array_intersect stays. Counts (and the emitted double) are
    * unchanged, so the DuckDB mirror ([[jaccardSql]]) is untouched.
    */
  def jaccard(a: Column, b: Column, k: Int): Column =
    element_at(transform(array(mergeArrays(a, b, k)), u =>
      when(size(u) === 0, lit(0.0))
        .otherwise(size(array_intersect(array_intersect(u, a), b)).cast("double")
          / size(u).cast("double"))), 1)

  /** DuckDB SQL mirroring [[hash60]]. */
  def hash60Sql(itemSql: String): String =
    s"CAST('0x' || substr(md5($itemSql), 1, 15) AS BIGINT)"

  /** DuckDB SQL mirroring [[sketch]]: a CTE emitting (keyCols, kmv)
    * with kmv the sorted ≤ k smallest distinct hashes per group.
    */
  def sketchSql(itemSql: String, fromSql: String, keyCols: String, k: Int): String =
    s"""SELECT $keyCols, list_sort(list(DISTINCT h))[1:$k] AS kmv
        FROM (SELECT $keyCols, ${hash60Sql(itemSql)} AS h FROM $fromSql)
        GROUP BY $keyCols"""

  /** DuckDB SQL mirroring [[estimate]] over a sketch list column. */
  def estimateSql(kmvSql: String, k: Int): String =
    s"""CASE WHEN len($kmvSql) < $k THEN CAST(len($kmvSql) AS DOUBLE)
        ELSE ${(k - 1).toDouble} * 1152921504606846976.0
             / CAST($kmvSql[$k] AS DOUBLE) END"""

  /** DuckDB SQL mirroring [[jaccard]] over two sketch list columns
    * built with the same (k, hash) dial.
    */
  def jaccardSql(aSql: String, bSql: String, k: Int): String = {
    val u = s"list_sort(list_distinct($aSql || $bSql))[1:$k]"
    s"""CASE WHEN len($u) = 0 THEN 0.0
        ELSE CAST(len(list_filter($u,
               x -> list_contains($aSql, x) AND list_contains($bSql, x)))
             AS DOUBLE) / CAST(len($u) AS DOUBLE) END"""
  }

  /** Theta threshold of two sketches (Dasgupta et al., theta sketches:
    * the KMV pair's common uniform-sampling cutoff): the smaller of the
    * two k-th hashes when both buffers filled; an unfilled buffer IS
    * its whole hash set, so its implicit cutoff is 2^60 ([[Scale]]).
    * Every hash below θ was retained by BOTH sketches, so
    * {h ∈ A∪B : h < θ} is a uniform sample of the union's distinct
    * hashes with known inclusion probability θ/2^60 — the basis for
    * direct set-operation CARDINALITY estimates ([[setOps]]), where
    * [[jaccard]] only gives the ratio.
    */
  def theta(a: Column, b: Column, k: Int): Column = {
    val ta = when(size(a) < k, lit(1152921504606846976L)).otherwise(element_at(a, k))
    val tb = when(size(b) < k, lit(1152921504606846976L)).otherwise(element_at(b, k))
    least(ta, tb) // BIGINT — the h < θ sample test stays exact integer
  }

  /** Set-operation cardinality estimates from two sketches alone:
    * (n_sample, union_est, inter_est, a_only_est) where n_sample =
    * |{h ∈ distinct(a∪b) : h < θ}| and each estimate is
    * (retained count) · 2^60/θ — one IEEE multiply-divide over exact
    * integer counts, bit-identical cross-engine. Exact when neither
    * buffer filled (θ = 2^60 ⇒ the scale factor is exactly 1).
    * Relative error ≈ 1/√k on the union; intersection/difference
    * absolute error scales with the union size (4σ ≈ 2·union/√k).
    */
  def setOps(a: Column, b: Column, k: Int): Column = {
    val th = theta(a, b, k)
    val u = array_distinct(concat(a, b))
    val sample = filter(u, h => h < th)
    val nS = size(sample)
    val nI = size(filter(sample, h => array_contains(a, h) && array_contains(b, h)))
    val nA = size(filter(sample, h => array_contains(a, h) && !array_contains(b, h)))
    val scale = lit(Scale) / th.cast("double")
    struct(nS.as("n_sample"),
      (nS.cast("double") * scale).as("union_est"),
      (nI.cast("double") * scale).as("inter_est"),
      (nA.cast("double") * scale).as("a_only_est"))
  }

  /** DuckDB SQL mirroring [[theta]] (BIGINT). */
  def thetaSql(aSql: String, bSql: String, k: Int): String =
    s"""LEAST(CASE WHEN len($aSql) < $k THEN 1152921504606846976
                   ELSE $aSql[$k] END,
              CASE WHEN len($bSql) < $k THEN 1152921504606846976
                   ELSE $bSql[$k] END)"""

  /** DuckDB SQL mirroring one [[setOps]] field: `which` ∈
    * sample/union/inter/aonly. Counts are exact integer list algebra;
    * the scale multiply mirrors the Column form operation-for-operation.
    */
  def setOpSql(aSql: String, bSql: String, k: Int, which: String): String = {
    val th = thetaSql(aSql, bSql, k)
    val sample = s"list_filter(list_distinct($aSql || $bSql), h -> h < $th)"
    val cnt = which match {
      case "sample" => s"len($sample)"
      case "union"  => s"len($sample)"
      case "inter"  =>
        s"len(list_filter($sample, h -> list_contains($aSql, h) AND list_contains($bSql, h)))"
      case "aonly"  =>
        s"len(list_filter($sample, h -> list_contains($aSql, h) AND NOT list_contains($bSql, h)))"
      case other => throw new IllegalArgumentException(s"unknown setOp $other")
    }
    if (which == "sample") s"CAST($cnt AS INTEGER)"
    else s"CAST($cnt AS DOUBLE) * (1152921504606846976.0 / CAST($th AS DOUBLE))"
  }

  /** Equi-join OUTPUT-SIZE estimation before paying the join's shuffle
    * (the classic sketch-based cardinality question — AGMS/end-biased
    * sampling, here from the KMV threshold): |A ⋈ B| = Σ_key fA·fB is
    * estimated as Σ over a uniform key sample of fA·fB, scaled by the
    * inverse inclusion probability 2^60/θ. The number a planner (or an
    * operator about to launch a dedup self-join — THE blow-up hazard)
    * wants before committing a 100 TB shuffle.
    *
    * Every pass is map-side with a k-bounded exchange:
    *  1. θ — one [[bottomKDistinct]] partial aggregation over the raw
    *     key hashes (each partition ships ≤ k longs; no pre-distinct);
    *  2. the sampled keys — the h < θ filter runs BEFORE the distinct,
    *     so the dedup shuffle sees only sample-survivors (≤ k−1 keys);
    *  3. exact per-side frequencies of sampled keys — broadcast
    *     semi-join + hash agg onto ≤ k−1 groups.
    * Exact (θ = 2^60, scale 1) whenever the union has fewer than k
    * distinct keys; otherwise unbiased with relative error ~1/√k times
    * the frequency skew. Keys are hashed via their string form —
    * cross-engine portable ([[hash60Sql]] on `key::VARCHAR`).
    *
    * Returns one row: (theta, n_sampled, n_both, s_sum,
    * est_join_size) — n_both the sampled keys present on BOTH sides,
    * s_sum the exact integer Σ fA·fB over the sample, the estimate one
    * IEEE divide of exact operands (bit-identical cross-engine).
    */
  def joinSizeEst(left: org.apache.spark.sql.DataFrame,
                  right: org.apache.spark.sql.DataFrame,
                  keyCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val lk = left.select(col(keyCol).cast("string").as("key"))
    val rk = right.select(col(keyCol).cast("string").as("key"))
    val all = lk.union(rk)
    val th = all.select(hash60(col("key")).as("h"))
      .agg(bottomKDistinct(k)(col("h")).as("kmv"))
      .select(when(size(col("kmv")) < k, lit(1152921504606846976L))
        .otherwise(element_at(col("kmv"), k)).as("theta"))
    val sampled = all.withColumn("h", hash60(col("key")))
      .crossJoin(broadcast(th))
      .where(col("h") < col("theta"))   // map-side: kills ~all rows pre-shuffle
      .select("key").distinct()         // ≤ k−1 surviving keys
    val fa = lk.join(broadcast(sampled), "key")
      .groupBy("key").agg(count(lit(1)).as("fa"))
    val fb = rk.join(broadcast(sampled), "key")
      .groupBy("key").agg(count(lit(1)).as("fb"))
    val s = fa.join(fb, "key")          // inner: one-sided keys contribute 0
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).cast("long").as("s_sum"),
        count(lit(1)).cast("long").as("n_both"))
    val nS = sampled.agg(count(lit(1)).cast("long").as("n_sampled"))
    s.crossJoin(broadcast(nS)).crossJoin(broadcast(th))
      .select(col("theta"), col("n_sampled"), col("n_both"), col("s_sum"),
        (col("s_sum").cast("double") / (col("theta").cast("double") / lit(Scale)))
          .as("est_join_size"))
  }
}

/** Bottom-k DISTINCT longs as a mergeable aggregation — the KMV
  * buffer. Same k-slot discipline as [[KSlotAggregator]] but with
  * set-semantics: a hash already in the buffer is dropped (KMV is over
  * the DISTINCT key set; duplicates must not occupy slots).
  *
  * Buffer layout mirrors [[BottomKHeapAggregator]] (slot 0 = live
  * count, slots 1..k = max-heap of the smallest distinct values seen),
  * because the original sorted-List form paid O(k) PER INPUT ROW even
  * on reject — `lengthCompare(k)` and `.last` each walk the k-long
  * list before a row ≥ the current k-th smallest can be dropped — at
  * k = 1024 over a corpus-sized input that is ~2k pointer hops per
  * input row in the θ pass of [[Kmv.joinSizeEst]] (q162).
  * Here a reject is ONE comparison against the heap root; the distinct
  * check (a linear scan of ≤ k live slots) runs only on the rare
  * accept path (≈ k·ln(n/k) accepts per partition). finish sorts
  * ascending — bit-identical output to the sorted-List form, which
  * KmvSpec pins by parity.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  @inline private def siftDown(h: Array[Long], n: Int, i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i; val r = l + 1
      var big = i
      if (l <= n && h(l) > h(big)) big = l
      if (r <= n && h(r) > h(big)) big = r
      if (big == i) done = true
      else { val t = h(i); h(i) = h(big); h(big) = t; i = big }
    }
  }

  private def insert(buf: Array[Long], x: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n >= k && x >= buf(1)) return buf // O(1) reject: ≥ current k-th smallest
    var i = 1
    while (i <= n) { // distinct check — accept path only
      if (buf(i) == x) return buf
      i += 1
    }
    if (n < k) {
      buf(0) = n + 1
      i = n + 1
      buf(i) = x
      while (i > 1 && buf(i / 2) < buf(i)) {
        val t = buf(i); buf(i) = buf(i / 2); buf(i / 2) = t; i = i / 2
      }
    } else { // full: x < buf(1), evict the current k-th smallest
      buf(1) = x
      siftDown(buf, k, 1)
    }
    buf
  }

  def zero: Array[Long] = new Array[Long](k + 1)
  def reduce(buf: Array[Long], x: Long): Array[Long] = insert(buf, x)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    val nb = b(0).toInt
    var acc = a
    while (i <= nb) { acc = insert(acc, b(i)); i += 1 }
    acc
  }
  def finish(buf: Array[Long]): Seq[Long] =
    buf.slice(1, buf(0).toInt + 1).sorted.toSeq
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Bottom-k of GLOBALLY-UNIQUE longs as a mergeable bounded max-heap —
  * the batch fast path behind [[Kmv.sketch]]. After the relational
  * (keys, hash) dedup no duplicate can reach the buffer, so the
  * distinct check is unnecessary and insertion is heap sift-down:
  * O(1) reject once full (x ≥ root of the max-heap), O(log k) accept —
  * versus [[KmvAggregator]]'s O(k) list rebuild per accept, which
  * dominates a large-k build (k·ln(n/k) accepts per partition, each
  * paying k). Buffer layout: slot 0 = live count, slots 1..k = max-heap
  * (fixed k+1 longs, mutated in place between rows — Spark serializes
  * the typed buffer only at partial-output boundaries). finish sorts
  * ascending, so the output is bit-identical to the distinct buffer's.
  */
class BottomKHeapAggregator(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  @inline private def siftDown(h: Array[Long], n: Int, i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i; val r = l + 1
      var big = i
      if (l <= n && h(l) > h(big)) big = l
      if (r <= n && h(r) > h(big)) big = r
      if (big == i) done = true
      else { val t = h(i); h(i) = h(big); h(big) = t; i = big }
    }
  }

  private def add(buf: Array[Long], x: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n < k) {
      // heap-insert by sift-up
      buf(0) = n + 1
      var i = n + 1
      buf(i) = x
      while (i > 1 && buf(i / 2) < buf(i)) {
        val t = buf(i); buf(i) = buf(i / 2); buf(i / 2) = t; i = i / 2
      }
    } else if (x < buf(1)) { // evict the current k-th smallest
      buf(1) = x
      siftDown(buf, k, 1)
    }
    buf
  }

  def zero: Array[Long] = new Array[Long](k + 1)
  def reduce(buf: Array[Long], x: Long): Array[Long] = add(buf, x)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 1
    val nb = b(0).toInt
    var acc = a
    while (i <= nb) { acc = add(acc, b(i)); i += 1 }
    acc
  }
  def finish(buf: Array[Long]): Seq[Long] =
    buf.slice(1, buf(0).toInt + 1).sorted.toSeq
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
