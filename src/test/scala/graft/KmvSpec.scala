package graft

import graft.functions.{Kmv, KmvAggregator}
import org.apache.spark.sql.functions._

/** KMV bottom-k sketch: the buffer must hold exactly the k smallest
  * DISTINCT 60-bit hashes, merge by bottom-k-of-union, estimate
  * exactly in the unfilled regime and by (k−1)·2^60/h_k when full, and
  * give back Jaccard resemblance from two sketches alone. A JVM-side
  * md5 twin pins the hash chain, so a silent change to [[Kmv.hash60]]
  * (or a DuckDB/Spark md5 divergence) fails here before the oracle
  * gate sees it.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  /** JVM twin of [[Kmv.hash60]]: md5 hex chars 1..15 as a long. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hash60 matches the JVM md5 twin") {
    val items = Seq("a", "item-42", "", "ünïcode", "1-2").toDF("s")
    val got = items.select(col("s"), Kmv.hash60(col("s")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((s, h) <- got) assert(h === h60(s), s"hash60('$s')")
  }

  test("sketch keeps exactly the k smallest distinct hashes, sorted") {
    val items = (1 to 50).map(i => ("g", s"it$i")).toDF("g", "s")
    val k = 8
    val sk = Kmv.sketch(items, col("s"), Seq("g"), k)
      .select("kmv").as[Seq[Long]].collect()
    assert(sk.length === 1)
    val expect = (1 to 50).map(i => h60(s"it$i")).distinct.sorted.take(k)
    assert(sk.head === expect)
  }

  test("duplicates do not occupy slots (distinct semantics)") {
    val dups = (1 to 6).flatMap(i => Seq.fill(5)(("g", s"it$i"))).toDF("g", "s")
    val k = 10
    val sk = Kmv.sketch(dups, col("s"), Seq("g"), k)
      .select("kmv").as[Seq[Long]].collect().head
    assert(sk === (1 to 6).map(i => h60(s"it$i")).sorted,
      "5× repeated items must leave the buffer identical to the distinct set")
  }

  test("estimate: exact |sketch| when unfilled, (k−1)·2^60/h_k when full") {
    val k = 16
    // unfilled: 9 distinct < k → estimate IS the distinct count
    val small = (1 to 9).map(i => ("g", s"u$i")).toDF("g", "s")
    val eSmall = Kmv.sketch(small, col("s"), Seq("g"), k)
      .select(Kmv.estimate(col("kmv"), k)).as[Double].collect().head
    assert(eSmall === 9.0)
    // full: 500 distinct ≫ k → the KMV estimator off the k-th hash
    val big = (1 to 500).map(i => ("g", s"u$i")).toDF("g", "s")
    val eBig = Kmv.sketch(big, col("s"), Seq("g"), k)
      .select(Kmv.estimate(col("kmv"), k)).as[Double].collect().head
    val hk = (1 to 500).map(i => h60(s"u$i")).sorted.apply(k - 1)
    assert(eBig === (k - 1).toDouble * Kmv.Scale / hk.toDouble)
    // and it should be in the right ballpark (σ ≈ 1/√(k−2) ≈ 27%)
    assert(eBig > 150 && eBig < 1500, s"estimate $eBig wildly off 500")
  }

  test("merge ≡ sketch of the concatenated input, and is idempotent") {
    val k = 12
    val a = (1 to 40).map(i => ("g", s"a$i")).toDF("g", "s")
    val b = (20 to 60).map(i => ("g", s"b$i")).toDF("g", "s")
    val ska = Kmv.sketch(a, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("ka"))
    val skb = Kmv.sketch(b, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("kb"))
    val merged = ska.join(skb, "g")
      .select(Kmv.mergeArrays(col("ka"), col("kb"), k)).as[Seq[Long]].collect().head
    val whole = Kmv.sketch(a.union(b), col("s"), Seq("g"), k)
      .select("kmv").as[Seq[Long]].collect().head
    assert(merged === whole, "bottom-k of union of bottom-ks ≡ bottom-k of the whole")
    // idempotent: re-delivering a shard must not change the sketch
    val again = ska.join(skb, "g")
      .select(Kmv.mergeArrays(Kmv.mergeArrays(col("ka"), col("kb"), k), col("ka"), k))
      .as[Seq[Long]].collect().head
    assert(again === whole)
  }

  test("jaccard: exact in the unfilled regime, 0 on empty union") {
    // both sets smaller than k → the sketches ARE the hash sets and
    // the resemblance is the true Jaccard
    val k = 64
    val a = (1 to 20).map(i => ("g", s"x$i")).toDF("g", "s")   // x1..x20
    val b = (11 to 35).map(i => ("g", s"x$i")).toDF("g", "s")  // x11..x35
    val ska = Kmv.sketch(a, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("ka"))
    val skb = Kmv.sketch(b, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("kb"))
    val j = ska.join(skb, "g")
      .select(Kmv.jaccard(col("ka"), col("kb"), k)).as[Double].collect().head
    assert(j === 10.0 / 35.0, "|{x11..x20}| / |{x1..x35}|")
    val jEmpty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("ka", "kb")
      .select(Kmv.jaccard(col("ka"), col("kb"), k)).as[Double].collect().head
    assert(jEmpty === 0.0)
  }

  test("theta set ops: exact in the unfilled regime, sane when sampling") {
    val k = 64
    val a = (1 to 20).map(i => ("g", s"x$i")).toDF("g", "s")   // x1..x20
    val b = (11 to 35).map(i => ("g", s"x$i")).toDF("g", "s")  // x11..x35
    val ska = Kmv.sketch(a, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("ka"))
    val skb = Kmv.sketch(b, col("s"), Seq("g"), k).select(col("g"), col("kmv").as("kb"))
    val r = ska.join(skb, "g")
      .select(Kmv.theta(col("ka"), col("kb"), k).as("th"),
        Kmv.setOps(col("ka"), col("kb"), k).as("ops"))
      .select("th", "ops.n_sample", "ops.union_est", "ops.inter_est", "ops.a_only_est")
      .as[(Long, Int, Double, Double, Double)].collect().head
    assert(r._1 === 1152921504606846976L, "both unfilled → θ = 2^60")
    assert(r._2 === 35 && r._3 === 35.0, "sample IS the union")
    assert(r._4 === 10.0, "|{x11..x20}| exactly")
    assert(r._5 === 10.0, "|{x1..x10}| exactly")
    // sampling regime: k=8 over 60 distinct per side, 20 shared
    val k8 = 8
    val a2 = (1 to 60).map(i => ("g", s"y$i")).toDF("g", "s")
    val b2 = (41 to 100).map(i => ("g", s"y$i")).toDF("g", "s")
    val s2 = Kmv.sketch(a2, col("s"), Seq("g"), k8).select(col("g"), col("kmv").as("ka"))
      .join(Kmv.sketch(b2, col("s"), Seq("g"), k8).select(col("g"), col("kmv").as("kb")), "g")
      .select(Kmv.theta(col("ka"), col("kb"), k8).as("th"),
        Kmv.setOps(col("ka"), col("kb"), k8).as("ops"))
      .select("th", "ops.union_est").as[(Long, Double)].collect().head
    val kthA = (1 to 60).map(i => h60(s"y$i")).sorted.apply(k8 - 1)
    val kthB = (41 to 100).map(i => h60(s"y$i")).sorted.apply(k8 - 1)
    assert(s2._1 === math.min(kthA, kthB), "θ = smaller k-th hash")
    assert(s2._2 > 20 && s2._2 < 500, s"union est ${s2._2} wildly off 100")
  }

  test("heap fast path ≡ distinct buffer on every sketch (random cross-check)") {
    // the batch plan (dedup + BottomKHeapAggregator) and the streaming
    // buffer (KmvAggregator) must emit bit-identical sketches; drive
    // both over the same shuffled multiset, several k regimes
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(400)(rnd.nextInt(120)).map(i => ("g", s"v$i"))
    val df = xs.toDF("g", "s")
    for (k <- Seq(1, 7, 64, 200)) {
      val fast = Kmv.sketch(df, col("s"), Seq("g"), k)
        .select("kmv").as[Seq[Long]].collect().head
      val slow = df.select(col("g"), Kmv.hash60(col("s")).as("h"))
        .groupBy("g").agg(Kmv.bottomKDistinct(k)(col("h")).as("kmv"))
        .select("kmv").as[Seq[Long]].collect().head
      assert(fast === slow, s"k=$k: heap path diverged from distinct buffer")
    }
  }

  test("heap aggregator invariants: capped insert, O(1) reject, merge") {
    val agg = new graft.functions.BottomKHeapAggregator(3)
    var buf = agg.zero
    for (x <- Seq(50L, 10L, 30L, 70L, 5L)) buf = agg.reduce(buf, x)
    assert(agg.finish(buf) === Seq(5L, 10L, 30L),
      "70 rejected (full, too large), 5 evicts 50")
    var other = agg.zero
    for (x <- Seq(7L, 90L, 2L)) other = agg.reduce(other, x)
    val merged = agg.merge(buf, other)
    assert(agg.finish(merged) === Seq(2L, 5L, 7L),
      "merge folds the other heap's live slots, keeps bottom k")
  }

  test("native kmv_jaccard kernel ≡ HOF jaccard (randomized, all size regimes)") {
    // the kernel is a single merge walk over the sorted distinct
    // buffers; the HOF form is its executable spec. Drive both over
    // random sketch pairs spanning: both unfilled, one filled,
    // both filled, empty sides, disjoint and identical sets.
    val rnd = new scala.util.Random(23)
    val cases = Seq.tabulate(30) { i =>
      val na = rnd.nextInt(40); val nb = rnd.nextInt(40)
      val a = Seq.fill(na)(rnd.nextInt(80)).map(v => s"c${i}v$v").distinct.map(h60).sorted
      val b = Seq.fill(nb)(rnd.nextInt(80)).map(v => s"c${i}v$v").distinct.map(h60).sorted
      (a, b)
    } ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(5L, 6L)))
    for (k <- Seq(1, 4, 16, 64)) {
      val df = cases.toDF("a", "b")
      val got = df.select(
          graft.functions.KmvJaccard(col("a"), col("b"), k).as("kern"),
          Kmv.jaccard(col("a"), col("b"), k).as("spec"))
        .as[(Double, Double)].collect()
      got.zipWithIndex.foreach { case ((kern, spec), i) =>
        assert(kern === spec, s"k=$k case $i: kernel $kern != spec $spec")
      }
    }
  }

  test("degenerate dials: k = 1, single-element sets, identical and disjoint pairs") {
    // k = 1: the sketch is the single smallest hash; estimate of a
    // filled k=1 buffer is 0·2^60/h1 = 0 — the estimator needs k ≥ 2,
    // but the SKETCH must still be well-formed
    val one = Kmv.sketch(Seq(("g", "a"), ("g", "b")).toDF("g", "s"),
      col("s"), Seq("g"), 1).select("kmv").as[Seq[Long]].collect().head
    assert(one === Seq(math.min(h60("a"), h60("b"))))
    // single-element set, k comfortable: exact everywhere
    val single = Kmv.sketch(Seq(("g", "only")).toDF("g", "s"),
      col("s"), Seq("g"), 8)
    assert(single.select(Kmv.estimate(col("kmv"), 8)).as[Double].collect().head === 1.0)
    // identical sets: jaccard exactly 1, inter_est = union_est
    val x = (1 to 30).map(i => ("g", s"i$i")).toDF("g", "s")
    val sk = Kmv.sketch(x, col("s"), Seq("g"), 64)
      .select(col("g"), col("kmv")).localCheckpoint()
    val self = sk.select(col("g"), col("kmv").as("ka"))
      .join(sk.select(col("g"), col("kmv").as("kb")), "g")
    assert(self.select(Kmv.jaccard(col("ka"), col("kb"), 64))
      .as[Double].collect().head === 1.0)
    val ops = self.select(Kmv.setOps(col("ka"), col("kb"), 64).as("o"))
      .select("o.union_est", "o.inter_est", "o.a_only_est")
      .as[(Double, Double, Double)].collect().head
    assert(ops._1 === 30.0 && ops._2 === 30.0 && ops._3 === 0.0)
    // disjoint sets: inter 0, a_only = |A|
    val dj = Kmv.sketch((1 to 10).map(i => ("g", s"L$i")).toDF("g", "s"),
        col("s"), Seq("g"), 64).select(col("g"), col("kmv").as("ka"))
      .join(Kmv.sketch((1 to 12).map(i => ("g", s"R$i")).toDF("g", "s"),
        col("s"), Seq("g"), 64).select(col("g"), col("kmv").as("kb")), "g")
      .select(Kmv.setOps(col("ka"), col("kb"), 64).as("o"))
      .select("o.union_est", "o.inter_est", "o.a_only_est")
      .as[(Double, Double, Double)].collect().head
    assert(dj === ((22.0, 0.0, 10.0)))
  }

  test("merge is associative and commutative (randomized)") {
    val rnd = new scala.util.Random(11)
    val k = 10
    def sk(tag: String): Seq[Long] =
      Seq.fill(60)(rnd.nextInt(300)).map(i => s"$tag$i").distinct
        .map(h60).distinct.sorted.take(k)
    for (_ <- 1 to 20) {
      val (a, b, c) = (sk("a"), sk("b"), sk("c"))
      val df = Seq((a, b, c)).toDF("a", "b", "c")
      val (abc1, abc2, ba) = df.select(
          Kmv.mergeArrays(Kmv.mergeArrays(col("a"), col("b"), k), col("c"), k),
          Kmv.mergeArrays(col("a"), Kmv.mergeArrays(col("b"), col("c"), k), k),
          Kmv.mergeArrays(col("b"), col("a"), k))
        .as[(Seq[Long], Seq[Long], Seq[Long])].collect().head
      assert(abc1 === abc2, "merge must be associative")
      assert(ba === df.select(Kmv.mergeArrays(col("a"), col("b"), k))
        .as[Seq[Long]].collect().head, "merge must be commutative")
    }
  }

  test("aggregator invariants: bounded insert, full-buffer reject, distinct merge") {
    // invariants observed through finish() — the buffer layout changed
    // from a sorted List to the O(1)-reject heap (see KmvAggregator),
    // but the observable set algebra is pinned unchanged
    val agg = new KmvAggregator(3)
    var buf = agg.zero
    for (x <- Seq(50L, 10L, 30L, 10L, 70L)) buf = agg.reduce(buf, x)
    assert(agg.finish(buf) === Seq(10L, 30L, 50L),
      "dup 10 dropped, 70 rejected (full, too large)")
    buf = agg.reduce(buf, 5L)
    assert(agg.finish(buf) === Seq(5L, 10L, 30L),
      "smaller hash evicts the largest slot")
    var other = agg.zero
    for (x <- Seq(7L, 10L, 90L)) other = agg.reduce(other, x)
    val merged = agg.merge(buf, other)
    assert(agg.finish(merged) === Seq(5L, 7L, 10L),
      "merge folds distinct union, keeps bottom k")
    assert(agg.finish(agg.merge(merged, merged)) === Seq(5L, 7L, 10L),
      "self-merge is a no-op (every slot already present)")
  }

  test("joinSizeEst is exact in the unfilled regime (theta = 2^60)") {
    // 4 distinct keys << k: the sample is every key, scale is exactly 1
    val a = Seq("x", "x", "x", "y", "y", "z", "w").toDF("key")
    val b = Seq("x", "y", "y", "y", "q").toDF("key")
    val got = Kmv.joinSizeEst(a, b, "key", k = 64)
      .as[(Long, Long, Long, Long, Double)].collect().head
    // exact |A ⋈ B| = fx(3·1) + fy(2·3) = 9; w/z/q are one-sided
    assert(got._1 === 1152921504606846976L, "theta must be 2^60 unfilled")
    assert(got._2 === 5L, "all 5 distinct union keys sampled")
    assert(got._3 === 2L, "x and y on both sides")
    assert(got._4 === 9L)
    assert(got._5 === 9.0, "estimate must be exact when unfilled")
  }

  test("joinSizeEst self-join estimates sum of squared frequencies") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("key")
    val got = Kmv.joinSizeEst(df, df, "key", k = 64)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._5 === (9 + 4 + 1).toDouble)
  }

  test("joinSizeEst filled regime: k−1 sampled keys, estimate within sampling error") {
    // 400 distinct keys, frequency i%7+1 on the left, i%5+1 on the
    // right; k=64 → 63-key sample, relative SE ~ 1/8 × skew factor
    val a = spark.range(400).select(concat(lit("k"), col("id")).as("key"),
        (col("id") % 7 + 1).as("n"))
      .select(col("key"), explode(sequence(lit(1), col("n"))).as("i"))
      .select("key")
    val b = spark.range(400).select(concat(lit("k"), col("id")).as("key"),
        (col("id") % 5 + 1).as("n"))
      .select(col("key"), explode(sequence(lit(1), col("n"))).as("i"))
      .select("key")
    val exact = (0 until 400).map(i => (i % 7 + 1) * (i % 5 + 1)).sum
    val got = Kmv.joinSizeEst(a, b, "key", k = 64)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 < 1152921504606846976L, "theta must have tightened")
    assert(got._2 === 63L, "filled sample is exactly k−1 keys")
    assert(math.abs(got._5 - exact) < 0.5 * exact,
      s"estimate ${got._5} vs exact $exact outside the sanity band")
  }

  test("sketch partial-aggregates: shuffle moves ≤ k-slot buffers, not raw rows") {
    // 10k rows, 1 group, k=32 → the exchange must carry partial
    // buffers (one per input partition), not 10k hash rows. udaf over
    // an Aggregator always plans partial + final hash aggregation;
    // assert the physical plan shows both modes around one exchange.
    val big = spark.range(10000).select(lit("g").as("g"), concat(lit("v"), col("id")).as("s"))
      .repartition(8)
    val plan = Kmv.sketch(big, col("s"), Seq("g"), 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmvaggregator") ||
      plan.toLowerCase.contains("partial"), s"no partial aggregation in:\n$plan")
  }
}
