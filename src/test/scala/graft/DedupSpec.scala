package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("big", "data", "spark", "engine")),
    (2L, Seq("big", "data", "spark", "engine")),     // exact dup of 1
    (3L, Seq("engine", "spark", "data", "big")),     // same bag, different order
    (4L, Seq("totally", "different", "words", "here")),
    (5L, Seq("big", "data", "flink", "engine"))      // near dup of 1
  ).toDF("doc_id", "tokens")

  test("bag-of-words fingerprint groups order-insensitive duplicates") {
    val groups = Dedup.bowFingerprintDups(docs, "doc_id", "tokens").collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[Long]("cnt") === 3)   // docs 1, 2, 3
    assert(groups(0).getAs[Long]("min_id") === 1L)
  }

  test("minhash is identical for identical token sets, order-independent") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "tokens", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) === sigs(3L))
    assert(sigs(1L) !== sigs(4L))
  }

  test("containment is asymmetric: quoted-subset doc scores 1.0 toward its host") {
    val d = Seq(
      (1L, Seq("big", "data", "spark")),                       // ⊂ doc 2's bigrams
      (2L, Seq("big", "data", "spark", "engine", "rules"))
    ).toDF("doc_id", "tokens")
    val pairs = Dedup.shingleContainmentPairs(d, "doc_id", "tokens", num = 0, den = 1)
      .as[(Long, Long, Double)].collect().sorted
    // C(1→2) = 2/2 = 1.0 (doc 1 wholly contained); C(2→1) = 2/4 = 0.5;
    // symmetric Jaccard would report 0.5 for both directions
    assert(pairs === Seq((1L, 2L, 1.0), (2L, 1L, 0.5)))
    // the integer cross-product threshold filters the weak direction
    val kept = Dedup.shingleContainmentPairs(d, "doc_id", "tokens", num = 3, den = 4)
      .as[(Long, Long, Double)].collect()
    assert(kept.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("token-less docs produce no band rows: empty docs never become mutual candidates") {
    // two docs with EMPTY token arrays: their minhashes are NULL, so the
    // banded chunk must be NULL (never "") and neither may pair with
    // anything — matching a SQL engine's NULL-propagating mh0||'|'||mh1
    val d = Seq(
      (1L, Seq("big", "data", "spark", "engine")),
      (2L, Seq("big", "data", "spark", "engine")),
      (3L, Seq.empty[String]),
      (4L, Seq.empty[String])
    ).toDF("doc_id", "tokens")
    val cand = Dedup.lshBandedCandidatePairs(d, "doc_id", "tokens",
        nBands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === Set((1L, 2L)),
      "only the real dup pair; empty docs must not bucket together")
  }

  test("incremental candidates pair fresh docs with corpus docs only") {
    val corpus = docs.where(col("doc_id") <= 3)          // 1,2,3 mutual dups
    val fresh = Seq(
      (10L, Seq("big", "data", "spark", "engine")),      // dup of corpus 1/2/3
      (11L, Seq("big", "data", "spark", "engine")),      // dup of 10 AND corpus
      (12L, Seq("nothing", "in", "common", "at", "all"))
    ).toDF("doc_id", "tokens")
    val cand = Dedup.incrementalNearDupCandidates(corpus, fresh,
        "doc_id", "tokens", nBands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair is (fresh, corpus) — never corpus×corpus (1,2,3 are
    // mutual dups but must not re-pair) and never fresh×fresh (10~11)
    assert(cand.forall { case (n, c) => n >= 10L && c <= 3L })
    assert(Set(10L, 11L).subsetOf(cand.map(_._1)), "fresh dups must be caught")
    assert(!cand.map(_._1).contains(12L), "unrelated fresh doc has no candidates")
    // the cap counts both sides: cap 1 leaves no bucket joinable
    val capped = Dedup.incrementalNearDupCandidates(corpus, fresh,
      "doc_id", "tokens", 4, 2, maxBucketSize = 1)
    assert(capped.isEmpty)
  }

  test("word n-gram shingles: ordered windows, distinct, safe below n tokens") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),                       // shorter than n=3 → empty
      (3L, Seq("x", "y", "x", "y", "x", "y"))    // repeats dedup
    ).toDF("doc_id", "tokens")
    val sh = df.select(col("doc_id"), Dedup.wordShingles(col("tokens"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) === Seq("a b c", "b c d"))
    assert(sh(2L) === Seq.empty)
    assert(sh(3L) === Seq("x y x", "y x y"))
  }

  test("native shingle kernel matches the higher-order spec bit-for-bit") {
    val fixture = (Seq(
      (100L, Seq.empty[String]),
      (101L, Seq("one", "two")),
      (102L, Seq.tabulate(200)(i => s"w${i % 17}"))   // heavy repeats
    ) ++ Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(60)(j => s"t${(i * 31 + j * 7) % 23}"))))
      .toDF("doc_id", "tokens")
    for (n <- Seq(1, 2, 3, 5)) {
      val kernel = fixture.select(col("doc_id"), Dedup.wordShingles(col("tokens"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = fixture.select(col("doc_id"), Dedup.wordShinglesHof(col("tokens"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(kernel === hof, s"divergence at n=$n")
    }
  }

  test("native minhash kernel matches the higher-order spec bit-for-bit") {
    val fixture = docs.union(Seq(
      (100L, Seq.empty[String]),                       // no tokens → NULL sigs
      (101L, Seq("solo")),
      (102L, Seq.tabulate(300)(i => s"tok$i"))
    ).toDF("doc_id", "tokens"))
    val kernel = Dedup.minhashSignatures(fixture, "doc_id", "tokens", 6)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getString)).toMap
    val hof = fixture.select(col("doc_id") +:
        (0 until 6).map(i => Dedup.minhash(col("tokens"), i).as(s"mh$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getString)).toMap
    assert(kernel === hof)
    assert(kernel(100L).forall(_ == null), "empty docs must yield NULL minhashes")
  }

  test("LSH candidates include exact dups, exclude disjoint docs") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "tokens", 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("bigram Jaccard: identical docs = 1.0, near-dup in (0,1)") {
    val j = Dedup.bigramJaccardPairs(docs, "doc_id", "tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    // docs 1 and 5 share "big data" out of 3+3 bigrams → J = 1/5
    assert(j((1L, 5L)) === 0.2)
  }

  test("bigram shingles of a 1-token doc are empty, not an error") {
    val one = Seq((9L, Seq("solo"))).toDF("doc_id", "tokens")
    val sh = one.select(Dedup.bigramShingles(col("tokens")).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(sh.isEmpty)
  }

  test("prefix-filtered Jaccard equals the naive all-pairs answer at every threshold") {
    // random corpus with a boilerplate tail every doc shares — the hot
    // shingle lands at the END of every df-ordered prefix and must not
    // break exactness (it is the case the filter exists to survive)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val local = (1L to 30L).map { i =>
      val n = 3 + rnd.nextInt(8)
      i -> ((0 until n).map(_ => vocab(rnd.nextInt(vocab.size))) ++
        Seq("hot", "boilerplate", "hot"))
    }
    val d = local.toDF("doc_id", "tokens")
    def shingleSet(t: Seq[String]): Set[String] =
      t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    val sets = local.map { case (id, toks) => id -> shingleSet(toks) }
    for ((num, den) <- Seq((1, 10), (1, 4), (1, 2), (7, 10), (1, 1))) {
      val fast = Dedup.prefixJaccardPairs(d, "doc_id", "tokens", num, den)
        .as[(Long, Long, Double)].collect().toSet
      val naive = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        un = sa.size + sb.size - inter
        if un > 0 && inter * den >= num * un
      } yield (a, b, inter.toDouble / un)).toSet
      assert(fast === naive, s"threshold $num/$den")
    }
  }

  test("prefix-filtered Jaccard: sub-bigram docs drop out silently") {
    val d = Seq(
      (1L, Seq("big", "data", "spark")),
      (2L, Seq("big", "data", "spark")),
      (7L, Seq("solo")),
      (8L, Seq[String]())
    ).toDF("doc_id", "tokens")
    val rows = Dedup.prefixJaccardPairs(d, "doc_id", "tokens", 1, 2)
      .as[(Long, Long, Double)].collect()
    assert(rows.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("verifyJaccard scores only the given pairs; empty-vs-empty is NULL not an error") {
    val d = Seq(
      (1L, Seq("big", "data", "spark", "engine")),
      (2L, Seq("big", "data", "spark", "engine")),
      (5L, Seq("big", "data", "flink", "engine")),
      (7L, Seq("solo")),                    // no bigrams
      (8L, Seq("alone"))                    // no bigrams
    ).toDF("doc_id", "tokens")
    val pairs = Seq((1L, 2L), (1L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val rows = Dedup.verifyJaccard(d, "doc_id", "tokens", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(rows.size === 3, "one row per input pair, nothing else")
    assert(rows((1L, 2L)) === Some(1.0))
    assert(rows((1L, 5L)) === Some(0.2))
    assert(rows((7L, 8L)) === None, "0/0 must be NULL, not a DIVIDE_BY_ZERO")
  }

  test("nearDupClusters: components labeled by min id, singletons keep themselves") {
    val ids = (1L to 7L).toDF("doc_id")
    // components: {1,2,3} via chain 1-2, 2-3; {5,6} ; singletons 4, 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.nearDupClusters(ids, "doc_id", pairs, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out === Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      4L -> (4L, true), 5L -> (5L, true), 6L -> (5L, false), 7L -> (7L, true)))
  }

  test("nearDupClustersConverged stops early and fully labels long chains") {
    // chain 1-...-6 has diameter 5: bounded-3 plain hash-min leaves it
    // partial; the converged variant's pointer doubling covers distances
    // 2, 6 — stable after 2 spreading rounds + 1 confirming
    val ids = (1L to 6L).toDF("doc_id")
    val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (out, iters) = Dedup.nearDupClustersConverged(ids, "doc_id", pairs)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to 6L).map(_ -> 1L).toMap)
    assert(iters === 3, s"expected 2 spreading rounds + 1 confirming, got $iters")
    // no-edge corpus converges in one confirming iteration
    val (solo, soloIters) = Dedup.nearDupClustersConverged(
      ids, "doc_id", Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(solo.collect().forall(r => r.getLong(0) === r.getLong(1) && r.getBoolean(2)))
    assert(soloIters === 1)
  }

  test("pointer doubling clusters a 50-hop path in O(log D) rounds") {
    // the silent-undercluster hazard: a chained component (A~B~C~… under
    // threshold transitivity) whose diameter exceeds any fixed round
    // budget. 51 nodes, 50 hops — per-round coverage doubles (2, 6, 14,
    // 30, 62), so the whole chain labels in 5 rounds + 1 confirming,
    // where plain hash-min would need 50.
    val ids = (1L to 51L).toDF("doc_id")
    val pairs = (1L to 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (out, iters) = Dedup.nearDupClustersConverged(ids, "doc_id", pairs)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.forall(_._2 == 1L), "every chain member must reach the component min")
    assert(rows.count(_._3) === 1, "exactly one canonical survivor")
    assert(iters <= 6, s"O(log D) contract: 50 hops within 6 rounds, got $iters")
    // id order along the chain must not matter: reverse the id layout
    // (worst case for min-chasing direction)
    val rev = (1L to 50L).map(i => (52 - i, 52 - i - 1)).toDF("id_a", "id_b")
    val (out2, iters2) = Dedup.nearDupClustersConverged(ids, "doc_id", rev)
    assert(out2.collect().forall(_.getLong(1) == 1L))
    assert(iters2 <= 7, s"reversed layout must converge in O(log D) too, got $iters2")
  }

  test("nearDupClusters: one iteration spreads the min label exactly one hop") {
    // chain 1-2-3-4: after 1 iteration doc 3 sees min(3, labels of {2,4})
    // = 2, not yet 1 — the documented bounded-iteration contract
    val ids = (1L to 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val one = Dedup.nearDupClusters(ids, "doc_id", pairs, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    val three = Dedup.nearDupClusters(ids, "doc_id", pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("mergeSpans: touching and overlapping n-gram windows fuse, gaps split") {
    // n=3: hit at pos p covers tokens [p, p+2]. pos 0 and 3 touch
    // (0..2, 3..5 → gap 0 with the ≤ n rule they merge only if
    // pos ≤ prevMax + n): 3 ≤ 0+3 → same span; pos 7 > 3+3 → new span.
    val hits = Seq((1L, 0), (1L, 3), (1L, 7), (2L, 5)).toDF("doc_id", "pos")
    val got = Dedup.mergeSpans(hits, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === Set((1L, 0, 5, 2L), (1L, 7, 9, 1L), (2L, 5, 7, 1L)))
  }
}
