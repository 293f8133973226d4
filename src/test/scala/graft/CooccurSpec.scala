package graft

import graft.operators.Cooccur

/** Hand-checkable fixtures for the item–item co-occurrence operator. */
class CooccurSpec extends SparkTestBase {
  import spark.implicits._

  test("pair counts, cosine and lift over a hand-checked basket set") {
    // baskets: 10 → {1,2,3}, 20 → {1,2}, 30 → {1,3}, 40 → {2}
    // n_1 = 3, n_2 = 3, n_3 = 2; N = 4 baskets
    // n_12 = 2, n_13 = 2, n_23 = 1 (dropped by minCount = 2)
    val rel = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L),
      (40L, 2L)).toDF("basket", "item")
    val got = Cooccur.itemCosine(rel, "basket", "item",
        maxBasketSize = 8, minCount = 2L)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 3L, 3L, 2.0 / math.sqrt(9.0), 2.0 * 4 / 9.0),
      (1L, 3L, 2L, 3L, 2L, 2.0 / math.sqrt(6.0), 2.0 * 4 / 6.0)))
  }

  test("duplicate (basket, item) rows count once") {
    val rel = Seq((1L, 5L), (1L, 5L), (1L, 7L), (2L, 5L), (2L, 7L))
      .toDF("basket", "item")
    val got = Cooccur.itemCosine(rel, "basket", "item",
        maxBasketSize = 8, minCount = 2L).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (5L, 7L, 2L))
    assert(r.getDouble(5) === 1.0) // n_ab / sqrt(2*2) = 2/2
  }

  test("basket cap keeps the lowest item ids and bounds the pair fan-out") {
    // basket 1 has 5 items; cap 3 keeps {1,2,3} — pairs only among those
    val rel = (1L to 5L).map((1L, _)) ++ (2L to 2L).flatMap(b => Seq((b, 1L), (b, 2L), (b, 3L)))
    val df = rel.toDF("basket", "item")
    val capped = Cooccur.cappedBaskets(df, "basket", "item", maxBasketSize = 3)
    assert(capped.where($"basket" === 1L).collect().map(_.getLong(1)).sorted.toSeq
      === Seq(1L, 2L, 3L))
    val pairs = Cooccur.itemCosine(df, "basket", "item",
      maxBasketSize = 3, minCount = 1L)
    // items 4 and 5 never pair: the cap removed them from basket 1
    assert(pairs.where($"item_b" >= 4L || $"item_a" >= 4L).count() === 0L)
  }

  test("association rules are directional: confidence filters each orientation separately") {
    // item 1 in 4 baskets, item 2 in 2; together twice:
    // conf(2→1) = 2/2 = 1.0 passes 1/2; conf(1→2) = 2/4 = 0.5 passes too;
    // at threshold 3/4 only 2→1 survives
    val rel = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (1L, 2L), (2L, 2L)).toDF("basket", "item")
    val loose = Cooccur.associationRules(rel, "basket", "item",
        maxBasketSize = 8, minCount = 2L, confNum = 1, confDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(loose === Set((1L, 2L, 0.5), (2L, 1L, 1.0)))
    val tight = Cooccur.associationRules(rel, "basket", "item",
        maxBasketSize = 8, minCount = 2L, confNum = 3, confDen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === Set((2L, 1L)), "only the high-confidence direction survives")
  }

  test("cap below 2 is refused — it could not form a single pair") {
    val df = Seq((1L, 1L)).toDF("basket", "item")
    intercept[IllegalArgumentException] {
      Cooccur.cappedBaskets(df, "basket", "item", maxBasketSize = 1)
    }
  }
}
