package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket item–item co-occurrence — the implicit-feedback
  * similarity backbone (co-purchased parts, co-clicked docs, co-cited
  * pages). From a (basket, item) relation, count how often each item
  * pair shares a basket and normalize to a cosine over basket-incidence
  * vectors: sim(a,b) = n_ab / sqrt(n_a·n_b), plus lift
  * n_ab·N / (n_a·n_b) for above-chance strength.
  *
  * Scale shape (100 TB): the quadratic is per-basket, so the one dial
  * that matters is `maxBasketSize` — a deterministic per-basket cap
  * (rank by item id) that bounds the self-join at K²/2 pairs per basket
  * no matter how pathological the power-baskets get (the same
  * skew-guard role as the LSH bucket caps). After the cap, the pair
  * table is at most |vocab|² rows — independent of corpus size — and
  * every step is a hash aggregation; the per-item counts are
  * vocab-sized and broadcast into the final join. The only window is
  * the per-basket rank, bounded by basket size.
  */
object Cooccur {

  /** (basket, item) pairs, deduplicated, capped at `maxBasketSize`
    * items per basket (keep the lowest item ids — deterministic, so an
    * oracle can mirror the cap exactly).
    */
  def cappedBaskets(rel: DataFrame, basketCol: String, itemCol: String,
                    maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2,
      s"maxBasketSize must be at least 2 to form pairs, got $maxBasketSize")
    val b = rel.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .where(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    b.withColumn("rk",
        row_number().over(Window.partitionBy("basket").orderBy("item")))
      .where(col("rk") <= maxBasketSize)
      .drop("rk")
  }

  /** Unordered co-occurrence pair counts over an already-capped
    * (basket, item) table: (item_a, item_b, n_ab) with item_a < item_b
    * and n_ab ≥ `minCount` — the shared pair backbone of the cosine
    * table, the association rules, and the co-purchase GRAPH (the q204
    * link-prediction edge list).
    */
  def pairCounts(capped: DataFrame, minCount: Long): DataFrame =
    capped.as("a")
      .join(capped.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)

  /** Item–item cosine/lift table: (item_a, item_b, n_ab, n_a, n_b,
    * cosine, lift) for unordered pairs item_a < item_b with
    * n_ab ≥ `minCount`. Both ratios are exact single IEEE ops over
    * integer counts (long product → sqrt → divide), so they are
    * bit-identical in any engine.
    */
  def itemCosine(rel: DataFrame, basketCol: String, itemCol: String,
                 maxBasketSize: Int = 64, minCount: Long = 2L): DataFrame = {
    // 4 consumers (item counts, basket total, both self-join sides):
    // materialize the capped table ONCE or each branch re-runs the
    // distinct + per-basket rank window — 4 corpus passes instead of 1
    val capped = cappedBaskets(rel, basketCol, itemCol, maxBasketSize)
      .localCheckpoint()
    val itemN = capped.groupBy("item").agg(count(lit(1)).as("n_item"))
    val nBaskets = capped.agg(countDistinct(col("basket")).as("n_baskets"))
    val pairs = pairCounts(capped, minCount)
    pairs
      .join(broadcast(itemN.as("na")), col("item_a") === col("na.item"))
      .join(broadcast(itemN.as("nb")), col("item_b") === col("nb.item"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("na.n_item").as("n_a"), col("nb.n_item").as("n_b"),
        (col("n_ab") / sqrt((col("na.n_item") * col("nb.n_item")).cast("double")))
          .as("cosine"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("na.n_item") * col("nb.n_item")).cast("double")).as("lift"))
  }

  /** Directional association rules X→Y from the pair table: both
    * orientations of every unordered pair, kept when confidence
    * n_xy/n_x clears `confNum/confDen` (tested as the integer
    * cross-product n_xy·confDen ≥ confNum·n_x — no float boundary)
    * and support n_xy ≥ `minCount`. Emits (antecedent, consequent,
    * n_xy, n_x, confidence, lift): the "customers who took X also
    * took Y" serving table — confidence is DIRECTIONAL (popcorn→salt
    * can hold while salt→popcorn does not), which is what the
    * symmetric cosine cannot express.
    */
  def associationRules(rel: DataFrame, basketCol: String, itemCol: String,
                       maxBasketSize: Int = 64, minCount: Long = 2L,
                       confNum: Int = 1, confDen: Int = 4): DataFrame = {
    require(confDen > 0 && confNum >= 0 && confNum <= confDen,
      s"confidence threshold must be a fraction in [0,1], got $confNum/$confDen")
    val pairs = itemCosine(rel, basketCol, itemCol, maxBasketSize, minCount)
    val both = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_ab"),
        col("n_a").as("n_x"), col("n_b").as("n_y"), col("lift"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_ab"),
        col("n_b").as("n_x"), col("n_a").as("n_y"), col("lift")))
    both
      .where(col("n_ab") * confDen >= lit(confNum) * col("n_x"))
      .select(col("antecedent"), col("consequent"), col("n_ab"), col("n_x"),
        (col("n_ab") / col("n_x")).as("confidence"), col("lift"))
  }
}
