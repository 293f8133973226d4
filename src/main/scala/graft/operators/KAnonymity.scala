package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit over quasi-identifier (QI) columns — the
  * governance gate a training corpus passes before release: every row
  * must be indistinguishable from at least k−1 others on the QI
  * projection, else the "anonymized" records re-identify by join.
  *
  * [[ladder]] evaluates a GENERALIZATION LADDER in one corpus scan: a
  * ROLLUP over the QI columns yields the equivalence classes of every
  * suffix-truncated QI set at once (level 0 = all QIs, each next level
  * drops the rightmost remaining QI), and a second bounded aggregation
  * reduces each level to its audit row — minimum class size (the k
  * actually achieved), class count, rows in classes below the target
  * k, and the at-risk fraction. The coarsest level that clears k tells
  * you how much generalization anonymity costs.
  *
  * Scale shape (100 TB): one corpus scan + one ROLLUP hash aggregation
  * (partial-aggregated before the exchange); the class table is
  * bounded by the QI vocabulary product and the per-level reduction
  * runs over that bounded table. Row totals come from summing class
  * sizes per level (each level partitions all rows) — no second scan,
  * no windows, no joins.
  */
object KAnonymity {

  /** Per-level audit rows: (lvl, n_classes, k_min, rows_below_k,
    * risk_pct, anonymous). `lvl` = number of QI columns dropped from
    * the right (the rollup's grand-total row — all QIs dropped — is
    * excluded: a single all-rows class audits nothing). `risk_pct` =
    * rows_below_k / n_rows, one exact IEEE division over exact integer
    * counts. QI values must be non-null — rollup marks truncated
    * columns with NULL, so a null QI value would alias a coarser
    * level's class (enforced here, not assumed).
    */
  def ladder(rel: DataFrame, qis: Seq[Column], k: Long): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2, got $k")
    val names = qis.indices.map(i => s"qi$i")
    val named = qis.zip(names).map { case (c, n) => c.as(n) }
    val base = rel.select(named: _*)
      .where(names.map(col(_).isNotNull).reduce(_ && _))
    // rollup grouping_id for a suffix ladder is always 2^j − 1 where
    // j = number of dropped trailing QIs; decode it to j
    val gidToLvl = names.indices.tail.foldLeft(when(grouping_id() === 0, 0)) {
      case (c, j) => c.when(grouping_id() === ((1 << j) - 1), j)
    }
    val classes = base.rollup(names.map(col): _*)
      .agg(count(lit(1)).as("cls_n"), gidToLvl.as("lvl"))
      .where(col("lvl").isNotNull)
    classes.groupBy("lvl")
      .agg(count(lit(1)).as("n_classes"),
        min(col("cls_n")).as("k_min"),
        sum(when(col("cls_n") < k, col("cls_n")).otherwise(lit(0L)))
          .as("rows_below_k"),
        sum(col("cls_n")).as("n_rows"))
      .select(col("lvl"), col("n_classes"), col("k_min"),
        col("rows_below_k"),
        (col("rows_below_k").cast("double") / col("n_rows").cast("double"))
          .as("risk_pct"),
        (col("k_min") >= k).as("anonymous"))
  }

  /** l-diversity audit — k-anonymity's complement: a class of k
    * identical-QI rows still leaks if they all share ONE sensitive
    * value (the homogeneity attack k-anonymity cannot see). Per QI
    * equivalence class this reports both gates: distinct l-diversity
    * (≥ l distinct sensitive values) and entropy l-diversity
    * (−Σ p·ln p ≥ ln l, i.e. exp(entropy) ≥ l — stricter: a class
    * that is 99% one value fails even with many token distincts).
    *
    * Float discipline: entropy is rewritten as
    * ln(n) − (Σ c·ln c)/n, so the only aggregate is Σ of the exact
    * MICRO-scaled longs round(c·ln(c)·1e6) — order-free integer
    * addition; ln/exp then run once per class on identical exact
    * inputs in both engines. The micro scaling caps per-value counts
    * at ~2.3e11 (c·ln(c)·1e6 must stay under 2^63) — beyond any
    * single (QI class, sensitive value) cell this module targets.
    *
    * Scale shape (100 TB): one corpus scan → one (QI, sensitive)
    * hash agg (partial-aggregated) → one reduction over the bounded
    * (QI × sensitive-vocabulary) counter table. No windows, no joins.
    * Returns one row per class: (qi…, cls_n, l_distinct, entropy_l,
    * distinct_ok, entropy_ok), entropy_l rounded 6.
    */
  def lDiversity(rel: DataFrame, qis: Seq[Column], sensitive: Column,
                 l: Int): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be at least 2, got $l")
    val names = qis.indices.map(i => s"qi$i")
    val named = qis.zip(names).map { case (c, n) => c.as(n) }
    val base = rel.select(named :+ sensitive.as("sv"): _*)
      .where((names :+ "sv").map(col(_).isNotNull).reduce(_ && _))
    val vc = base.groupBy((names :+ "sv").map(col): _*)
      .agg(count(lit(1)).as("c"))
    val entropy = log(col("cls_n"))
      .minus((col("st").cast("double") / lit(1000000.0)) / col("cls_n"))
    vc.groupBy(names.map(col): _*)
      .agg(sum(col("c")).as("cls_n"),
        count(lit(1)).as("l_distinct"),
        sum(round(col("c") * log(col("c")) * lit(1000000.0)).cast("long"))
          .as("st"))
      .select(names.map(col) ++ Seq(
        col("cls_n"), col("l_distinct"),
        round(exp(entropy), 6).as("entropy_l"),
        (col("l_distinct") >= l).as("distinct_ok"),
        // gate on a ROUNDED value: a class of l equal-count sensitive
        // values has entropy EXACTLY ln(l), so an unrounded exp ≥ l
        // comparison sits on an engine-ulp boundary by construction.
        // The rounding must be COARSER than the micro-scale
        // quantization error: Σ round(c·ln c·1e6) is off by up to 0.5
        // per sensitive value, i.e. up to ~l·0.5e-6 in exp(entropy) —
        // the same order as 6-decimal rounding, which could still push
        // an exactly-ln(l) class to l − 1e-6. Five decimals leaves an
        // order of magnitude of headroom for any practical l.
        (round(exp(entropy), 5) >= l.toDouble).as("entropy_ok")): _*)
  }
}
