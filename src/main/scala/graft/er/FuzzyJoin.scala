package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance lookup — the fuzzy half of entity resolution
  * (the reference resolves products by token-set cosine; this is the
  * complementary string-level matcher for short keys: names, titles,
  * codes). A probe batch is matched against a catalog under a blocking
  * key; candidates within a length band get an exact Levenshtein
  * distance, and each probe keeps its best match (min (dist, id) — a
  * mergeable aggregate, never a window).
  *
  * Scale shape (100 TB catalog): the probe batch is the small side and
  * is broadcast — the catalog is never shuffled. The blocking key
  * prunes the cross product to block-mates; the |len(a)−len(b)| ≤
  * maxDist band is a correct Levenshtein lower bound that cuts
  * candidates before the O(len²) distance; and `maxBlockSize` skips
  * pathological blocks outright (the same skew-cap discipline as the
  * LSH bucket caps — a boilerplate blocking key would otherwise make
  * one block quadratic).
  *
  * Distances are byte-exact only over ASCII: Spark's `levenshtein`
  * counts characters while DuckDB's counts UTF-8 bytes, so multibyte
  * text disagrees between engines (café→cafe is 1 vs 2). Fine for
  * key-like columns; document text should route through the token
  * pipelines instead.
  */
object FuzzyJoin {

  /** Best fuzzy match per probe: (probe id, probe string, n_band,
    * best_id, best_str, best_dist) — one row per probe, nulls when no
    * block-mate lies within the band/distance. `n_band` counts the
    * candidates that reached the distance computation (the
    * blocking-efficiency diagnostic); `best_dist` ≤ `maxDist` with
    * ties broken by catalog id.
    */
  def bestMatch(probes: DataFrame, catalog: DataFrame,
                idCol: String, strCol: String, blockFn: Column => Column,
                maxDist: Int, maxBlockSize: Long = 4096L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(maxBlockSize >= 1, s"maxBlockSize must be positive, got $maxBlockSize")
    def prep(df: DataFrame) = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("s").isNotNull)
      .withColumn("blk", blockFn(col("s")))
      .withColumn("ln", length(col("s")))
    val p = prep(probes)
    val c = prep(catalog)
    // block-size skew cap on the catalog side; the size table has one
    // row per blocking-key value — broadcastable next to the catalog
    val okBlocks = c.groupBy("blk").agg(count(lit(1)).as("blk_n"))
      .where(col("blk_n") <= maxBlockSize)
      .select("blk")
    val cat = c.join(broadcast(okBlocks), "blk")
    val scored = broadcast(p.as("a"))
      .join(cat.as("b"),
        col("a.blk") === col("b.blk") &&
          abs(col("a.ln") - col("b.ln")) <= maxDist)
      .select(col("a.id").as("qid"), col("a.s").as("qs"),
        col("b.id").as("cid"), col("b.s").as("cs"),
        // THRESHOLDED levenshtein: banded O(maxDist·len) instead of the
        // full O(len²) matrix, -1 when the band is exceeded — the right
        // kernel when only matches within maxDist matter
        levenshtein(col("a.s"), col("b.s"), maxDist).as("d"))
    val agg = scored.groupBy("qid")
      .agg(count(lit(1)).as("n_band"),
        min(when(col("d").between(0, maxDist),
          struct(col("d"), col("cid"), col("cs")))).as("best"))
    p.select(col("id").as("probe_id"), col("s").as("probe_str"))
      .join(agg, col("probe_id") === col("qid"), "left")
      .select(col("probe_id"), col("probe_str"),
        coalesce(col("n_band"), lit(0L)).as("n_band"),
        col("best.cid").as("best_id"), col("best.cs").as("best_str"),
        col("best.d").as("best_dist"))
  }
}
