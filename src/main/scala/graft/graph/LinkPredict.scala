package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link prediction by common-neighbor counting, with a hash-held-out
  * evaluation harness — the standard "does this graph's structure
  * predict its own missing edges?" audit (Liben-Nowell & Kleinberg,
  * CIKM'03) that a pipeline runs before trusting a co-occurrence graph
  * (q180) to drive recommendations or negative sampling.
  *
  * Everything is integer-exact: the train/test split is the portable
  * md5-bucket draw (the q97 leakage-safe-split discipline — no RNG
  * state, both engines replay it bit-for-bit), the score is a common-
  * neighbor COUNT, and the AUC is the Mann–Whitney rank-sum over the
  * grouped (score, label) table (text.Metrics.binaryAuc — tie halves
  * carried as integer 2U, one exact division at the end).
  *
  * Scale shape (100 TB): the score join is the triangle shape — two
  * copies of the symmetrized train adjacency equi-joined on the shared
  * neighbor. Its blowup is Σ deg(n)² over the SHARED-neighbor side, so
  * the one dial that matters is `maxDegree`: a deterministic cap on
  * incident nodes per shared neighbor (rank by node id —
  * oracle-mirrorable) that bounds the join at maxDegree² pairs per
  * neighbor no matter how pathological the hubs get (the Cooccur
  * basket-cap / LSH bucket-cap role). After the cap the candidate
  * table is edge-domain bounded; the AUC machinery then runs on the
  * distinct-SCORE table, which is smaller still.
  */
object LinkPredict {

  /** Portable hash split of an unordered edge list (aCol < bCol):
    * (train, test), where an edge lands in test iff its first md5 hex
    * digit of "salt:a:b" falls in bucket 0 of `mod` (1/mod of edges).
    * `mod` must divide the 16-value digit domain — i.e. be one of
    * {2, 4, 8, 16} — or the "1/mod" fraction would silently be wrong
    * (mod = 3 puts 6 of 16 digit values in test: 37.5%, not 1/3).
    */
  def split(edges: DataFrame, aCol: String, bCol: String,
            salt: String = "lp", mod: Int = 4): (DataFrame, DataFrame) = {
    require(Set(2, 4, 8, 16).contains(mod),
      s"mod must divide the hex-digit domain (one of 2/4/8/16), got $mod")
    val bucket = expr(
      s"conv(substring(md5(concat('$salt:', $aCol, ':', $bCol)), 1, 1), 16, 10) % $mod")
    (edges.where(bucket =!= 0), edges.where(bucket === 0))
  }

  /** Common-neighbor scores over the train graph for all NON-train
    * pairs with ≥1 shared neighbor: (a, b, cn) with a < b. The cap is
    * on the SHARED-NEIGHBOR side: within each neighbor n, only the
    * `maxDegree` lowest-id incident nodes survive — that is the side
    * whose fan-out the self-join squares (capping a node's own
    * out-list would leave a popular hub listed by unboundedly many
    * low-degree nodes and bound nothing).
    */
  def commonNeighbors(train: DataFrame, aCol: String, bCol: String,
                      maxDegree: Int = 64): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be at least 2, got $maxDegree")
    // 2 self-join sides + the anti-join read train: materialize once
    val tr = train.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint()
    // both self-join sides read the capped adjacency: materialize it or
    // the cap window (a shuffle + sort) runs twice
    val sym = tr.select(col("a").as("u"), col("b").as("n"))
      .union(tr.select(col("b").as("u"), col("a").as("n")))
      .withColumn("rk",
        row_number().over(Window.partitionBy("n").orderBy("u")))
      .where(col("rk") <= maxDegree)
      .drop("rk")
      .localCheckpoint()
    sym.as("x")
      .join(sym.as("y"), col("x.n") === col("y.n") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("a"), col("y.u").as("b"))
      .agg(count(lit(1)).as("cn"))
      .join(tr, Seq("a", "b"), "left_anti")
  }

  /** One-row evaluation report: split `edges`, score candidates against
    * the train graph, label them by test membership, and emit
    * (n_test, n_pos, n_neg, u2, auc, cn_recall) — n_pos is the test
    * edges the candidate generator actually reached (scored), so
    * cn_recall = n_pos/n_test is the generator's coverage and auc is
    * ranking quality over what it reached. Both caveats on one row is
    * the honest readout: a sky-high AUC over 4% of test edges is not a
    * good link predictor.
    */
  def evalReport(edges: DataFrame, aCol: String, bCol: String,
                 salt: String = "lp", mod: Int = 4,
                 maxDegree: Int = 64): DataFrame = {
    // 4 downstream consumers (train side, test label join, test count,
    // anti-join) would each re-run the upstream edge build otherwise
    val (tr, te) = split(edges.localCheckpoint(), aCol, bCol, salt, mod)
    val teK = te.select(col(aCol).as("a"), col(bCol).as("b"), lit(1).as("pos"))
    val scored = commonNeighbors(tr, aCol, bCol, maxDegree)
      .join(teK, Seq("a", "b"), "left_outer")
      .select(col("cn"), coalesce(col("pos"), lit(0)).as("pos"))
    val auc = graft.text.Metrics.binaryAuc(scored, "cn", "pos")
    val nt = te.agg(count(lit(1)).as("n_test"))
    auc.crossJoin(nt)
      .select(col("n_test"), col("n_pos"), col("n_neg"), col("u2"), col("auc"),
        when(col("n_test") === 0, lit(null).cast("double"))
          .otherwise(col("n_pos") / col("n_test")).as("cn_recall"))
  }
}
