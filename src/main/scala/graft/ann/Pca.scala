package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal component analysis by covariance accumulation + power
  * iteration — the embedding-space diagnostic that tells a pipeline
  * where its vectors actually live: the leading eigenvalue/trace ratio
  * is the classic anisotropy readout (a collapsed embedding model puts
  * most variance on one axis and ANN recall suffers), and the leading
  * component itself drives mean-centering/whitening decisions upstream
  * of IVF/PQ training.
  *
  * Scale shape (100 TB): the corpus is touched exactly twice, both
  * times by map-side partial-aggregating hash sums onto DIMENSION-
  * bounded tables (d² second moments, d first moments); everything
  * after — the covariance assembly and every power-iteration step —
  * is algebra over the d²-row matrix table, corpus-free. This is the
  * moment-sketch shape (q178's OLS discipline lifted to matrices): the
  * heavy pass is mergeable and shard-parallel, the iteration rides on
  * the sketch.
  *
  * Determinism/parity: per-vector cross terms x_i·x_j are exact double
  * products of floats, immediately scaled to integer PICOS
  * (round-to-integer of a double is cross-engine safe — the q166
  * discipline), so both moment tables are exact order-free integer
  * sums. Covariance entries assemble from those longs by a fixed
  * expression tree; every matrix-vector product folds its d terms in
  * INDEX order (sort_array + ordered aggregate ≡ DuckDB's
  * list(... ORDER BY) + list_sum — the q184 fold discipline), never in
  * group-aggregation order. With the all-ones start every iterate is
  * bit-identical in any engine.
  */
object Pca {

  // 1e12 pico-scaling keeps 12 fractional digits per term; the sums
  // accumulate as DECIMAL(38,0) (not long — a long second-moment sum
  // wraps silently past ~9e6 unit-magnitude rows, 2^63/1e12, nowhere
  // near this module's advertised scale), exact to ~1e38 ≈ 1e26 rows.
  // DuckDB mirrors for free: its SUM(BIGINT) already returns HUGEINT.
  private val Scale = 1000000000000.0

  /** Covariance matrix of the first `d` dims as a (i, j, n, c) table,
    * i, j ∈ [0, d): c = E[x_i x_j] − E[x_i]E[x_j] (population). Two
    * corpus passes, both partial-aggregating; output is d² rows.
    */
  def covariance(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    require(d >= 1, s"d must be positive, got $d")
    val v = emb.select(expr(s"slice($vecCol, 1, $d)").as("v"))
      .where(size(col("v")) === d)
    val second = v.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
              transform(sequence(0, ${d - 1}), j ->
                named_struct('i', i, 'j', j,
                  't', cast(round(cast(v[i] as double) * cast(v[j] as double) * cast(${Scale.toLong} as double)) as decimal(28,0))))))"""))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum("e.t").as("sij"), count(lit(1)).as("n"))
    val first = v.select(explode(expr(
        s"""transform(sequence(0, ${d - 1}), i ->
              named_struct('i', i, 's', cast(round(cast(v[i] as double) * cast(${Scale.toLong} as double)) as decimal(28,0))))"""))
        .as("e"))
      .groupBy(col("e.i").as("i")).agg(sum("e.s").as("s"))
    second
      .join(broadcast(first.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(first.select(col("i").as("j"), col("s").as("sj"))), "j")
      .select(col("i"), col("j"), col("n"),
        (col("sij").cast("double") / Scale / col("n")
          - (col("si").cast("double") / Scale) * (col("sj").cast("double") / Scale)
            / col("n") / col("n")).as("c"))
  }

  /** One matrix-vector product over the (i, j, c) matrix table and a
    * (j, x) vector table, terms folded in j order: returns (i, x).
    */
  def matvec(cov: DataFrame, vec: DataFrame): DataFrame =
    cov.join(vec, "j")
      .groupBy(col("i"))
      .agg(expr("aggregate(sort_array(collect_list(named_struct('o', j, 't', c * x))), " +
        "cast(0 as double), (a, s) -> a + s.t)").as("x"))

  /** Leading eigenpair of the covariance of the first `d` dims by
    * `iters` unnormalized power-iteration steps from the all-ones
    * start: (i, loading, lam) — loading the unit eigenvector component
    * (rounded 6), lam the Rayleigh quotient vᵀCv/vᵀv (rounded 6).
    * Deliberately NOT wired into the family-wide `resume` dial
    * ([[graft.operators.Checkpointer]]): the per-iteration state is a
    * d-component vector — driver-sized by construction — so restarting
    * recomputes from the already-materialized d²-row covariance table
    * in seconds; a persisted frontier would cost more than it saves.
    * Unnormalized on purpose: intermediate normalization buys nothing
    * numerically at small iteration counts and would cost a sqrt whose
    * operand depends on fold order — this way every intermediate is a
    * pure ordered-fold expression both engines share.
    */
  def leadingEigen(spark: SparkSession, cov0: DataFrame, d: Int,
                   iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    // iters+1 matvec consumers of the corpus-derived matrix: cut once
    val cov = cov0.select("i", "j", "c").localCheckpoint()
    val v0 = spark.range(d).select(col("id").cast("int").as("j"), lit(1.0).as("x"))
    val vT = (1 to iters).foldLeft(v0)((v, _) =>
      matvec(cov, v).withColumnRenamed("i", "j"))
    val w = matvec(cov, vT).withColumnRenamed("i", "j")
    val fin = vT.join(w.withColumnRenamed("x", "w"), "j")
      .agg(
        expr("aggregate(sort_array(collect_list(named_struct('o', j, 't', x * w))), " +
          "cast(0 as double), (a, s) -> a + s.t)").as("num"),
        expr("aggregate(sort_array(collect_list(named_struct('o', j, 't', x * x))), " +
          "cast(0 as double), (a, s) -> a + s.t)").as("den"))
    vT.crossJoin(broadcast(fin))
      .select(col("j").as("i"),
        round(col("x") / sqrt(col("den")), 6).as("loading"),
        round(col("num") / col("den"), 6).as("lam"))
      .orderBy("i")
  }
}
