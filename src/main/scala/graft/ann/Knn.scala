package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense-vector similarity search over an `ARRAY<FLOAT>` embedding column.
  *
  * The dot-product kernel is a native codegen'd Catalyst expression
  * (graft.functions.FloatVecDot) — no UDF/serialization cost, no
  * per-row allocation, fused into whole-stage codegen. Elements are
  * widened to double BEFORE multiplying: a float×float product computed
  * in double is exact (24+24 mantissa bits < 53), which makes results
  * reproducible across engines up to summation order — and the kernel
  * sums sequentially, matching the DuckDB oracle's list_sum order.
  *
  * Scale design: `cosineKnn` broadcasts the (small) query set against the
  * (huge) candidate corpus — a map-side broadcast nested-loop join with a
  * per-query top-k, i.e. brute force that parallelizes linearly in the
  * corpus. `nearDupPairs` is the all-pairs variant for bounded subsets;
  * at 100 TB you'd first block with LSH (see graft.dedup) and only score
  * within buckets.
  */
object Knn {

  /** Exact double dot product of two float array columns — a native
    * codegen'd expression (graft.functions.FloatVecDot); same sequential
    * summation order as the higher-order formulation, ~20× faster.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** L2 norm of a float array column. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Corpus with precomputed norms. Zero-norm vectors (all-zero padding /
    * failed-encode sentinels — realistic at corpus scale) are dropped
    * here: cosine against them divides by zero, which Spark 4's ANSI
    * mode turns into a DIVIDE_BY_ZERO error crashing the whole query.
    * NULL vectors yield NULL norms and are dropped by the same predicate.
    */
  private def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("nrm"))
      .where(col("nrm") > 0)

  /** Brute-force cosine top-k: for every query vector, the k most similar
    * candidates (self excluded). Query side is broadcast.
    * Returns (q_id, rk, cand_id, sim) with sim rounded to 6 decimals.
    */
  def cosineKnn(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int): DataFrame = {
    val e = withNorm(emb, idCol, vecCol)
    val q = e.where(queryPred).select(
      col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val c = e.select(
      col(idCol).as("cand_id"), col(vecCol).as("c_vec"), col("nrm").as("c_nrm"))
    val sims = broadcast(q).join(c, col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("cand_id"), round(col("sim"), 6).as("sim"))
  }

  /** IVF (inverted-file) cluster assignment: every vector goes to its
    * most-cosine-similar centroid. The centroid set is tiny by
    * construction → broadcast; assignment is one map-side pass over the
    * corpus + a per-vector top-1, so it scales linearly. `centroidPred`
    * stands in for a trained codebook (k-means is a driver-side loop of
    * exactly this assign step + a groupBy mean).
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                centroidPred: Column): DataFrame = {
    val e = withNorm(emb, idCol, vecCol)
    val cent = e.where(centroidPred).select(
      col(idCol).as("centroid_id"), col(vecCol).as("cent_vec"), col("nrm").as("cent_nrm"))
    val scored = e.crossJoin(broadcast(cent))
      .select(col(idCol), col("centroid_id"),
        (dot(col(vecCol), col("cent_vec")) / (col("nrm") * col("cent_nrm"))).as("cs"))
    val w = Window.partitionBy(idCol).orderBy(col("cs").desc, col("centroid_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col(idCol), col("centroid_id"))
  }

  /** Spherical k-means for the IVF codebook: assign every vector to its
    * most-similar centroid (map-side, centroids broadcast), recompute
    * centroids as per-cluster means (one shuffle on cluster id), repeat.
    * Only the k centroid vectors ever reach the driver — the corpus
    * stays distributed, so iterations cost O(corpus × k) map work plus
    * one k-row collect each. Deterministic: seeded from `centroidPred`
    * rows, cosine ties broken by centroid id.
    *
    * @return (centroid_id, centroid ARRAY<FLOAT>) after `iters` updates
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      centroidPred: Column, iters: Int): DataFrame = {
    var centroids = emb.where(centroidPred)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cent_vec"))
    (1 to iters).foreach { _ =>
      // a recomputed mean could in principle collapse to the zero vector;
      // drop it rather than divide by zero under ANSI mode
      val cn = centroids.select(col("centroid_id"), col("cent_vec"),
        l2norm(col("cent_vec")).as("cent_nrm"))
        .where(col("cent_nrm") > 0)
      val e = withNorm(emb, idCol, vecCol)
      val scored = e.crossJoin(broadcast(cn))
        .select(col(idCol), col(vecCol), col("centroid_id"),
          (dot(col(vecCol), col("cent_vec")) / (col("nrm") * col("cent_nrm"))).as("cs"))
      val w = Window.partitionBy(idCol).orderBy(col("cs").desc, col("centroid_id"))
      val assigned = scored.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      // per-cluster mean: explode to (cluster, dim, value), aggregate,
      // rebuild the vector ordered by dimension index
      centroids = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("centroid_id", "dim")
        .agg(avg(col("v")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"),
          transform(col("dm"), x => x.getField("m").cast("float")).as("cent_vec"))
    }
    centroids
  }

  /** IVF top-k search (nprobe=1): each query only scores candidates in
    * its own centroid's bucket — the 100 TB path where brute force stops
    * being an option. Recall < 1 by design; raise nprobe by relaxing the
    * bucket equi-join to the query's top-n centroids.
    */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             centroidPred: Column, queryPred: Column, k: Int): DataFrame = {
    val assign = ivfAssign(emb, idCol, vecCol, centroidPred)
    val e = withNorm(emb, idCol, vecCol).join(assign, idCol)
    val q = e.where(queryPred).select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col("nrm").as("q_nrm"), col("centroid_id"))
    val c = e.select(col(idCol).as("cand_id"),
      col(vecCol).as("c_vec"), col("nrm").as("c_nrm"), col("centroid_id"))
    val sims = broadcast(q).join(c, Seq("centroid_id"))
      .where(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("cand_id"), round(col("sim"), 6).as("sim"))
  }

  /** All-pairs near-duplicate detection by cosine threshold (id_a < id_b). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val e = withNorm(emb, idCol, vecCol)
    val a = e.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .where(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
