package graft.text

import graft.operators.{VersionedModel, VersionedState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TRAINED Naive-Bayes classifier as durable
  * [[graft.operators.VersionedState]] — the [[QualityModel]] pattern
  * applied to the second trained classifier of the pipeline: q106/q141
  * prove the multinomial model trains deterministically (exact count
  * tables), but it re-trained per run. Here a [[fit]] COMMITS the four
  * small model tables ((label, token, c) counts, per-label totals,
  * vocabulary size, priors — [[NaiveBayes.Model]]'s exact shape),
  * readers score any later batch off the PINNED version (`asOf` — a
  * manifest-cut member like any index), and [[maintain]] gates
  * held-out accuracy (below the dial ⇒ BuildNeeded, never a silent
  * drift).
  *
  * Versions are self-contained (a model never evolves incrementally —
  * every commit is a full retrain, so no count algebra, no compaction,
  * no base horizon); labels are `model` / `model:<id>` with the
  * delivered-id sidecar riding every commit, so the trainer replay
  * guard survives [[gc]] and a past-retention replay fails LOUDLY.
  *
  * == Scale shape (100 TB) ==
  *
  * Training is one explode + two hash aggs over the training split;
  * the stored artifact is model-sized (|labels|·|vocab| count rows at
  * worst), not corpus-sized. Scoring joins the batch against the
  * stored count table on (label, token) — the one corpus-scale
  * shuffle — with every other model table riding broadcast.
  */
object NbState {

  /** Train on (labelCol, tokensCol) and COMMIT the model tables as a
    * new version. `deltaId` replay-guards the trainer; the guard, its
    * gc-proof sidecar and the loud past-retention refusal are
    * [[graft.operators.VersionedModel]]'s shared protocol.
    */
  def fit(train: DataFrame, labelCol: String, tokensCol: String,
          stateDir: String, deltaId: String = ""): Long = {
    val spark = train.sparkSession
    VersionedModel.fitCommit(spark, stateDir, deltaId) { vdir =>
      val m = NaiveBayes.fit(train, labelCol, tokensCol)
      m.clt.write.mode("overwrite").parquet(s"$vdir/clt")
      m.totl.coalesce(1).write.mode("overwrite").parquet(s"$vdir/totl")
      m.vocab.coalesce(1).write.mode("overwrite").parquet(s"$vdir/vocab")
      m.prior.coalesce(1).write.mode("overwrite").parquet(s"$vdir/prior")
    }
  }

  /** The stored model, pinned at `asOf` (a manifest cut) — the exact
    * [[NaiveBayes.Model]] the trainer committed, so every
    * [[NaiveBayes]] serving path (scores, argmax predict, streaming
    * micro-batches via foreachBatch) runs off the version unchanged.
    */
  def model(spark: SparkSession, stateDir: String,
            asOf: Option[Long] = None): Option[NaiveBayes.Model] =
    VersionedModel.pinned(spark, stateDir, asOf).map { n =>
      val vdir = VersionedState.versionPath(stateDir, n)
      NaiveBayes.Model(
        spark.read.parquet(s"$vdir/clt"),
        spark.read.parquet(s"$vdir/totl"),
        spark.read.parquet(s"$vdir/vocab"),
        spark.read.parquet(s"$vdir/prior"))
    }

  private def pinnedModel(spark: SparkSession, stateDir: String,
                          asOf: Option[Long]): NaiveBayes.Model =
    model(spark, stateDir, asOf).getOrElse(
      throw new IllegalStateException(s"no committed model at $stateDir"))

  /** Argmax predictions of a batch under the PINNED model —
    * (idCol, pred_label, score), the q106 serving path off stored
    * state.
    */
  def predict(test: DataFrame, tokensCol: String, idCol: String,
              stateDir: String, asOf: Option[Long] = None): DataFrame =
    NaiveBayes.predictWithModel(
      pinnedModel(test.sparkSession, stateDir, asOf), test, tokensCol, idCol)

  /** Per-(id, label) rounded log-scores under the PINNED model. */
  def scores(test: DataFrame, tokensCol: String, idCol: String,
             stateDir: String, asOf: Option[Long] = None): DataFrame =
    NaiveBayes.scoresWithModel(
      pinnedModel(test.sparkSession, stateDir, asOf), test, tokensCol, idCol)

  /** Held-out accuracy of the pinned model on a labeled batch — one
    * predict + one agg scan; None on an empty batch. Exact (a count
    * ratio), so gates and oracles derive the identical number.
    */
  def holdoutAccuracy(labeled: DataFrame, labelCol: String,
                      tokensCol: String, idCol: String, stateDir: String,
                      asOf: Option[Long] = None): Option[Double] = {
    val p = predict(labeled.select(col(idCol), col(tokensCol)),
      tokensCol, idCol, stateDir, asOf)
    val r = labeled.select(col(idCol), col(labelCol).as("actual"))
      .join(p, Seq(idCol))
      .agg(count(lit(1)),
        sum(when(col("actual") === col("pred_label"), 1L).otherwise(0L)))
      .head()
    if (r.getLong(0) == 0) None else Some(r.getLong(1).toDouble / r.getLong(0))
  }

  /** Reclaim versions below the newest `keepLast`. */
  def gc(spark: SparkSession, stateDir: String, keepLast: Int = 2): Unit =
    VersionedModel.gc(spark, stateDir, keepLast)

  /** The runbook as code: predict the labeled holdout with the STORED
    * model and gate on held-out accuracy — below `minAccuracy` ⇒
    * BuildNeeded (the label distribution drifted; retrain with
    * [[fit]]), never silent. An empty holdout gates Ok.
    */
  def maintain(labeled: DataFrame, labelCol: String, tokensCol: String,
               idCol: String, stateDir: String, minAccuracy: Double,
               asOf: Option[Long] = None):
      graft.operators.MaintainReport = {
    import graft.operators.{GateVerdict, MaintainReport}
    val spark = labeled.sparkSession
    val committed = VersionedState.committed(spark, stateDir)
    require(committed.nonEmpty, s"no committed model at $stateDir")
    val v = asOf.fold(committed.last._1) { a =>
      val sub = committed.filter(_._1 <= a)
      require(sub.nonEmpty, s"no committed model at $stateDir as of $a")
      sub.last._1
    }
    val measured = holdoutAccuracy(labeled, labelCol, tokensCol, idCol,
      stateDir, asOf)
    val gate = measured match {
      case None =>
        GateVerdict.Ok("fit", "empty holdout — nothing to gate on")
      case Some(acc) if acc >= minAccuracy =>
        GateVerdict.Ok("fit",
          f"held-out accuracy $acc%.4f ≥ $minAccuracy%.4f")
      case Some(acc) =>
        GateVerdict.BuildNeeded("fit",
          f"held-out accuracy $acc%.4f < $minAccuracy%.4f — the label " +
            "distribution drifted; refit with fit()")
    }
    MaintainReport(v, replayed = false, compacted = false,
      committed.length, Seq(gate),
      measured = measured.map("acc" -> _).toMap)
  }
}
