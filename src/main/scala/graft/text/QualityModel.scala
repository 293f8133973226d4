package graft.text

import graft.operators.{VersionedModel, VersionedState}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TRAINED quality-filter model as durable
  * [[graft.operators.VersionedState]] — the last one-shot trained
  * artifact in the admission path, versioned: q283 proves the
  * softsign-link linear filter trains bit-reproducibly, but it
  * re-trains per run, so the model that would gate admission (q287/
  * q290) had no stored form, no pinning, and no drift gate. Here a
  * fit COMMITS its coefficients (the NaiveBayes small-tables pattern:
  * a model version is one tiny parquet row), readers score any later
  * batch off the PINNED version (`asOf` — a
  * [[graft.operators.StateManifest]] cut member like any index), and
  * [[maintain]] turns "is the model stale?" into a gated verdict
  * (held-out accuracy below the dial ⇒ BuildNeeded — never a silent
  * drift).
  *
  * == Model and state layout ==
  *
  * The model is q283's exactly: p = ½ + ½·s/(1+|s|) with
  * s = w0 + w1·x1 + w2·x2 + w3·x3, fit by `iters` rounds of full-batch
  * gradient descent on squared error at learning rate `lr`. Every op
  * in the link is IEEE-exact and the gradient sums as NANO-LONG
  * fixed-point, so training is bit-reproducible across engines AND
  * across refits — which is what makes "scores from the stored model ≡
  * freshly trained at the same cut" a HASH gate (q291), not a
  * tolerance check.
  *
  * One versioned-state directory; each version's payload is a `model/`
  * parquet with ONE row (w0, w1, w2, w3, n_train, acc_train, iters,
  * lr). A model never evolves incrementally — every commit is a full
  * refit — so there is no count algebra, no compaction, and no base
  * horizon: a version is self-contained, labels are `model` /
  * `model:<id>` (the id replay-guards a refit exactly like a family
  * refresh: an at-least-once trainer that crashes after committing
  * re-delivers the fit as a no-op), and [[gc]] bounds the version
  * fan-out by retention. Torn commits and second-writer surfacing are
  * VersionedState's guarantees.
  *
  * == Scale shape (100 TB) ==
  *
  * Training is ONE feature pass over the corpus (the caller
  * checkpoints it) plus one partial-agg scan per GD iteration with the
  * weights riding the driver (4 doubles). Scoring a batch is map-side
  * only — the pinned coefficients ride as literals — so the admission
  * loop's quality gate adds zero shuffles. The stored artifact is a
  * few hundred bytes per version.
  */
object QualityModel {

  /** q283's token-side quality features over a tokenized corpus joined
    * with the (doc_id, n_chars) metadata: (doc_id, x1 centered
    * type-token ratio, x2 centered mean token length, x3 saturating
    * length score, y = the n_chars > 300 supervision proxy).
    * Zero-token docs carry no signal and are dropped.
    */
  def features(toks: DataFrame, idCol: String, toksCol: String,
               meta: DataFrame, nCharsCol: String): DataFrame =
    toks.join(meta.select(col(idCol), col(nCharsCol)), idCol)
      .where(size(col(toksCol)) >= 1)
      .select(col(idCol),
        (size(array_distinct(col(toksCol))).cast("double")
          / size(col(toksCol)) - 0.5).as("x1"),
        (expr(s"aggregate(transform($toksCol, t -> length(t)), 0, " +
          "(a, x) -> a + x)").cast("double")
          / size(col(toksCol)) - 4.5).as("x2"),
        (size(col(toksCol)).cast("double")
          / (lit(50) + size(col(toksCol))) - 0.5).as("x3"),
        when(col(nCharsCol) > 300, 1.0).otherwise(0.0).as("y"))

  /** The raw trainer: full-batch GD on (x1, x2, x3, y) rows —
    * bit-reproducible (softsign link, nano-long gradient sums).
    * Returns (weights w0..w3, n, accuracy on the training rows).
    * The caller should checkpoint `feat` (every iteration scans it).
    */
  def fitWeights(feat: DataFrame, iters: Int = 8,
                 lr: Double = 4.0): (Array[Double], Long, Double) = {
    require(iters >= 1 && lr > 0, s"bad dials: iters=$iters lr=$lr")
    val n = feat.count()
    require(n > 0, "fit needs a non-empty feature frame")
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val sCol = sExpr(w.toSeq)
      val p = pExpr(w.toSeq)
      val d = lit(0.5) / ((lit(1) + abs(sCol)) * (lit(1) + abs(sCol)))
      val e = (p - col("y")) * d
      // exact fixed-point gradient: nano-long per-row contributions
      // sum exactly, so the update is engine-order-independent
      val r = feat.agg(
        sum(round(e * 1e9).cast("long")),
        sum(round(e * col("x1") * 1e9).cast("long")),
        sum(round(e * col("x2") * 1e9).cast("long")),
        sum(round(e * col("x3") * 1e9).cast("long"))).head()
      w = Array.tabulate(4)(j =>
        w(j) - lr * (r.getLong(j).toDouble / 1e9 / n))
    }
    (w, n, holdoutAccuracy(feat, w.toSeq).get)
  }

  /** The linear score s under explicit weights — the ONE definition of
    * the model's geometry ([[pExpr]], [[score]], [[fitWeights]] and
    * [[holdoutAccuracy]] all read it, so the link can never fork
    * between training, serving and gating).
    */
  private def sExpr(w: Seq[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** The softsign link p = ½ + ½·s/(1+|s|) under explicit weights. */
  private def pExpr(w: Seq[Double]): Column = {
    val s = sExpr(w)
    lit(0.5) + lit(0.5) * s / (lit(1) + abs(s))
  }

  /** Accuracy of explicit weights on a labeled feature frame — one agg
    * scan; None on an empty frame. Exact (a count ratio), so gates and
    * oracles derive the identical number.
    */
  def holdoutAccuracy(feat: DataFrame, w: Seq[Double]): Option[Double] = {
    val p = pExpr(w)
    val r = feat.agg(count(lit(1)),
      sum(when((p > 0.5) === (col("y") > 0.5), 1L).otherwise(0L))).head()
    val n = r.getLong(0)
    if (n == 0) None else Some(r.getLong(1).toDouble / n)
  }

  /** Map-side scores under explicit weights: (idCol, score) with
    * score = the softsign p — the pinned coefficients ride as
    * literals, so this adds no shuffle to an admission plan.
    */
  def score(feat: DataFrame, idCol: String, w: Seq[Double]): DataFrame = {
    require(w.length == 4, s"the model has 4 weights, got ${w.length}")
    feat.select(col(idCol), pExpr(w).as("score"))
  }

  /** Train on `feat` and COMMIT the coefficients as a new version.
    * `deltaId` replay-guards the fit; the guard, its gc-proof sidecar
    * and the loud past-retention refusal are
    * [[graft.operators.VersionedModel]]'s shared protocol. Old
    * versions stay readable for pinned cuts; bound them with [[gc]].
    */
  def fit(feat: DataFrame, stateDir: String, deltaId: String = "",
          iters: Int = 8, lr: Double = 4.0): Long = {
    val spark = feat.sparkSession
    VersionedModel.fitCommit(spark, stateDir, deltaId) { vdir =>
      val (w, n, acc) = fitWeights(feat, iters, lr)
      import spark.implicits._
      Seq((w(0), w(1), w(2), w(3), n, acc, iters, lr))
        .toDF("w0", "w1", "w2", "w3", "n_train", "acc_train", "iters", "lr")
        .coalesce(1).write.mode("overwrite").parquet(s"$vdir/model")
    }
  }

  /** The stored model row (w0..w3 full-precision, n_train, acc_train,
    * iters, lr). `asOf` pins a committed version (a manifest cut).
    */
  def model(spark: SparkSession, stateDir: String,
            asOf: Option[Long] = None): Option[DataFrame] =
    VersionedModel.pinned(spark, stateDir, asOf).map { n =>
      spark.read.parquet(s"${VersionedState.versionPath(stateDir, n)}/model")
    }

  /** The pinned coefficients, driver-side — what a scoring plan bakes
    * in as literals ([[score]]).
    */
  def weights(spark: SparkSession, stateDir: String,
              asOf: Option[Long] = None): Array[Double] = {
    val r = model(spark, stateDir, asOf).getOrElse(
      throw new IllegalStateException(s"no committed model at $stateDir"))
      .select("w0", "w1", "w2", "w3").head()
    Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Reclaim versions below the newest `keepLast` (pinned cuts must be
    * within the retained window — the StateManifestGc discipline
    * doesn't apply since models have no base horizon).
    */
  def gc(spark: SparkSession, stateDir: String, keepLast: Int = 2): Unit =
    VersionedModel.gc(spark, stateDir, keepLast)

  /** The runbook as code: score `holdoutFeat` with the STORED model
    * and gate on held-out accuracy — below `minAccuracy` the verdict
    * is BuildNeeded (the corpus drifted from the training
    * distribution; refit with [[fit]]), never a silent degradation.
    * Accuracy is a count ratio — exact, so the gate is deterministic.
    */
  def maintain(holdoutFeat: DataFrame, stateDir: String,
               minAccuracy: Double,
               asOf: Option[Long] = None):
      graft.operators.MaintainReport = {
    import graft.operators.{GateVerdict, MaintainReport}
    val spark = holdoutFeat.sparkSession
    val committed = VersionedState.committed(spark, stateDir)
    require(committed.nonEmpty, s"no committed model at $stateDir")
    // the report names the version the gate actually EVALUATED — the
    // pinned one under asOf, not the head
    val v = asOf.fold(committed.last._1) { a =>
      val sub = committed.filter(_._1 <= a)
      require(sub.nonEmpty, s"no committed model at $stateDir as of $a")
      sub.last._1
    }
    val w = weights(spark, stateDir, asOf)
    val measured = holdoutAccuracy(holdoutFeat, w.toSeq)
    val gate = measured match {
      case None =>
        GateVerdict.Ok("fit", "empty holdout — nothing to gate on")
      case Some(acc) if acc >= minAccuracy =>
        GateVerdict.Ok("fit",
          f"held-out accuracy $acc%.4f ≥ $minAccuracy%.4f")
      case Some(acc) =>
        GateVerdict.BuildNeeded("fit",
          f"held-out accuracy $acc%.4f < $minAccuracy%.4f — the corpus " +
            "drifted from the training distribution; refit with fit()")
    }
    // every model version is self-contained (no base horizon), so the
    // marker count is simply the committed-version count — [[gc]]
    // bounds it by retention
    MaintainReport(v, replayed = false, compacted = false,
      committed.length, Seq(gate),
      measured = measured.map("acc" -> _).toMap)
  }
}
