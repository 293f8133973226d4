package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token arrays — the classic lightweight
  * quality/language classifier of corpus pipelines (the fastText-shaped
  * filter stage), trained and applied in one distributed pass.
  *
  * Everything is expressed as joins + hash aggregations:
  *   - per-(label, token) counts and per-label totals come from one
  *     explode + two aggs over the training split;
  *   - the per-label totals / priors / vocabulary size are tiny
  *     (|labels| and 1 rows) and ride broadcast joins;
  *   - scoring crosses each test-token OCCURRENCE with the label table
  *     (|labels| small) and left-joins the count table on (label,
  *     token) — the one corpus-scale shuffle, an equi-join on token
  *     that Catalyst plans as a hash join;
  *   - add-one smoothing keeps unseen tokens defined:
  *     p(t|L) = (c(t,L)+1) / (tot_L + V).
  *
  * Train/apply are split as [[fit]] → [[Model]] → [[predictWithModel]]:
  * the fitted model is four small-to-model-sized DataFrames,
  * materialized once, so a stored model can score any number of later
  * batches — including Structured-Streaming micro-batches via
  * `foreachBatch` (each micro-batch is a plain batch DataFrame; see
  * StreamingSpec's round-trip) — without re-deriving the training pass.
  *
  * Determinism for the oracle: each per-token log-probability is a
  * single exact IEEE division of two exact integers followed by ln —
  * identical in both engines; only the SUMMED log-likelihood is
  * order-dependent, so the emitted score is rounded to 6 decimals and
  * the argmax reads that rounded score with a label tie-break (max
  * score, then lexicographically smallest label).
  */
object NaiveBayes {

  /** A fitted multinomial-NB model: (label, token, c) counts, per-label
    * token totals, the 1-row vocabulary size, and per-label doc priors
    * (nd, with the training doc count n replicated per row — so the
    * model is self-contained).
    */
  final case class Model(clt: DataFrame, totl: DataFrame,
                         vocab: DataFrame, prior: DataFrame)

  /** Train on (labelCol, tokensCol). Each model table is materialized
    * (`localCheckpoint`) — they are read by several scoring branches
    * (and by every micro-batch in a serving loop), and left lazy each
    * read would re-run the training explode+agg.
    */
  def fit(train: DataFrame, labelCol: String, tokensCol: String): Model = {
    val trTok = train.select(col(labelCol).as("label"),
      explode(col(tokensCol)).as("token"))
    val clt = trTok.groupBy("label", "token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // the three derived tables are independent given the clt
    // checkpoint — overlap their materializations (guide §2.6);
    // vocabulary size comes from the aggregated count table, not
    // another pass over the exploded training tokens
    val Seq(totl, vocab, prior) = graft.operators.Par.run[DataFrame](Seq(
      () => clt.groupBy("label").agg(sum("c").as("tot")).localCheckpoint(),
      () => clt.agg(countDistinct("token").as("v")).localCheckpoint(),
      () => {
        val nTrain = train.agg(count(lit(1)).as("n"))
        train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("nd"))
          .crossJoin(broadcast(nTrain)).localCheckpoint()
      }))
    Model(clt, totl, vocab, prior)
  }

  /** Per-(id, label) rounded log-score of every doc in `test` under a
    * fitted model.
    */
  def scoresWithModel(model: Model, test: DataFrame,
                      tokensCol: String, idCol: String): DataFrame = {
    val teTok = test.select(col(idCol).as("id"), explode(col(tokensCol)).as("token"))
    val x = teTok.crossJoin(broadcast(model.totl))
    val perToken = x.join(model.clt, Seq("label", "token"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("id"), col("label"),
        log((coalesce(col("c"), lit(0L)) + 1).cast("double")
          / (col("tot") + col("v")).cast("double")).as("lp"))
    perToken.groupBy("id", "label").agg(sum("lp").as("ll"))
      .join(broadcast(model.prior), "label")
      .select(col("id"), col("label"),
        round(col("ll") + log(col("nd").cast("double") / col("n")), 6).as("score"))
  }

  /** Argmax over [[scoresWithModel]] with the deterministic (max rounded
    * score, min label) tie-break: (idCol, pred_label, score).
    */
  def predictWithModel(model: Model, test: DataFrame,
                       tokensCol: String, idCol: String): DataFrame = {
    // the score table feeds both the per-id max and the join-back that
    // resolves the argmax — left lazy, the whole scoring DAG would run
    // twice. It is tiny (|test docs| × |labels| rows).
    val sc = scoresWithModel(model, test, tokensCol, idCol).localCheckpoint()
    val m = sc.groupBy("id").agg(max("score").as("ms"))
    sc.join(m, Seq("id"))
      .where(col("score") === col("ms"))
      .groupBy("id")
      .agg(min("label").as("pred_label"), max("score").as("score"))
      .select(col("id").as(idCol), col("pred_label"), col("score"))
  }

  /** One-shot train+score (fits, then scores). */
  def scores(train: DataFrame, test: DataFrame,
             labelCol: String, tokensCol: String, idCol: String): DataFrame =
    scoresWithModel(fit(train, labelCol, tokensCol), test, tokensCol, idCol)

  /** One-shot train+predict (fits, then argmaxes). */
  def predict(train: DataFrame, test: DataFrame,
              labelCol: String, tokensCol: String, idCol: String): DataFrame =
    predictWithModel(fit(train, labelCol, tokensCol), test, tokensCol, idCol)
}
