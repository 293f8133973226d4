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
  * Determinism for the oracle: each per-token log-probability is a
  * single exact IEEE division of two exact integers followed by ln —
  * identical in both engines; only the SUMMED log-likelihood is
  * order-dependent, so the emitted score is rounded to 6 decimals and
  * the argmax reads that rounded score with a label tie-break (max
  * score, then lexicographically smallest label).
  */
object NaiveBayes {

  /** Per-(id, label) rounded log-score for every test doc.
    * train: (labelCol, tokensCol); test: (idCol, tokensCol).
    */
  def scores(train: DataFrame, test: DataFrame,
             labelCol: String, tokensCol: String, idCol: String): DataFrame = {
    val trTok = train.select(col(labelCol).as("label"),
      explode(col(tokensCol)).as("token"))
    val clt = trTok.groupBy("label", "token").agg(count(lit(1)).as("c"))
    val totl = clt.groupBy("label").agg(sum("c").as("tot"))
    // vocabulary size from the (label, token) count table, not another
    // pass over the exploded training tokens — clt is the aggregated
    // V×L table, one more agg over it is far cheaper than re-tokenizing
    val vocab = clt.agg(countDistinct("token").as("v"))
    val prior = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("nd"))
    val ntr = train.agg(count(lit(1)).as("n"))

    val teTok = test.select(col(idCol).as("id"), explode(col(tokensCol)).as("token"))
    val x = teTok.crossJoin(broadcast(totl))
    val perToken = x.join(clt, Seq("label", "token"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("label"),
        log((coalesce(col("c"), lit(0L)) + 1).cast("double")
          / (col("tot") + col("v")).cast("double")).as("lp"))
    perToken.groupBy("id", "label").agg(sum("lp").as("ll"))
      .join(broadcast(prior), "label").crossJoin(broadcast(ntr))
      .select(col("id"), col("label"),
        round(col("ll") + log(col("nd").cast("double") / col("n")), 6).as("score"))
  }

  /** Argmax over [[scores]] with the deterministic (max rounded score,
    * min label) tie-break: (id, pred_label, score).
    */
  def predict(train: DataFrame, test: DataFrame,
              labelCol: String, tokensCol: String, idCol: String): DataFrame = {
    // the score table feeds both the per-id max and the join-back that
    // resolves the argmax — left lazy, the entire train+score DAG
    // (tokenize, count tables, the corpus-scale token join) would run
    // TWICE. It is tiny (|test docs| × |labels| rows), so materialize it
    // once; the checkpoint also truncates the lineage a long pipeline
    // would otherwise re-derive.
    val sc = scores(train, test, labelCol, tokensCol, idCol).localCheckpoint()
    val m = sc.groupBy("id").agg(max("score").as("ms"))
    sc.join(m, Seq("id"))
      .where(col("score") === col("ms"))
      .groupBy("id")
      .agg(min("label").as("pred_label"), max("score").as("score"))
      .select(col("id").as(idCol), col("pred_label"), col("score"))
  }
}
