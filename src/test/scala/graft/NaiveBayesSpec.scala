package graft

import graft.text.NaiveBayes
import org.apache.spark.sql.functions._

/** Pins multinomial-NB semantics: add-one smoothing, per-occurrence
  * (multinomial, not Bernoulli) evidence, prior weighting, and the
  * deterministic (max rounded score, min label) argmax tie-break.
  */
class NaiveBayesSpec extends SparkTestBase {

  import spark.implicits._

  private def df(rows: Seq[(Long, String, Seq[String])]) =
    rows.toDF("doc_id", "lang", "tokens")

  private lazy val train = df(Seq(
    (0L, "en", Seq("hello", "world", "hello")),
    (1L, "en", Seq("good", "morning", "world")),
    (2L, "de", Seq("hallo", "welt", "hallo")),
    (3L, "de", Seq("guten", "morgen", "welt"))))

  test("predicts by token overlap with smoothing over unseen tokens") {
    val test = df(Seq(
      (10L, "", Seq("hello", "world")),
      (11L, "", Seq("hallo", "welt", "unseen_token"))))
    val got = NaiveBayes.predict(train, test, "lang", "tokens", "doc_id")
      .select("doc_id", "pred_label").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "en", 11L -> "de"))
  }

  test("hand-computed score: P(en) path with add-one smoothing") {
    // vocabulary = {hello, world, good, morning, hallo, welt, guten, morgen} → V=8
    // en totals = 6 tokens; c(hello|en)=2 → p=(2+1)/(6+8); prior = 2/4
    val test = df(Seq((10L, "", Seq("hello"))))
    val score = NaiveBayes.scores(train, test, "lang", "tokens", "doc_id")
      .where(col("label") === "en").select("score").as[Double].head()
    val expected = BigDecimal(math.log(3.0 / 14) + math.log(2.0 / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(score === expected)
  }

  test("argmax ties break to the lexicographically smallest label") {
    // symmetric training data: both labels give any test doc the same
    // rounded score, so the tie must resolve to "aa"
    val sym = df(Seq(
      (0L, "bb", Seq("x", "y")),
      (1L, "aa", Seq("x", "y"))))
    val test = df(Seq((10L, "", Seq("x"))))
    val got = NaiveBayes.predict(sym, test, "lang", "tokens", "doc_id")
      .select("pred_label").as[String].head()
    assert(got === "aa")
  }

  test("multinomial: repeated tokens count once per occurrence") {
    // "hello hello" doubles the hello evidence vs "hello" — scores differ
    val t1 = df(Seq((10L, "", Seq("hello"))))
    val t2 = df(Seq((10L, "", Seq("hello", "hello"))))
    def en(t: org.apache.spark.sql.DataFrame) =
      NaiveBayes.scores(train, t, "lang", "tokens", "doc_id")
        .where(col("label") === "en").select("score").as[Double].head()
    assert(en(t2) < en(t1)) // two log-probs < one (both negative)
  }
}
