package graft

import graft.text.Tokenize
import org.apache.spark.sql.functions._

/** Tokenizer goldens ported from the reference's unit tests
  * (reference: test/EntityResolutionTest.scala:54-99).
  */
class TokenizeSpec extends SparkTestBase {

  private def tok(s: String, stop: Seq[String] = Nil): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(Tokenize.tokens(col("text"), stop).as("t"))
      .collect()(0).getSeq[String](0)
  }

  test("empty string tokenizes to nothing") {
    assert(tok("") === Nil)
  }

  test("punctuation and digits split like \\W+") {
    val r = tok("This 88 is! a,Test! The result !!!should be: 8 Words")
    assert(r.length === 11)
    assert(r.sorted === List("8", "88", "a", "be", "is", "result", "should",
      "test", "the", "this", "words"))
  }

  test("plain sentence") {
    val r = tok("This is another test. It contains a lot of words which are also in string 1.")
    assert(r.length === 16)
    assert(r.sorted === List("1", "a", "also", "another", "are", "contains",
      "in", "is", "it", "lot", "of", "string", "test", "this", "which", "words"))
  }

  test("underscores are word characters") {
    val r = tok("!!123A!/456_B_12/987C.123d")
    assert(r.length === 4)
    assert(r.sorted === List("123a", "123d", "456_b_12", "987c"))
  }

  test("stopword removal keeps duplicates, removes stopwords") {
    val stop = Seq("being", "at", "the", "of")
    val r = tok("Being at the top of the pops!", stop)
    assert(r.size === 2)
    assert(r.sorted === List("pops", "top"))
  }

  test("duplicate non-stopword tokens are preserved") {
    val r = tok("spark spark the spark", Seq("the"))
    assert(r === Seq("spark", "spark", "spark"))
  }
}
