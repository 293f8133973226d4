package graft

import graft.dedup.Dedup
import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._

/** Contract of the Bloom decontamination prefilter (q74): false
  * positives only — every true match survives the sketch — and the
  * prefilter actually shrinks the exact join's input.
  */
class BloomPrefilterSpec extends SparkTestBase {

  test("prefilter keeps every true match and prunes most non-matching shingles") {
    val toks = Tables.read(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), text.Tokenize.tokens(col("text"),
        queries.TextQueries.Stop).as("tokens"))
    val sh = toks.select(col("doc_id"), Dedup.wordShingles(col("tokens"), 3).as("sh"))
    val train = sh.where(col("doc_id") < 400)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val evalSh = sh.where(col("doc_id") >= 400)
      .select(explode(col("sh")).as("s")).distinct()

    val sketch = BloomFunctions.bloomSketch(evalSh, xxhash64(col("s")), 1L << 17, 8L << 17)
    val pre = train.where(BloomFunctions.mightContain(sketch, xxhash64(col("s"))))

    val nTrain = train.count()
    val nPre = pre.count()
    val nTrue = train.join(evalSh, "s").count()

    assert(nPre >= nTrue, "a Bloom filter must never drop a true match")
    assert(nPre < nTrain / 2,
      s"prefilter should prune most of the $nTrain train shingles, kept $nPre")

    // and the exact join after the prefilter = the exact join without it
    val exact = train.join(evalSh, "s").groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
    val viaBloom = pre.select(col("doc_id"), col("s")).join(evalSh, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
  }

  test("empty build side: sketch is NULL and might_contain drops all rows") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("s")
    val sketch = BloomFunctions.bloomSketch(empty, xxhash64(col("s")), 16L, 128L)
    val probe = Seq("x", "y").toDF("s")
      .where(BloomFunctions.mightContain(sketch, xxhash64(col("s"))))
    assert(probe.count() === 0L)
  }
}
