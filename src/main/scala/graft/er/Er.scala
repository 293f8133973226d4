package graft.er

import graft.similarity.DocSimilarity
import graft.text.{TfIdf, Tokenize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest for the reference's CSV-with-regex data files
  * (reference: textanalyse/Utils.scala:10-11,14-25,37-49,51-73).
  *
  * The reference parses lines with anchored Java regexes rather than a CSV
  * reader, tags unparsable lines, drops the header by literal id match and
  * strips `"` characters from ids. We reproduce those semantics with
  * DataFrame-native `rlike`/`regexp_extract` (same java.util.regex engine →
  * byte-identical group capture, including greedy backtracking across the
  * quoted fields), so corrupt-line accounting and all downstream goldens
  * match. Everything stays distributed — no driver-side parsing.
  */
object ErIngest {

  /** reference: textanalyse/Utils.scala:10 */
  val DataPattern = """^(.+),"(.+)",(.*),(.*),(.*)"""

  /** reference: textanalyse/Utils.scala:11 */
  val GoldPattern = """^(.+),"(.+)"""

  private def stripQuotes(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "\"", "")

  /** Product table `(id, text)`: text = title + " " + description + " " +
    * manufacturer (empty fields keep their separator — reference
    * Utils.scala:57 uses plain string concatenation).
    */
  def products(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    lines
      .where(col("value").rlike(DataPattern))
      .where(regexp_extract(col("value"), DataPattern, 1) =!= "\"id\"")
      .select(
        stripQuotes(regexp_extract(col("value"), DataPattern, 1)).as("id"),
        concat(
          regexp_extract(col("value"), DataPattern, 2), lit(" "),
          regexp_extract(col("value"), DataPattern, 3), lit(" "),
          regexp_extract(col("value"), DataPattern, 4)).as("text"))
  }

  /** Lines that fail the product regex (reference prints the first 10 —
    * Utils.scala:22-23; we return them as a DataFrame instead).
    */
  def corruptProductLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).where(!col("value").rlike(DataPattern))

  /** Gold standard `(id_a, id_b)` of known duplicate pairs. */
  def goldStandard(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(col("value").rlike(GoldPattern))
      .where(regexp_extract(col("value"), GoldPattern, 1) =!= "\"idAmazon\"")
      .select(
        stripQuotes(regexp_extract(col("value"), GoldPattern, 1)).as("id_a"),
        stripQuotes(regexp_extract(col("value"), GoldPattern, 2)).as("id_b"))

  /** Driver-side stopword load (127 words — tiny by contract; reference
    * Utils.scala:27-35).
    */
  def stopwords(spark: SparkSession, path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq
}

/** The reference's end-to-end entity-resolution pipeline, Spark-first:
  * two product catalogs → tokenize → corpus-wide plain-ratio IDF →
  * TF-IDF weights → pairwise cosine (naive cartesian or inverted-index
  * blocked) → gold-standard evaluation.
  *
  * Everything is a composition over long-form `(id, token, weight)`
  * tables; nothing is ever collected to the driver (the reference
  * collects its IDF dict and full weight maps —
  * textanalyse/EntityResolution.scala:121,
  * textanalyse/ScalableEntityResolution.scala:59-62 — which caps it at
  * driver memory; this formulation scales out).
  */
final class ErPipeline(
    spark: SparkSession,
    amazonPath: String,
    googlePath: String,
    goldPath: String,
    stopwordsPath: String) {

  val stopWords: Seq[String] = ErIngest.stopwords(spark, stopwordsPath)

  val amazon: DataFrame = ErIngest.products(spark, amazonPath).cache()
  val google: DataFrame = ErIngest.products(spark, googlePath).cache()
  val gold: DataFrame = ErIngest.goldStandard(spark, goldPath).cache()

  private def tokenize(df: DataFrame): DataFrame =
    df.select(col("id"), Tokenize.tokens(col("text"), stopWords).as("tokens"))

  val amazonTokens: DataFrame = tokenize(amazon).cache()
  val googleTokens: DataFrame = tokenize(google).cache()

  /** Bag union — reference EntityResolution.scala:86-96. */
  val corpus: DataFrame = amazonTokens.union(googleTokens)

  /** Corpus-wide plain-ratio IDF `(token, idf)` —
    * reference EntityResolution.scala:114-128 (idf = N/df, no log).
    */
  lazy val idf: DataFrame = TfIdf.idf(corpus, "id", "tokens").cache()

  /** TF-IDF weights of one side against the CORPUS IDF (the reference
    * weighs both catalogs with the shared dict —
    * EntityResolution.scala:183, ScalableEntityResolution.scala:20).
    */
  def weights(tokens: DataFrame): DataFrame =
    TfIdf.termFrequency(tokens, "id", "tokens")
      .join(broadcast(idf), "token")
      .select(col("id"), col("token"), (col("tf") * col("idf")).as("weight"))

  lazy val amazonWeights: DataFrame = weights(amazonTokens).cache()
  lazy val googleWeights: DataFrame = weights(googleTokens).cache()
  lazy val amazonNorms: DataFrame = TfIdf.norms(amazonWeights, "id").cache()
  lazy val googleNorms: DataFrame = TfIdf.norms(googleWeights, "id").cache()

  /** Naive strategy: every Amazon×Google pair scored (sim 0.0 when no
    * shared token) — reference EntityResolution.scala:133-157.
    * Returns (id_a, id_b, sim).
    */
  lazy val naiveSimilarities: DataFrame =
    DocSimilarity.cartesianCosine(
        amazonWeights.withColumnRenamed("id", "id_a"),
        amazonNorms.withColumnRenamed("id", "id_a"),
        googleWeights.withColumnRenamed("id", "id_b"),
        googleNorms.withColumnRenamed("id", "id_b"),
        "id_a", "id_b")

  /** Scalable strategy: only pairs sharing ≥1 token are scored — the
    * long weight table IS the inverted index, so the reference's
    * build-index → token-join → groupByKey → broadcast-probe chain
    * (ScalableEntityResolution.scala:64-129) collapses into one
    * join + aggregate that Catalyst plans.
    */
  lazy val scalableSimilarities: DataFrame =
    DocSimilarity.invertedIndexCosine(
        amazonWeights.withColumnRenamed("id", "id_a"),
        amazonNorms.withColumnRenamed("id", "id_a"),
        googleWeights.withColumnRenamed("id", "id_b"),
        googleNorms.withColumnRenamed("id", "id_b"),
        "id_a", "id_b")

  /** Ad-hoc two-string document similarity against the corpus IDF —
    * reference calculateDocumentSimilarity (EntityResolution.scala:406-420).
    */
  def documentSimilarity(textA: String, textB: String): Double = {
    import spark.implicits._
    val docs = Seq(("a", textA), ("b", textB)).toDF("id", "text")
    val w = weights(tokenize(docs))
    val n = TfIdf.norms(w, "id")
    val sims = DocSimilarity.invertedIndexCosine(
      w.where(col("id") === "a").withColumnRenamed("id", "id_a"),
      n.where(col("id") === "a").withColumnRenamed("id", "id_a"),
      w.where(col("id") === "b").withColumnRenamed("id", "id_b"),
      n.where(col("id") === "b").withColumnRenamed("id", "id_b"),
      "id_a", "id_b")
    sims.select("sim").collect().headOption.map(_.getDouble(0)).getOrElse(0.0)
  }
}

/** Gold-standard evaluation layer — reference
  * EntityResolution.scala:230-280 (evaluateModel) and
  * ScalableEntityResolution.scala:150-259 (histogram + P/R/F1 sweep).
  *
  * Where the reference runs one distributed filter+count job per
  * threshold (100 jobs — ScalableEntityResolution.scala:222-259) plus a
  * custom mutable `Vector[Int]` accumulator, this computes one binned
  * histogram in a single shuffle and derives all 101 thresholds with a
  * window cumulative sum — the formulation that survives 100 TB of pairs.
  */
object ErEvaluation {

  /** (duplicateCount, avgSimOfDuplicates, avgSimOfNonDuplicates) —
    * reference evaluateModel (EntityResolution.scala:230-280), but as ONE
    * aggregation pass instead of a join + three separate jobs.
    */
  def evaluateModel(sims: DataFrame, gold: DataFrame): (Long, Double, Double) = {
    val tagged = sims.join(
      gold.select(col("id_a"), col("id_b"), lit(true).as("is_dup")),
      Seq("id_a", "id_b"), "left")
    val row = tagged.agg(
      count(when(col("is_dup"), lit(1))).as("dups"),
      avg(when(col("is_dup"), col("sim"))).as("avg_dup"),
      avg(when(col("is_dup").isNull, col("sim"))).as("avg_nondup")
    ).collect()(0)
    // the avg aggregates are NULL when sims contain no gold pairs (or
    // only gold pairs) — surface NaN instead of NPE-ing on getDouble
    def d(i: Int): Double = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    (row.getLong(0), d(1), d(2))
  }

  /** Gold-pair similarities with absent candidates scored 0.0 —
    * reference `gs_value` (ScalableEntityResolution.scala:156-158,321-327).
    */
  def goldSimilarities(sims: DataFrame, gold: DataFrame): DataFrame =
    gold.join(sims, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), coalesce(col("sim"), lit(0.0)).as("sim"))

  /** 101-bin histogram `(bin, n_pairs, n_dups)`, bin = floor(sim*100) —
    * replaces the reference's `VectorAccumulatorParam` (A9) with a plain
    * aggregation.
    */
  def similarityHistogram(sims: DataFrame, gold: DataFrame): DataFrame =
    sims.join(
        gold.select(col("id_a"), col("id_b"), lit(1L).as("is_dup")),
        Seq("id_a", "id_b"), "left")
      .groupBy(floor(col("sim") * 100).cast("int").as("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dups"))

  /** Full precision/recall/F1 sweep over thresholds k/100, k = 0..100.
    * tp(k) = gold pairs with sim ≥ k/100, fp(k) = non-gold candidates
    * with sim ≥ k/100, fn(k) = |gold| − tp(k)
    * (reference falsepos/falseneg/truepos —
    * ScalableEntityResolution.scala:222-259). One shuffle + a 101-row
    * window; the reference launches ~100 jobs.
    *
    * PRECONDITION: `sims0` must hold at most one row per (id_a, id_b),
    * and `gold0` exactly one. n_gold is derived as Σ n_dups over the
    * joined bin table (that is what makes this a single pass), so a
    * duplicated candidate pair would join the same gold pair twice and
    * inflate n_gold and tp. Every similarity generator in this library
    * emits unique pairs (cosine pairs are groupBy(id_a, id_b) outputs;
    * LSH candidates are `.distinct()`); dedup first if yours does not.
    */
  def prfSweep(sims0: DataFrame, gold0: DataFrame): DataFrame = {
    // ONE full-outer join covers all three pair classes in a single
    // pass: candidate-only (isd false, real sim), gold-only (absent
    // candidate → sim 0.0, the reference's `gs_value` semantics), and
    // both. No caches, no separate anti-join branch, and no gold-count
    // branch either — n_gold falls out of the bin table itself (every
    // gold pair lands in exactly one bin, so n_gold = Σ n_dups).
    val tagged = sims0
      .join(gold0.select(col("id_a"), col("id_b"), lit(true).as("isd")),
        Seq("id_a", "id_b"), "full_outer")
      .select(floor(coalesce(col("sim"), lit(0.0)) * 100).cast("int").as("bin"),
        coalesce(col("isd"), lit(false)).as("isd"))
    val binCounts = tagged
      .groupBy("bin")
      .agg(count(when(col("isd"), lit(1))).as("n_dups"),
        count(when(!col("isd"), lit(1))).as("n_nondups"))
    val spark = sims0.sparkSession
    import spark.implicits._
    val bins = spark.range(0, 101).select(col("id").cast("int").as("bin"))
      .join(binCounts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("n_nondups"), lit(0L)).as("n_nondups"))
    // cumulative-from-the-top counts: everything in bin ≥ k is "predicted
    // duplicate" at threshold k/100. The unpartitioned window (Spark logs
    // "No Partition Defined for Window") is INTENTIONAL and safe: its
    // input is the bounded 101-row bin table at ANY corpus size, so the
    // single-partition sort is constant work, not a scale hazard.
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n_gold = Σ n_dups over the full (bounded, 101-row) frame; same
    // ordering spec as the cumsum so both windows share one sort
    val wAll = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sweep = bins
      .select(col("bin"),
        sum(col("n_dups")).over(w).as("tp"),
        sum(col("n_nondups")).over(w).as("fp"),
        sum(col("n_dups")).over(wAll).as("n_gold"))
      .select(col("bin"), col("tp"), col("fp"), (col("n_gold") - col("tp")).as("fn"),
        col("n_gold"))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))))
      // ANSI mode makes x/0 an ERROR (DuckDB yields NULL) — guard the
      // empty-gold case explicitly so both engines agree
      .withColumn("recall",
        when(col("n_gold") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("n_gold")))
      .drop("n_gold")
      .withColumn("fmeasure",
        when(col("precision").isNull || col("precision") + col("recall") === 0, lit(null))
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .orderBy("bin")
    // materialize the bounded 101-row result locally: callers can reuse
    // / re-scan it freely (and release their own upstream caches) with
    // no recomputation and nothing left persisted by the sweep itself
    val rows = sweep.collect()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava, sweep.schema)
  }
}
