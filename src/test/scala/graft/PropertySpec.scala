package graft

import graft.dedup.Dedup
import graft.text.Tokenize
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: random inputs, engine result checked against an
  * independent driver-side model. One Spark job per property (the random
  * cases ride in a single DataFrame), so hundreds of cases stay cheap.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', '.', ',', '!', '/', '_'),
    1 -> Gen.oneOf('Ä', 'ß', '€', '中', '\n', '"', '\''))).map(_.mkString)

  test("tokenizer ≡ Java toLowerCase.split(\\W+) minus empties, for arbitrary text") {
    val texts = sample(textGen, 300)
    val got = texts.toDF("text")
      .select(Tokenize.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    val expected = texts.map(_.toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty))
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"case $i: ${texts(i)}")
    }
  }

  test("stopword tokenizer keeps duplicates and order, for arbitrary text") {
    val stop = Seq("a", "the", "x1")
    val texts = sample(textGen, 200)
    val got = texts.toDF("text")
      .select(Tokenize.tokens(col("text"), stop).as("t"))
      .as[Seq[String]].collect()
    val expected = texts.map(
      _.toLowerCase.split("\\W+").toSeq.filter(t => t.nonEmpty && !stop.contains(t)))
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
  }

  test("native simhash ≡ HOF simhash for arbitrary token arrays") {
    val tokensGen: Gen[Seq[String]] =
      Gen.listOfN(8, Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const("")))
        .map(_.toSeq)
    val cases = sample(tokensGen, 150)
    val df = cases.toDF("tokens").cache()
    val native = df.select(Dedup.simhash(col("tokens"))).as[String].collect()
    val hof = df.select(Dedup.simhashHof(col("tokens"))).as[String].collect()
    assert(native.toSeq === hof.toSeq)
  }

  test("native minhash kernel ≡ HOF minhash for arbitrary token arrays") {
    val tokensGen: Gen[Seq[String]] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""),
        Gen.const("ÄßÄ中"))).map(_.toSeq))
    val cases = sample(tokensGen, 150)
    val fixture = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tokens").cache()
    val kernel = Dedup.minhashSignatures(fixture, "id", "tokens", 3)
      .collect().map(r => r.getLong(0) -> (1 to 3).map(r.getString)).toMap
    val hof = fixture.select(col("id") +:
        (0 until 3).map(i => Dedup.minhash(col("tokens"), i).as(s"mh$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 3).map(r.getString)).toMap
    assert(kernel === hof)
  }

  test("native word shingles ≡ HOF shingles for arbitrary token arrays and n") {
    val tokensGen: Gen[Seq[String]] = Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.map(_.take(4))).map(_.toSeq))
    val cases = sample(tokensGen, 150)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tokens").cache()
    for (n <- Seq(1, 2, 4)) {
      val kernel = df.select(col("id"), Dedup.wordShingles(col("tokens"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = df.select(col("id"), Dedup.wordShinglesHof(col("tokens"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(kernel === hof, s"divergence at n=$n")
    }
  }

  test("TopKAggregator ≡ row_number window for arbitrary scored pairs (with ties)") {
    import org.apache.spark.sql.expressions.Window
    // duplicate sims are likely by construction (values drawn from a
    // small grid) — exactly the tie case where the (sim DESC, cand ASC)
    // orders must agree between the k-slot aggregator and the window
    val pairGen: Gen[(Long, Long, Double)] = for {
      q <- Gen.choose(0L, 5L)
      c <- Gen.choose(0L, 40L)
      s <- Gen.choose(0, 10).map(_ / 10.0)
    } yield (q, c, s)
    val rows = sample(pairGen, 400)
      .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq // unique (q, cand)
    val df = rows.toDF("q_id", "cand_id", "sim").cache()
    for (k <- Seq(1, 3, 7)) {
      val viaAgg = df.groupBy("q_id")
        .agg(graft.functions.TopKAggregator.topK(k)(col("sim"), col("cand_id")).as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "sc")))
        .select(col("q_id"), (col("pos") + 1).as("rk"),
          col("sc.cand_id").as("cand_id"), col("sc.sim").as("sim"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
      val viaWindow = df.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select("q_id", "rk", "cand_id", "sim")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(viaAgg === viaWindow, s"divergence at k=$k")
    }
  }

  test("TopKBinaryAggregator ≡ row_number window for string-keyed scored pairs") {
    import org.apache.spark.sql.expressions.Window
    // string ids whose lexicographic and numeric orders DIFFER (e.g.
    // "10" < "2") plus heavy sim ties: the binary-buffered aggregator's
    // unsigned byte comparison must reproduce the window's UTF8String
    // order exactly
    val pairGen: Gen[(Long, String, Double)] = for {
      q <- Gen.choose(0L, 5L)
      c <- Gen.choose(0L, 40L).map(_.toString)
      s <- Gen.choose(0, 10).map(_ / 10.0)
    } yield (q, c, s)
    val rows = sample(pairGen, 400)
      .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    val df = rows.toDF("q_id", "cand_id", "sim").cache()
    for (k <- Seq(1, 3, 7)) {
      val viaAgg = df.groupBy("q_id")
        .agg(graft.functions.TopKAggregator.topKBinary(k)(
          col("sim"), col("cand_id").cast("binary")).as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "sc")))
        .select(col("q_id"), (col("pos") + 1).as("rk"),
          col("sc.cand_id").cast("string").as("cand_id"), col("sc.sim").as("sim"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
      val viaWindow = df.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select("q_id", "rk", "cand_id", "sim")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
      assert(viaAgg === viaWindow, s"divergence at k=$k")
    }
  }

  test("minhash equality is permutation-invariant for arbitrary token arrays") {
    val tokensGen = Gen.listOfN(10, Gen.alphaLowerStr.map(_.take(5))).map(_.toSeq)
    val cases = sample(tokensGen, 100)
    val both = cases.map(c => (c, scala.util.Random.shuffle(c)))
    val df = both.toDF("a", "b")
    val neq = df.select(
        (Dedup.minhash(col("a"), 1) === Dedup.minhash(col("b"), 1)).as("eq"))
      .where(!col("eq")).count()
    assert(neq === 0)
  }

  test("wavPayload column synthesis round-trips wavDecoder for arbitrary (id, n, rate)") {
    import graft.multimodal.Multimodal
    val caseGen = for {
      id <- Gen.chooseNum(0L, 1000000L)
      n <- Gen.chooseNum(1, 64)
      rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000)
    } yield (id, n, rate)
    val cases = sample(caseGen, 150).distinctBy(_._1) // id keys the result map
    val decoded = Multimodal.decodeAudio(
        cases.toDF("id", "n", "rate").select(col("id"),
          Multimodal.wavPayload(col("id"), col("n"), col("rate")).as("bin")),
        "id", "bin")
      .collect().map(d => d.id -> d).toMap
    cases.foreach { case (id, n, rate) =>
      val d = decoded(id)
      assert(d.n_bytes === 44 + n * 2, s"id=$id n=$n")
      assert((d.sample_rate, d.n_channels, d.n_samples) === (rate, 1, n))
      val want = (0 until n).map { k =>
        val u = ((id * 31 + k * 17) % 65536).toInt
        (if (u >= 32768) u - 65536 else u).toDouble
      }.sum / n
      assert(math.abs(d.mean_amp - want) < 1e-9, s"mean for id=$id n=$n rate=$rate")
    }
  }

  test("power sums merge exactly: partial-batch moments == whole-table moments") {
    // the 100 TB argument for q110's shape: Σcv, Σcv², Σcv³ are exact
    // integers, so partials from ANY partitioning of the data merge by
    // addition into bit-identical totals — unlike a naive mean/variance
    // fold, whose float partials depend on the split. Two arbitrary
    // halves stand in for 10k executor partials.
    import org.apache.spark.sql.DataFrame
    val events = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), graft.QueryDef.cents(col("value")).as("cv"))
    def sums(df: DataFrame): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("cv").cast("decimal(38,0)")).as("s1"),
        sum((col("cv") * col("cv")).cast("decimal(38,0)")).as("s2"),
        sum((col("cv") * col("cv") * col("cv")).cast("decimal(38,0)")).as("s3"))
    val whole = sums(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDecimal(3),
        r.getDecimal(4))).toMap
    val partials = Seq(
      sums(events.where(pmod(col("cv"), lit(2)) === 0)),
      sums(events.where(pmod(col("cv"), lit(2)) === 1)))
    val merged = partials.reduce(_ union _)
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"), sum("s3").as("s3"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDecimal(3),
        r.getDecimal(4))).toMap
    assert(merged.keySet === whole.keySet)
    for ((k, (n, s1, s2, s3)) <- whole) {
      val (mn, m1, m2, m3) = merged(k)
      assert(mn === n, k)
      assert(m1.compareTo(s1) == 0 && m2.compareTo(s2) == 0 && m3.compareTo(s3) == 0, k)
    }
  }

  test("Jaccard ≤ both containment directions; equal sets meet at 1.0 (random docs)") {
    // J = |A∩B|/|A∪B| and C(A→B) = |A∩B|/|A| share the numerator, and
    // |A| ≤ |A∪B| — so Jaccard can never exceed either containment
    // direction. The sub-document screen is exactly this gap: a subset
    // doc scores C=1 while J stays at |A|/|B|.
    val tokensGen = Gen.listOfN(8, Gen.oneOf("big", "data", "spark", "flink",
      "engine", "rules", "fast", "scale")).map(_.toSeq)
    val docs = sample(tokensGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "tokens")
    val j = Dedup.bigramJaccardPairs(docs, "doc_id", "tokens")
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val c = Dedup.shingleContainmentPairs(docs, "doc_id", "tokens", num = 0, den = 1)
    val violations = j.join(c, Seq("id_a", "id_b"))
      .where(col("jaccard") > col("containment") + 1e-12).count()
    assert(violations === 0)
    // identical bigram sets: both metrics exactly 1.0
    val twin = Seq((1L, Seq("big", "data", "spark")), (2L, Seq("big", "data", "spark")))
      .toDF("doc_id", "tokens")
    val ones = Dedup.shingleContainmentPairs(twin, "doc_id", "tokens", num = 1, den = 1)
      .as[(Long, Long, Double)].collect().sorted
    assert(ones === Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("interval union: covered length ≡ driver-side sweep; bounded by sum and max") {
    val ivGen: Gen[(Long, Long, Long)] = for {
      k <- Gen.choose(0L, 3L)
      st <- Gen.choose(0L, 60L)
      len <- Gen.choose(0L, 25L)
    } yield (k, st, st + len)
    val rows = sample(ivGen, 300).zipWithIndex
      .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
    val got = graft.operators.IntervalUnion.coverage(
        rows.toDF("k", "st", "en", "id"), "k", "st", "en", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent model: sort and sweep on the driver
    val want = rows.groupBy(_._1).map { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      var spans = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (curE == Long.MinValue || s > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          spans += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      if (curE != Long.MinValue) covered += curE - curS
      k -> ((spans, covered))
    }
    assert(got === want)
    // invariants: union ≤ Σ lengths, union ≥ longest single interval
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val (_, cov) = got(k)
      assert(cov <= ivs.map(t => t._3 - t._2).sum)
      assert(cov >= ivs.map(t => t._3 - t._2).max)
    }
  }

  test("KS statistic ∈ [0,1]; 0 iff the group matches the rest exactly") {
    val gen: Gen[(String, Long)] = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 20L)
    } yield (g, v)
    val rows = sample(gen, 400)
    val got = graft.operators.KsTest.perGroupVsRest(
        rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (g, na, nb, dnum, ks) =>
      assert(ks >= 0.0 && ks <= 1.0, s"group $g: ks=$ks out of range")
      assert(dnum <= na * nb)
    }
    // duplicating one group as another makes that group's complement
    // contain an exact copy PLUS extras — statistic stays < 1
    val mirrored = rows.filter(_._1 == "a").map { case (_, v) => ("a2", v) }
    val ks2 = graft.operators.KsTest.perGroupVsRest(
        (rows ++ mirrored).toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(ks2("a2") < 1.0)
  }

  test("CDC compaction is invariant to input order and replay") {
    val gen: Gen[(Long, Long, String, Double)] = for {
      k <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 30L)
      op <- Gen.oneOf("upsert", "upsert", "upsert", "delete")
      v <- Gen.choose(0, 999).map(_ / 100.0)
    } yield (k, ts, op, v)
    val rows = sample(gen, 200).zipWithIndex
      .map { case ((k, ts, op, v), i) => (k, ts, i.toLong, op, v) }
    def latest(xs: Seq[(Long, Long, Long, String, Double)]) =
      graft.operators.Compaction.latest(
          xs.toDF("k", "ts", "seq", "op", "v"),
          Seq("k"), "ts", Seq("seq"), Seq("op", "v"),
          col("op") === "delete")
        .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(3)) -> r.getLong(0))
        .map(_.swap).toMap
    val once = latest(rows)
    assert(latest(rows.reverse) === once, "arrival order must not matter")
    assert(latest(rows ++ rows) === once, "at-least-once replay must be a no-op")
    // model: per key, max by (ts, seq); drop if delete
    val want = rows.groupBy(_._1).flatMap { case (k, xs) =>
      val last = xs.maxBy(t => (t._2, t._3))
      if (last._4 == "delete") None else Some(k -> ((last._4, last._5, last._2)))
    }
    assert(once === want)
  }

  test("co-occurrence cosine ∈ (0,1] and symmetric under item relabeling") {
    val gen: Gen[(Long, Long)] = for {
      b <- Gen.choose(0L, 15L)
      i <- Gen.choose(0L, 8L)
    } yield (b, i)
    val rows = sample(gen, 300)
    val base = graft.operators.Cooccur.itemCosine(
        rows.toDF("basket", "item"), "basket", "item",
        maxBasketSize = 16, minCount = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    base.values.foreach(c => assert(c > 0.0 && c <= 1.0 + 1e-15))
    // relabel items by x → 100 − x: pairs flip orientation, cosines persist
    val flipped = graft.operators.Cooccur.itemCosine(
        rows.map { case (b, i) => (b, 100L - i) }.toDF("basket", "item"),
        "basket", "item", maxBasketSize = 16, minCount = 1L)
      .collect().map(r => ((100L - r.getLong(1), 100L - r.getLong(0)), r.getDouble(5))).toMap
    assert(flipped === base)
  }

  test("ExactSubstr spans ≡ driver-side sliding-window model, for arbitrary corpora and L") {
    // tiny alphabet so duplicated windows actually occur
    val docGen: Gen[List[String]] =
      Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    def model(docs: Seq[(Long, List[String])],
              l: Int): Set[(Long, Long, Long, Long, Long, Long)] = {
      val windows = docs.flatMap { case (id, t) =>
        if (t.size >= l) (0 to t.size - l).map(i =>
          (id, (i + 1).toLong, t.slice(i, i + l).mkString(" ")))
        else Nil
      }
      val dup = windows.groupBy(_._3).filter(_._2.size >= 2).keySet
      docs.flatMap { case (id, _) =>
        val dw = windows.collect { case (d, i, h) if d == id && dup(h) => i }.sorted
        if (dw.isEmpty) Nil
        else {
          // gaps-and-islands: new island when the start clears every
          // previous window's end
          val islands = dw.tail.foldLeft(List(List(dw.head))) { (acc, i) =>
            val maxEnd = acc.head.map(_ + l).max
            if (i > maxEnd) List(i) :: acc else (i :: acc.head) :: acc.tail
          }.reverse.map(_.reverse)
          islands.zipWithIndex.map { case (is, k) =>
            (id, (k + 1).toLong, is.head, is.last + l,
              is.last + l - is.head, is.length.toLong)
          }
        }
      }.toSet
    }
    for (l <- Seq(2, 3, 5)) {
      val docs = sample(docGen, 40).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "tokens")
      val w = graft.dedup.ExactSubstr.windowHashes(df, "doc_id", "tokens", l)
      val dup = w.groupBy("h").count().where(col("count") >= 2).select("h")
      val got = graft.dedup.ExactSubstr.spans(df, "doc_id", "tokens", l, dup)
        .select(col("doc").cast("long"), col("span_idx"), col("span_start"),
          col("span_end"), col("span_len"), col("n_windows"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === model(docs, l), s"L=$l")
      // structural invariants: spans within a doc never overlap and
      // every span is at least one window long
      got.groupBy(_._1).foreach { case (_, ss) =>
        val sorted = ss.toSeq.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Seq(x, y) => assert(y._3 >= x._4, s"overlap: $x $y")
          case _ =>
        }
        sorted.foreach(sp => assert(sp._5 >= l && sp._6 >= 1))
      }
    }
  }
}
