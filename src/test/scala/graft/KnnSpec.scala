package graft

import graft.ann.Knn
import org.apache.spark.sql.functions._

class KnnSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f)),
    (4L, Array(2.0f, 0.0f, 0.0f))   // colinear with 1
  ).toDF("vec_id", "embedding")

  test("dot and norm on float arrays are exact in double space") {
    val r = emb.where(col("vec_id") === 3L)
      .select(Knn.dot(col("embedding"), col("embedding")).as("d"),
        Knn.l2norm(col("embedding")).as("n")).collect()(0)
    assert(r.getDouble(0) === 2.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(2)) < 1e-12)
  }

  test("brute-force kNN ranks colinear vector first") {
    val knn = Knn.cosineKnn(emb, "vec_id", "embedding",
        col("vec_id") === 1L, k = 3)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect()
    assert(knn.length === 3)
    assert(knn(0)._3 === 4L)           // cos(1,4) = 1.0
    assert(knn(0)._4 === 1.0)
    assert(knn(1)._3 === 3L)           // cos(1,3) = 1/√2
    assert(math.abs(knn(1)._4 - 0.707107) < 1e-6)
    assert(knn(2)._3 === 2L)           // orthogonal
    assert(knn(2)._4 === 0.0)
  }

  test("string-id kNN takes the mergeable aggregation path with window-identical order") {
    val sEmb = Seq(
      ("q", Array(1.0f, 1.0f, 0.0f)),
      ("10", Array(1.0f, 0.0f, 0.0f)),  // ties "2" on cosine
      ("2", Array(2.0f, 0.0f, 0.0f)),   // "10" < "2" in byte order (≠ numeric)
      ("z", Array(0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val knn = Knn.cosineKnn(sEmb, "vec_id", "embedding", col("vec_id") === "q", k = 3)
    assert(knn.queryExecution.executedPlan.collect {
      case p if p.nodeName == "Window" => p
    }.isEmpty, "string ids must use the partial-aggregable top-k, not a window sort")
    val rows = knn.orderBy("rk").as[(String, Int, String, Double)].collect()
    assert(rows.map(_._3).toSeq === Seq("10", "2", "z"),
      "cosine tie must break by UTF-8 byte order of the id")
    assert(math.abs(rows(0)._4 - 0.707107) < 1e-6)
    assert(math.abs(rows(2)._4 - 0.5) < 1e-6)
  }

  test("decimal-id kNN rides the long buffer via the unscaled value, mergeable path") {
    // decimal(10,2) ids incl. a negative one; the cosine TIE between the
    // two colinear candidates must break by NUMERIC decimal order
    // (-7.25 < 3.10), which the unscaled-long encoding preserves
    val dEmb = Seq(
      ("0.50", Array(1.0f, 1.0f, 0.0f)),   // query
      ("3.10", Array(1.0f, 0.0f, 0.0f)),
      ("-7.25", Array(2.0f, 0.0f, 0.0f)),  // colinear with 3.10
      ("99.99", Array(0.0f, 1.0f, 1.0f))
    ).toDF("raw", "embedding")
      .select(col("raw").cast("decimal(10,2)").as("vec_id"), col("embedding"))
    val knn = Knn.cosineKnn(dEmb, "vec_id", "embedding",
      col("vec_id") === lit(BigDecimal("0.50")), k = 3)
    assert(knn.queryExecution.executedPlan.collect {
      case p if p.nodeName == "Window" => p
    }.isEmpty, "decimal(<=18) ids must use the partial-aggregable top-k, not a window")
    val rows = knn.orderBy("rk").collect()
      .map(r => (r.getDecimal(2).toPlainString, r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq("-7.25", "3.10", "99.99"),
      "cosine tie must break by numeric decimal order")
    assert(math.abs(rows(0)._2 - 0.707107) < 1e-6)
    assert(knn.schema("cand_id").dataType.typeName === "decimal(10,2)",
      "ids must decode back to their original decimal type")
  }

  test("decimal(18,10)-id kNN decodes fractional digits 7-10 exactly") {
    // ids whose digits 7-10 after the point are NONZERO: a decode that
    // clamps the quotient to decimal(38,6) (the old (38,0)-numerator
    // overflow) silently rounds these — the decoded cand_id would come
    // back as e.g. 3.0000000000 instead of 3.0000000003
    val dEmb = Seq(
      ("1.0000000001", Array(1.0f, 1.0f, 0.0f)),   // query
      ("3.0000000003", Array(1.0f, 0.0f, 0.0f)),
      ("-7.0000000007", Array(2.0f, 0.0f, 0.0f)),  // colinear with 3.0000000003
      ("99.0000000099", Array(0.0f, 1.0f, 1.0f))
    ).toDF("raw", "embedding")
      .select(col("raw").cast("decimal(18,10)").as("vec_id"), col("embedding"))
    val knn = Knn.cosineKnn(dEmb, "vec_id", "embedding",
      col("vec_id") === lit(BigDecimal("1.0000000001")), k = 3)
    assert(knn.queryExecution.executedPlan.collect {
      case p if p.nodeName == "Window" => p
    }.isEmpty, "decimal(18,10) ids must still take the mergeable path")
    val rows = knn.orderBy("rk").collect().map(_.getDecimal(2).toPlainString)
    assert(rows.toSeq === Seq("-7.0000000007", "3.0000000003", "99.0000000099"),
      "digits 7-10 of the decimal id must survive the buffer round-trip exactly")
  }

  test("timestamp-id kNN rides the long buffer via epoch micros, mergeable path") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val tEmb = Seq(
      (ts("2024-01-01 00:00:00"), Array(1.0f, 1.0f, 0.0f)),  // query
      (ts("2024-06-15 12:30:00.000001"), Array(1.0f, 0.0f, 0.0f)),
      (ts("2023-03-01 08:00:00"), Array(2.0f, 0.0f, 0.0f)),  // colinear, EARLIER
      (ts("2025-12-31 23:59:59"), Array(0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val knn = Knn.cosineKnn(tEmb, "vec_id", "embedding",
      col("vec_id") === ts("2024-01-01 00:00:00"), k = 3)
    assert(knn.queryExecution.executedPlan.collect {
      case p if p.nodeName == "Window" => p
    }.isEmpty, "timestamp ids must use the partial-aggregable top-k, not a window")
    val rows = knn.orderBy("rk").collect().map(_.getTimestamp(2))
    assert(rows.toSeq === Seq(ts("2023-03-01 08:00:00"),
      ts("2024-06-15 12:30:00.000001"), ts("2025-12-31 23:59:59")),
      "cosine tie must break chronologically; micro-precision must survive the buffer")
  }

  test("wide-decimal ids still fall back to the (loud) window path, same results") {
    val dEmb = Seq(("1", Array(1.0f, 1.0f, 0.0f)), ("2", Array(1.0f, 0.0f, 0.0f)),
      ("3", Array(0.0f, 1.0f, 0.0f)))
      .toDF("raw", "embedding")
      .select(col("raw").cast("decimal(38,10)").as("vec_id"), col("embedding"))
    val knn = Knn.cosineKnn(dEmb, "vec_id", "embedding",
      col("vec_id") === lit(BigDecimal(1)), k = 2)
    assert(knn.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty, "decimal(38) has no long encoding — must take the window fallback")
    val rows = knn.orderBy("rk").collect().map(r => r.getDecimal(2).longValue)
    assert(rows.toSeq === Seq(2L, 3L))
  }

  test("two-table retrieval kNN searches only the corpus side, mergeable path") {
    val queries = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val knn = Knn.retrieveKnn(queries, emb, "vec_id", "embedding", k = 2)
    assert(knn.queryExecution.executedPlan.collect {
      case p if p.nodeName == "Window" => p
    }.isEmpty, "retrieval must use the partial-aggregable top-k, not a window sort")
    val rows = knn.as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // query 100 = x-axis: colinear 1 and 4 tie at 1.0 → id order; corpus only
    assert(rows(100L).map(_._1) === Seq(1L, 4L))
    assert(rows(100L).forall(_._2 === 1.0))
    // query 200 = y-axis: vec 2 exact, then 3 at 1/√2
    assert(rows(200L).map(_._1) === Seq(2L, 3L))
    assert(math.abs(rows(200L)(1)._2 - 0.707107) < 1e-6)
    // a query id colliding with a corpus id is NOT self-excluded (two tables)
    val collide = Knn.retrieveKnn(
      Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      emb, "vec_id", "embedding", k = 1).as[(Long, Int, Long, Double)].collect()
    assert(collide.head._3 === 1L && collide.head._4 === 1.0)
  }

  test("IVF two-table retrieval probes buckets; no broadcast of either relation needed") {
    // corpus buckets under centroids {1 (x-axis), 2 (y-axis)}: vec 3 at
    // 45° ties 0.707 on both and max_by breaks to the smaller centroid,
    // so bucket 1 = {1, 3, 4}, bucket 2 = {2}
    val queries = Seq((100L, Array(1.0f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val got = Knn.ivfRetrieve(queries, emb, "vec_id", "embedding",
        col("vec_id").isin(1L, 2L), k = 2, nprobe = 1)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect()
    // query ~x-axis probes bucket 1 only: colinear 1 and 4 tie → id order
    assert(got.map(_._3).toSeq === Seq(1L, 4L))
    assert(got.forall(r => math.abs(r._4 - 0.995037) < 1e-6))
    // nprobe=2 reaches bucket 2's member as well
    val wide = Knn.ivfRetrieve(queries, emb, "vec_id", "embedding",
        col("vec_id").isin(1L, 2L), k = 4, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(wide.map(_._3).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("near-dup pairs by cosine threshold") {
    val pairs = Knn.nearDupPairs(emb, "vec_id", "embedding", 0.99)
      .as[(Long, Long, Double)].collect().toList
    assert(pairs === List((1L, 4L, 1.0)))
  }

  test("SRP-blocked near-dups are a subset of all-pairs with high recall on testdata") {
    val embDf = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .where(col("vec_id") < 100)
    val all = Knn.nearDupPairs(embDf, "vec_id", "embedding", 0.25)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Knn.srpNearDupPairs(embDf, "vec_id", "embedding", 64, 0.25)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked.subsetOf(all), "blocking must never invent pairs")
    assert(all.nonEmpty)
    // 4 bands × 4 bits at threshold 0.25 should keep most true pairs
    assert(blocked.size.toDouble / all.size > 0.5,
      s"recall too low: ${blocked.size}/${all.size}")
  }

  test("SRP candidate-fraction diagnostic measures the dial on the synthetic corpus") {
    val embDf = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .where(col("vec_id") < 100)
    val stats = Knn.srpCandidateStats(embDf, "vec_id", "embedding", 64)
      .collect()(0)
    val (n, cand, poss, frac) = (stats.getLong(0), stats.getLong(1),
      stats.getLong(2), stats.getDouble(3))
    assert(poss === n * (n - 1) / 2)
    assert(frac === cand.toDouble / poss, "fraction must be the exact division")
    // near-uniform synthetic vectors at the 8x4 default: ~40% candidate
    // fraction (documented LSH physics, srpNearDupPairs calibration
    // note). The band is the ALARM contract: a dial drift that
    // degenerates blocking toward all-pairs busts the upper bound.
    assert(frac > 0.2 && frac < 0.6, s"8x4 fraction drifted: $frac")
    // longer bands (same total bits, 4x8) are strictly more selective
    val tight = Knn.srpCandidateStats(embDf, "vec_id", "embedding", 64,
      nBands = 4, rowsPerBand = 8).collect()(0).getDouble(3)
    assert(tight < frac,
      s"4x8 must block harder than 8x4: $tight vs $frac")
  }

  test("SRP bucket cap drops a degenerate clone-flood bucket, keeps real pairs") {
    // 30 identical vectors land in one bucket of every band — the k²
    // hazard the cap exists for. With the cap they produce no candidate
    // pairs; the genuine near-dup pair (different bucket, size 2)
    // survives untouched.
    val clones = (0L until 30L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
    val pair = Seq((100L, Array(0.0f, 1.0f, 0.10f)), (101L, Array(0.0f, 1.0f, 0.11f)))
    val emb = (clones ++ pair).toDF("vec_id", "embedding")
    val capped = Knn.srpNearDupPairs(emb, "vec_id", "embedding",
        dims = 3, threshold = 0.9, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)),
      "capped blocking must drop the clone flood and keep the real pair")
    val uncapped = Knn.srpNearDupPairs(emb, "vec_id", "embedding",
      dims = 3, threshold = 0.9).count()
    assert(uncapped > 400, s"without the cap the clone bucket k²'s: got $uncapped")
  }

  test("k-means recovers two well-separated clusters from poor seeds") {
    val pts = Seq(
      (0L, Array(1.0f, 0.02f)), (1L, Array(0.9f, 0.05f)), (2L, Array(0.95f, 0.0f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.0f, 0.9f)), (5L, Array(0.02f, 0.95f))
    ).toDF("vec_id", "embedding")
    // seeds 0 and 3 sit one in each cluster
    val cents = Knn.kmeansCentroids(pts, "vec_id", "embedding",
        col("vec_id").isin(0L, 3L), iters = 3)
      .as[(Long, Array[Float])].collect().toMap
    assert(cents.keySet === Set(0L, 3L))
    // centroid 0 ≈ mean of cluster x, centroid 3 ≈ mean of cluster y
    assert(math.abs(cents(0L)(0) - (1.0 + 0.9 + 0.95) / 3) < 1e-6)
    assert(math.abs(cents(3L)(1) - (1.0 + 0.9 + 0.95) / 3) < 1e-6)
    // assignments against the trained codebook are clean
    val assignedVia = Knn.ivfAssign(pts, "vec_id", "embedding",
        col("vec_id").isin(0L, 3L))
      .as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L).forall(assignedVia(_) === 0L))
    assert(Seq(3L, 4L, 5L).forall(assignedVia(_) === 3L))
  }

  test("SemDeDup drops all but the min id per in-cluster near-dup group") {
    val pts = Seq(
      (0L, Array(1.0f, 0.02f)), (1L, Array(0.9f, 0.05f)), (2L, Array(0.95f, 0.0f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.0f, 0.9f)), (5L, Array(0.02f, 0.95f))
    ).toDF("vec_id", "embedding")
    // every in-cluster cosine is ≥ 0.9984; every cross-cluster one ≤ 0.08
    val dropped = Knn.semanticDedupDropped(pts, "vec_id", "embedding",
        col("vec_id").isin(0L, 3L), iters = 3, threshold = 0.998)
      .as[(Long, Long)].collect().sorted
    assert(dropped === Seq((0L, 1L), (0L, 2L), (3L, 4L), (3L, 5L)))
    // tighter threshold keeps more: only the two closest pairs still trip
    // (cos(0,2)=0.99980, cos(3,5)=0.99957, cos(4,5)=0.99977 — vs
    //  cos(0,1)=0.99937, cos(1,2)=0.99846, cos(3,4)=0.99875)
    val tight = Knn.semanticDedupDropped(pts, "vec_id", "embedding",
        col("vec_id").isin(0L, 3L), iters = 3, threshold = 0.9995)
      .as[(Long, Long)].collect().sorted
    assert(tight === Seq((0L, 2L), (3L, 5L)))
  }

  test("srp_chunks kernel ≡ the per-plane vec_dot spec, bit-exact across dials") {
    // adversarial-ish fixture: values straddling 0, repeated patterns,
    // a near-zero vector — anything that could flip a borderline sign
    // if the kernel's accumulation differed from FloatVecDot's
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(16) { d =>
        ((i * 31 + d * 17) % 101 - 50) / 50.0f +
          (if (d == (i % 16).toInt) 1e-7f else 0f)
      })
    }.toDF("vec_id", "embedding")
    for ((nBands, rows) <- Seq((8, 4), (16, 2), (4, 16))) {
      val kernel = graft.ann.Knn.srpChunkRows(vecs, "vec_id", "embedding",
          16, nBands, rows)
        .select(col("id").cast("long"), col("band"),
          col("chunk").cast("int"))
        .as[(Long, Int, Int)].collect().toSet
      val spec = graft.ann.Knn.srpBandsSpec(vecs, "vec_id", "embedding",
          16, nBands, rows)
        .select(col("vec_id").cast("long"), col("band"),
          col("chunk").cast("int"))
        .as[(Long, Int, Int)].collect().toSet
      assert(kernel === spec,
        s"kernel and spec must band identically at ${nBands}x$rows")
    }
  }
}
