package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: does `BandedIndex`'s chunk-hash bucket partitioning pay
  * at scale? The catalog exercises the index at sf0.1 (~60k docs);
  * the 100 TB claim is that an admission SCREEN's cost scales with
  * the probe's buckets, not the corpus — a small probe (the per-doc /
  * small-batch ingest screen) collects its ≤ B bucket ids driver-side
  * and opens only those partitions of each segment. This main builds
  * synthetic indexes of growing corpus size at B = 256 and, per size:
  *
  *  - `screen_pruned` — the shipped [[graft.dedup.BandedIndex.screen]]
  *    (bucket partition filter), probing a FIXED 10-doc fresh batch
  *    (2 of them copies of the corpus's planted boilerplate template,
  *    so candidates exist and grow with the corpus);
  *  - `screen_fullscan` — the same blocking computed off
  *    `liveBands(buckets = None)` (every bucket file of every segment
  *    opened) — equal-results-checked against the pruned path once
  *    per size before timing;
  *  - `refresh` — a FIXED 2000-doc batch against the stored index
  *    (must be flat in corpus size: only the batch is signed).
  *
  * Usage: `runMain graft.ProfileBandedIndex [sizes] [reps]` — sizes
  * comma-separated doc counts, default `200000,800000,3200000`
  * (× 60 tokens/doc; every 100th doc is the shared template); prints
  * one PROFILE line per rep and a JSON summary (median).
  */
object ProfileBandedIndex {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0)
                 else "200000,800000,3200000")
      .split(",").map(_.trim.toLong).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.{BandedIndex, Dedup}

    val B = 256
    // deterministic synthetic docs: 60 tokens each; every 100th doc
    // carries the SHARED template token set (the near-dup population a
    // screen exists to catch), the rest are unique-ish
    def corpus(n: Long, from: Long = 0L): DataFrame =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        expr("""CASE WHEN id % 100 = 0
                THEN transform(sequence(0, 59), j -> concat('tpl', j))
                ELSE transform(sequence(0, 59), j ->
                  concat('u', id, '_', j)) END""").as("tokens"))

    // fixed 10-doc fresh batch: ids far beyond any corpus; docs ending
    // in 0/1 are template copies (candidates), the rest unique
    def fresh(seed: Long): DataFrame =
      spark.range(10).select((col("id") + 900000000L + seed * 100)
          .as("doc_id"),
        expr("""CASE WHEN id < 2
                THEN transform(sequence(0, 59), j -> concat('tpl', j))
                ELSE transform(sequence(0, 59), j ->
                  concat('f', id, '_', j)) END""").as("tokens"))

    // the full-scan twin of screen(): identical blocking, no bucket
    // partition filter on the stored side
    def fullScanAt(dir: String, f: DataFrame, payloadCol: String,
                   nBands: Int, rowsPerBand: Int, dims: Int): DataFrame = {
      val rows = BandedIndex.bandRows(f, "doc_id", payloadCol,
        nBands, rowsPerBand, dims)
      val stored = BandedIndex.liveBands(spark, dir).get
        .select(col("band"), col("chunk"), col("id"))
      rows.alias("f")
        .join(stored.alias("c"),
          col("f.band") === col("c.band") &&
            col("f.chunk") === col("c.chunk"))
        .select(col("f.id").as("id_new"), col("c.id").as("id_corpus"))
        .distinct()
    }
    def fullScan(dir: String, f: DataFrame): DataFrame =
      fullScanAt(dir, f, "tokens", 4, 2, dims = 0)

    def summarize(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("id_new") * 31 + col("id_corpus"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def scanStats(df: DataFrame): (Long, Long) =
      graft.plans.FileScans.selected(df, Some("bands"))

    def timed(tag: String, n: Long)(f: Int => Unit): Double = {
      val ts = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f(i)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $tag corpus=$n rep $i: $s%.2f s")
        s
      }.sorted
      ts(ts.length / 2)
    }

    val results = sizes.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pbi_$n").toString + "/st"
      val tBuild = {
        val t0 = System.nanoTime()
        BandedIndex.build(corpus(n), "doc_id", "tokens", dir, buckets = B)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE build corpus=$n: $tBuild%.2f s")
      // equal-results check once, outside the timers
      val f0 = fresh(0)
      val viaState = summarize(
        BandedIndex.screen(f0, "doc_id", "tokens", dir))
      val viaFull = summarize(fullScan(dir, f0))
      val viaOneShot = summarize(Dedup.incrementalNearDupCandidates(
        corpus(n), f0, "doc_id", "tokens", 4, 2))
      require(viaState == viaFull && viaState == viaOneShot &&
        viaState._1 > 0,
        s"pruned/full/one-shot disagree at n=$n: " +
          s"$viaState / $viaFull / $viaOneShot")
      val (fP, bP) = scanStats(
        BandedIndex.screen(f0, "doc_id", "tokens", dir))
      val (fF, bF) = scanStats(fullScan(dir, f0))
      println(f"PROFILE scan corpus=$n pruned: $fP files ${bP / 1e6}%.1f MB" +
        f" | fullscan: $fF files ${bF / 1e6}%.1f MB")
      val tS = timed("screen_pruned", n) { i =>
        BandedIndex.screen(fresh(i), "doc_id", "tokens", dir)
          .collect(): Unit
      }
      val tFu = timed("screen_fullscan", n) { i =>
        fullScan(dir, fresh(i)).collect(): Unit
      }
      val tR = timed("refresh", n) { i =>
        BandedIndex.refresh(corpus(2000, from = n + i.toLong * 2000),
          "doc_id", "tokens", dir, deltaId = s"rep$i")
      }
      (n, tBuild, tS, tFu, tR, bP, bF, viaState._1)
    }
    def j(sel: ((Long, Double, Double, Double, Double, Long, Long,
                 Long)) => Double) =
      results.map(r => f""""${r._1}":${sel(r)}%.2f""").mkString(",")
    println(s"""{"metric":"banded_index_screen_by_corpus","buckets":$B,""" +
      s""""build":{${j(_._2)}},"screen_pruned":{${j(_._3)}},""" +
      s""""screen_fullscan":{${j(_._4)}},"refresh_2k":{${j(_._5)}},""" +
      s""""scan_mb_pruned":{${j(_._6 / 1e6)}},""" +
      s""""scan_mb_fullscan":{${j(_._7 / 1e6)}},""" +
      s""""n_candidates":{${j(_._8.toDouble)}}}""")

    // ---- the VECTOR dial: same state machine, SRP chunks over 64-dim
    // embeddings, banded 4 × 16 (65536-value chunks — selective enough
    // that only PLANTED dups collide; random 4-bit chunks would candidate
    // every probe against 1/16 of the corpus, which is LSH physics, not
    // an index property). Synthetic corpus: every vector is one of 48
    // cluster sign-patterns (copies — magnitude exact, so chunks are
    // cluster-determined); every 100th vector is the shared TEMPLATE
    // pattern the fresh probes duplicate; fresh uniques use 8 disjoint
    // patterns, so their buckets are (near-)empty on the corpus side.
    val dims = 64
    def vecExpr(cSeed: String): String =
      s"""transform(sequence(0, ${dims - 1}), j ->
          cast((($cSeed * 31 + j * 17) % 101 - 50) / 50.0 as float))"""
    def vcorpus(n: Long, from: Long = 0L): DataFrame =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        expr(s"""CASE WHEN id % 100 = 0 THEN ${vecExpr("99")}
                 ELSE ${vecExpr("(id % 48)")} END""").as("vec"))
    def vfresh(seed: Long): DataFrame =
      spark.range(10).select((col("id") + 900000000L + seed * 100)
          .as("doc_id"),
        expr(s"""CASE WHEN id < 2 THEN ${vecExpr("99")}
                 ELSE ${vecExpr("(48 + id)")} END""").as("vec"))
    def vOneShot(n: Long, f: DataFrame): DataFrame = {
      val c = BandedIndex.bandRows(vcorpus(n), "doc_id", "vec", 4, 16, dims)
      val fr = BandedIndex.bandRows(f, "doc_id", "vec", 4, 16, dims)
      fr.alias("f").join(c.alias("c"),
          col("f.band") === col("c.band") &&
            col("f.chunk") === col("c.chunk"))
        .select(col("f.id").as("id_new"), col("c.id").as("id_corpus"))
        .distinct()
    }
    val vresults = sizes.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pbiv_$n").toString + "/st"
      val tBuild = {
        val t0 = System.nanoTime()
        BandedIndex.build(vcorpus(n), "doc_id", "vec", dir,
          nBands = 4, rowsPerBand = 16, buckets = B, dims = dims)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE srp_build corpus=$n: $tBuild%.2f s")
      val f0 = vfresh(0)
      val viaState = summarize(BandedIndex.screen(f0, "doc_id", "vec", dir))
      val viaFull = summarize(fullScanAt(dir, f0, "vec", 4, 16, dims))
      val viaOneShot = summarize(vOneShot(n, f0))
      require(viaState == viaFull && viaState == viaOneShot &&
        viaState._1 > 0,
        s"srp pruned/full/one-shot disagree at n=$n: " +
          s"$viaState / $viaFull / $viaOneShot")
      val (fP, bP) = scanStats(BandedIndex.screen(f0, "doc_id", "vec", dir))
      val (fF, bF) = scanStats(fullScanAt(dir, f0, "vec", 4, 16, dims))
      println(f"PROFILE srp_scan corpus=$n pruned: $fP files " +
        f"${bP / 1e6}%.1f MB | fullscan: $fF files ${bF / 1e6}%.1f MB")
      val tS = timed("srp_screen_pruned", n) { i =>
        BandedIndex.screen(vfresh(i), "doc_id", "vec", dir).collect(): Unit
      }
      val tFu = timed("srp_screen_fullscan", n) { i =>
        fullScanAt(dir, vfresh(i), "vec", 4, 16, dims).collect(): Unit
      }
      val tR = timed("srp_refresh", n) { i =>
        BandedIndex.refresh(vcorpus(2000, from = n + i.toLong * 2000),
          "doc_id", "vec", dir, deltaId = s"rep$i")
      }
      (n, tBuild, tS, tFu, tR, bP, bF, viaState._1)
    }
    def jv(sel: ((Long, Double, Double, Double, Double, Long, Long,
                  Long)) => Double) =
      vresults.map(r => f""""${r._1}":${sel(r)}%.2f""").mkString(",")
    println(s"""{"metric":"banded_index_srp_screen_by_corpus",""" +
      s""""buckets":$B,"dims":$dims,""" +
      s""""build":{${jv(_._2)}},"screen_pruned":{${jv(_._3)}},""" +
      s""""screen_fullscan":{${jv(_._4)}},"refresh_2k":{${jv(_._5)}},""" +
      s""""scan_mb_pruned":{${jv(_._6 / 1e6)}},""" +
      s""""scan_mb_fullscan":{${jv(_._7 / 1e6)}},""" +
      s""""n_candidates":{${jv(_._8.toDouble)}}}""")
    spark.stop()
  }
}
