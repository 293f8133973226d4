package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: does `Bm25State`'s bucket-partitioned postings layout pay
  * at scale? The catalog exercises the index at sf0.1 (~60k docs),
  * where a query's cost is dominated by fixed overheads; the 100 TB
  * claim is that a k-term query's cost scales with the TERMS' postings
  * (≤ k of B bucket directories opened per segment — a file skip),
  * not the corpus. This main builds synthetic indexes of growing
  * corpus size at B = 64 and times, per size:
  *
  *  - `query_pruned`  — the shipped [[graft.text.Bm25State.topK]]
  *    path (bucket partition filter + pushed term filter);
  *  - `query_fullscan` — the same score computed off
  *    `livePostings(terms = None)` with only the term filter, i.e.
  *    what the layout would cost WITHOUT partitioning (every bucket
  *    file of every segment opened) — equal-results-checked against
  *    the pruned path once per size before timing;
  *  - `refresh` — a FIXED 2000-doc batch against the stored index
  *    (must be flat in corpus size: only the batch is tokenized).
  *
  * Usage: `runMain graft.ProfileBm25 [sizes] [reps]` — sizes
  * comma-separated doc counts, default `200000,800000,3200000`
  * (× 60 tokens/doc over a 50k-term vocabulary); prints one PROFILE
  * line per rep and a JSON summary (median).
  */
object ProfileBm25 {
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
    import graft.text.Bm25State

    val V = 50000 // vocabulary
    val terms = Seq("t17", "t4242", "t31337") // the 3-term query
    // deterministic synthetic docs: 60 tokens each, uniform-ish vocab
    def corpus(n: Long, from: Long = 0L): DataFrame =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        expr(s"transform(sequence(0, 59), j -> " +
          s"concat('t', pmod(id * 31 + j * 7919 + j * j, $V)))")
          .as("tokens"))

    // the full-scan twin of topK: same arithmetic (dl off the posting
    // rows), no bucket filter — what the layout would cost WITHOUT the
    // partitioning (every bucket file of every segment opened)
    def fullScan(dir: String): DataFrame = {
      val tf = Bm25State.livePostings(spark, dir).get
        .where(col("term").isin(terms: _*))
      val stats = Bm25State.stats(spark, dir)
      val dft = tf.groupBy("term").agg(countDistinct("doc").as("df"))
      tf.join(broadcast(dft), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc"),
          (log((col("nd") - col("df") + 0.5) / (col("df") + 0.5) + 1)
            * (col("tf") * 2.2)
            / (col("tf") + lit(1.2)
                * (lit(1) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
            .as("s"))
        .groupBy("doc").agg(round(sum("s"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc")).limit(10)
    }

    // scan footprint: number + byte size of the files the plan's scans
    // SELECTED (post partition-pruning) — deterministic plan metrics,
    // not IO timing (a warm page cache hides the read cost wall-clock
    // that a 100 TB cold store charges in full). `part = None` counts
    // EVERY file scan in the plan (the per-query TOTAL selected bytes).
    def scanStats(df: DataFrame, part: Option[String]): (Long, Long) =
      graft.plans.FileScans.selected(df, part)

    def timed(tag: String, n: Long)(f: => Unit): Double = {
      val ts = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $tag corpus=$n rep $i: $s%.2f s")
        s
      }.sorted
      ts(ts.length / 2)
    }

    val results = sizes.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pbm_$n").toString + "/st"
      val tBuild = {
        val t0 = System.nanoTime()
        Bm25State.build(corpus(n), "doc_id", "tokens", dir, buckets = 64)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE build corpus=$n: $tBuild%.2f s")
      // equal-results check once, outside the timers
      val pruned0 = Bm25State.topK(spark, dir, terms, 10)
        .collect().map(r => (r.get(0), r.getDouble(1))).toSeq
      val full0 = fullScan(dir)
        .collect().map(r => (r.get(0), r.getDouble(1))).toSeq
      require(pruned0 == full0 && pruned0.nonEmpty,
        s"pruned and full-scan paths disagree at n=$n")
      val (fP, bP) = scanStats(Bm25State.topK(spark, dir, terms, 10),
        Some("postings"))
      val (fF, bF) = scanStats(fullScan(dir), Some("postings"))
      // the serving path (per-cut precomputed stats): its TOTAL
      // selected bytes across EVERY scan in the plan — before the dl
      // denormalization this included the corpus-sized doclen table
      // per query; now it must equal the pruned postings buckets
      val preStats = Bm25State.stats(spark, dir).localCheckpoint()
      val servePlan = Bm25State.topK(spark, dir, terms, 10,
        precomputedStats = Some(preStats))
      require(servePlan.collect().map(r => (r.get(0), r.getDouble(1)))
        .toSeq == pruned0, s"precomputed-stats path disagrees at n=$n")
      val (fT, bT) = scanStats(servePlan, None)
      // what the pre-denormalization layout charged per query on the
      // dl side: the whole live doclen table
      val (_, bDl) = scanStats(
        Bm25State.liveDocLens(spark, dir).get.groupBy().count(),
        Some("doclen"))
      println(f"PROFILE scan corpus=$n pruned: $fP files ${bP / 1e6}%.1f MB" +
        f" | fullscan: $fF files ${bF / 1e6}%.1f MB" +
        f" | serve TOTAL: $fT files ${bT / 1e6}%.1f MB" +
        f" (old dl side: ${bDl / 1e6}%.1f MB)")
      val tP = timed("query_pruned", n) {
        Bm25State.topK(spark, dir, terms, 10).collect(): Unit
      }
      val tF = timed("query_fullscan", n) {
        fullScan(dir).collect(): Unit
      }
      var rep = 0
      val tR = timed("refresh", n) {
        rep += 1
        Bm25State.refresh(corpus(2000, from = n + rep.toLong * 2000),
          "doc_id", "tokens", dir, deltaId = s"rep$rep")
      }
      // the writeSplits layout: same buckets, each spread over ~32
      // files — the corpus-sized write parallelizes AND the pruned
      // read stops bin-packing a whole bucket into one input split
      val sdir = java.nio.file.Files
        .createTempDirectory(s"graft_pbms_$n").toString + "/st"
      Bm25State.build(corpus(n), "doc_id", "tokens", sdir, buckets = 64,
        writeSplits = 32)
      require(Bm25State.topK(spark, sdir, terms, 10)
        .collect().map(r => (r.get(0), r.getDouble(1))).toSeq == pruned0,
        s"writeSplits layout disagrees at n=$n")
      val tPs = timed("query_pruned_split32", n) {
        Bm25State.topK(spark, sdir, terms, 10).collect(): Unit
      }
      (n, tBuild, tP, tF, tR, bP, bF, bT, bDl, tPs)
    }
    def j(sel: ((Long, Double, Double, Double, Double, Long, Long, Long,
                 Long, Double)) => Double) =
      results.map(r => f""""${r._1}":${sel(r)}%.2f""").mkString(",")
    println(s"""{"metric":"bm25_query_sec_by_corpus","buckets":64,""" +
      s""""build":{${j(_._2)}},"query_pruned":{${j(_._3)}},""" +
      s""""query_fullscan":{${j(_._4)}},"refresh_2k":{${j(_._5)}},""" +
      s""""query_pruned_split32":{${j(_._10)}},""" +
      s""""scan_mb_pruned":{${j(_._6 / 1e6)}},""" +
      s""""scan_mb_fullscan":{${j(_._7 / 1e6)}},""" +
      s""""scan_mb_serve_total":{${j(_._8 / 1e6)}},""" +
      s""""scan_mb_old_dl_side":{${j(_._9 / 1e6)}}}""")
    spark.stop()
  }
}
