package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: ExactSubstr at the PAPER's dial. The catalog exercises
  * L = 6/8 on ~50-token testdata docs (q268/q274); Lee et al. run
  * L ≈ 50 tokens on web corpora with documents orders of magnitude
  * longer. This main measures the operator where the window explode
  * actually hurts — synthetic documents of `docLen` tokens (default
  * 2000) with a planted 100-token boilerplate block in every 10th doc
  * — at L = 50: build (window hash + count + state write), a 2%-delta
  * refresh, and the full span pass, plus the row counts that size the
  * shuffles (n−L+1 windows per doc; the hash equi-join is the only
  * corpus-sized exchange; islands merge per-doc).
  *
  * Usage: `runMain graft.ProfileExactSubstr [nDocs] [docLen] [L] [reps]`
  * — defaults 10000 × 2000 tokens at L = 50 (≈ 19.5M windows, ~2×
  * sf0.1's token volume); prints PROFILE lines and a JSON summary
  * (median of reps).
  */
object ProfileExactSubstr {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 10000L
    val docLen = if (args.length > 1) args(1).toInt else 2000
    val l = if (args.length > 2) args(2).toInt else 50
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.ExactSubstr

    // deterministic corpus: 6-hex tokens unique per (doc, position);
    // every 10th doc carries the shared 100-token boilerplate block at
    // positions 500-599 (the cross-document duplication the method
    // exists to excise). Materialized once — generation is outside
    // every timer.
    val toks = spark.range(nDocs).select(col("id").as("doc_id"),
        expr(s"""transform(sequence(1, $docLen), j ->
          CASE WHEN id % 10 = 0 AND j BETWEEN 500 AND 599
               THEN substr(md5(concat('b:', j)), 1, 6)
               ELSE substr(md5(concat('d:', id, ':', j)), 1, 6) END)""")
          .as("tokens"))
      .repartition(cpus.toInt)
      .localCheckpoint()
    val hist = toks.where(col("doc_id") % 50 =!= 7)
    val delta = toks.where(col("doc_id") % 50 === 7) // the 2% batch

    val nWindows = ExactSubstr.windowHashes(toks, "doc_id", "tokens", l).count()

    def time(tag: String)(body: () => Unit): Double = {
      val times = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $tag rep $i: $s%.2f s")
        s
      }.sorted
      times(times.length / 2)
    }

    def freshDir(): String =
      java.nio.file.Files.createTempDirectory("graft_pes").toString + "/st"
    val tBuild = time("build") { () =>
      ExactSubstr.build(hist, "doc_id", "tokens", l, freshDir())
    }
    // each refresh rep gets its own pre-built state (built OUTSIDE the
    // timer) — re-committing the same delta into one dir would
    // double-count its windows and pollute the span measurement below
    val rdirs = (1 to reps).map { _ =>
      val d = freshDir()
      ExactSubstr.build(hist, "doc_id", "tokens", l, d)
      d
    }
    var rep = 0
    val tRefresh = time("refresh_2pct") { () =>
      rep += 1
      ExactSubstr.refresh(delta, "doc_id", "tokens", rdirs(rep - 1),
        deltaId = "d1")
    }
    val rdir = rdirs.head // exactly one refresh applied
    val nDup = ExactSubstr.dupHashes(spark, rdir).count()
    var spanRows = 0L
    val tSpans = time("spans_full") { () =>
      spanRows = ExactSubstr.spans(toks, "doc_id", "tokens", l,
        ExactSubstr.dupHashes(spark, rdir)).count()
    }
    println(s"""{"metric":"exactsubstr_at_L$l","n_docs":$nDocs,"doc_len":$docLen,""" +
      s""""n_windows":$nWindows,"n_dup_hashes":$nDup,"n_spans":$spanRows,""" +
      f""""build_sec":$tBuild%.2f,"refresh_sec":$tRefresh%.2f,"spans_sec":$tSpans%.2f}""")
    spark.stop()
  }
}
