package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: is `ClusterState.refresh` flat in CORPUS size? Round 10
  * flagged the old implementation's one weakness — it
  * `localCheckpoint`ed the full (id, label) table per batch, a
  * corpus-sized read AND write per ingest at 10¹¹ docs. Round 11
  * replaced it with ONE scan of the stored table against a broadcast
  * delta-bounded probe (endpoint ids + overlap guard share it) and
  * delta-bounded writes. This main measures what remains: per-refresh
  * wall time for a FIXED batch against stored label tables of
  * growing corpus size (built once per size, outside the timer). The
  * remaining growth is the unavoidable one read of the label parquet;
  * there is no corpus-sized materialization or write anywhere
  * (ClusterStateSpec plan-asserts exactly that with the listener
  * capture).
  *
  * Usage: `runMain graft.ProfileClusterRefresh [sizes] [batch] [reps]`
  * — sizes comma-separated, default `1000000,3000000,10000000`;
  * prints one PROFILE line per rep and a JSON summary (median).
  */
object ProfileClusterRefresh {
  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0)
                 else "1000000,3000000,10000000")
      .split(",").map(_.trim.toLong).toSeq
    val batch = if (args.length > 1) args(1).toInt else 1000
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.ClusterState

    val results = sizes.map { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pcr_$n").toString + "/st"
      // corpus of n docs with a sparse planted pair structure (every
      // 1000th doc pairs with its neighbor) — label-table size is the
      // variable under test, cluster structure is constant
      val ids = spark.range(n).select(col("id"))
      val pairs = spark.range(n / 1000)
        .select((col("id") * 1000).as("id_a"), (col("id") * 1000 + 1).as("id_b"))
      ClusterState.build(ids, "id", pairs, dir) // outside the timer
      val times = (1 to reps).map { i =>
        // a FIXED-size batch of new docs, half pairing into the stored
        // corpus (forces the endpoint projection + a remap check), ids
        // disjoint per rep (the overlap guard is part of the timed path)
        val base = n + i.toLong * batch * 2
        val newIds = spark.range(base, base + batch).select(col("id"))
        val newPairs = spark.range(base, base + batch / 2)
          .select(col("id").as("id_a"), ((col("id") - base) * 997 % n).as("id_b"))
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        ClusterState.refresh(newIds, "id", newPairs, dir, deltaId = s"rep$i")
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE refresh corpus=$n rep $i: $s%.2f s")
        s
      }.sorted
      // the decremental path: a fixed 100-victim erasure batch hitting
      // the planted pairs (forces the cluster-local re-CC, not just the
      // removals write) — two label scans + one edge scan per delete
      val delTimes = (1 to reps).map { i =>
        val victims = spark.range(100)
          .select((col("id") * 1000 + (if (i % 2 == 0) 0 else 1)
            + i.toLong / 2 * 200000).as("id"))
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        ClusterState.delete(victims, dir, deltaId = s"del$i")
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE delete corpus=$n rep $i: $s%.2f s")
        s
      }.sorted
      (n, times(times.length / 2), delTimes(delTimes.length / 2))
    }
    val json = results.map { case (n, s, _) => f""""$n":$s%.2f""" }
      .mkString(",")
    val djson = results.map { case (n, _, s) => f""""$n":$s%.2f""" }
      .mkString(",")
    println(s"""{"metric":"cluster_refresh_sec_by_corpus","batch":$batch,""" +
      s""""median":{$json},"delete_median":{$djson}}""")
    spark.stop()
  }
}
