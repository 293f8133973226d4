package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: one JSON line with per-query wall seconds at the sf
  * given by SPARK_GRAFT_SF_DIR. Methodology:
  *  - queries run in name order (deterministic),
  *  - an uncounted warmup primes the JVM/codegen/parquet-footer paths so
  *    the first real query isn't charged for session startup,
  *  - each query materializes fully through the `noop` sink (a bare
  *    `count()` would let Catalyst prune projections and under-measure
  *    map-heavy queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (not timed): codegen + shuffle machinery + parquet readers
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.names.foreach {
      case "events" => Tables.events(spark, sfDir).count() // needs nanosAsLong conf
      case t        => Tables.read(spark, sfDir, t).count()
    }

    // best of 3 measured reps per query: scheduler/GC transients on this
    // shared box swing single runs several-fold (observed: a 0.4s
    // map-side query reading 4.4s inside a noise window — best-of-2 was
    // not enough to dodge multi-minute windows). Data caches are cleared
    // before every rep (only JIT warmth persists), so each rep executes
    // the full pipeline from parquet.
    // a failed rep records the -1 sentinel (NOT its elapsed time): a
    // query that throws must be visible in the JSON, never a silent
    // near-zero contribution to the total
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = reps.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
