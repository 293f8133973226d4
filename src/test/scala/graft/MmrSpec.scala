package graft

import graft.ann.Mmr
import org.apache.spark.sql.functions._

/** Mmr.rerank semantics: redundancy penalty, deterministic tie-breaks,
  * pool exhaustion, and full agreement with a driver-side brute-force
  * greedy on a seeded pool. (Value-level parity is q151's DuckDB gate.)
  */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private def cands(rows: (Long, Long, Double)*) =
    rows.toDF("q_id", "cand_id", "rel")

  /** Symmetric sims table from one-direction pairs. */
  private def sims(rows: (Long, Long, Long, Double)*) =
    (rows ++ rows.map(r => (r._1, r._3, r._2, r._4)))
      .toDF("q_id", "id_a", "id_b", "s")

  test("a near-duplicate of the first pick loses to a diverse candidate") {
    // B is almost as relevant as A but nearly identical to it; C is
    // less relevant but fresh. Plain top-2 keeps (A, B); MMR keeps (A, C).
    val c = cands((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.5))
    val s = sims((1L, 10L, 11L, 0.99), (1L, 10L, 12L, 0.1), (1L, 11L, 12L, 0.1))
    val got = Mmr.rerank(c, s, k = 2).orderBy("pick")
      .select("pick", "cand_id", "score").as[(Int, Long, Double)].collect()
    assert(got === Seq((1, 10L, 0.9), (2, 12L, 0.5 * 0.5 - 0.5 * 0.1)))
  }

  test("score ties break to the smallest cand_id, every round") {
    // two identical twins of the winner: equal rel, equal penalty
    val c = cands((1L, 30L, 0.8), (1L, 21L, 0.6), (1L, 20L, 0.6))
    val s = sims((1L, 30L, 21L, 0.2), (1L, 30L, 20L, 0.2), (1L, 20L, 21L, 0.0))
    val got = Mmr.rerank(c, s, k = 2).orderBy("pick")
      .select("pick", "cand_id").as[(Int, Long)].collect()
    assert(got === Seq((1, 30L), (2, 20L)))
  }

  test("an exhausted pool stops picking instead of inventing rows") {
    val c = cands((1L, 1L, 0.9), (1L, 2L, 0.8), (2L, 7L, 0.7))
    val s = sims((1L, 1L, 2L, 0.3))
    val got = Mmr.rerank(c, s, k = 4)
    // query 1 has 2 candidates, query 2 has 1 (and no sims rows at all)
    assert(got.where(col("q_id") === 1).count() === 2)
    assert(got.where(col("q_id") === 2).count() === 1)
  }

  test("greedy agrees with a driver-side brute force on a seeded pool") {
    val qs = 1L to 3L
    val pool = 0L until 6L
    def h(parts: Any*): Double = { // deterministic pseudo-random in [0,1)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString(":").getBytes("UTF-8"))
      (java.nio.ByteBuffer.wrap(md).getInt(0) & 0x7fffffff) / Int.MaxValue.toDouble
    }
    val cRows = for (q <- qs; c <- pool) yield (q, c, math.rint(h("rel", q, c) * 1e6) / 1e6)
    val sRows = for (q <- qs; a <- pool; b <- pool if a < b)
      yield (q, a, b, math.rint(h("sim", q, a, b) * 1e6) / 1e6)
    val got = Mmr.rerank(cands(cRows.toSeq: _*), sims(sRows.toSeq: _*),
        k = 4, lambda = 0.5)
      .select("q_id", "pick", "cand_id").as[(Long, Int, Long)].collect().toSet

    val rel = cRows.map(r => (r._1, r._2) -> r._3).toMap
    val sim = (sRows ++ sRows.map(r => (r._1, r._3, r._2, r._4)))
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val want = qs.flatMap { q =>
      var picked = Vector.empty[Long]
      (1 to 4).flatMap { t =>
        val open = pool.filterNot(picked.contains)
        if (open.isEmpty) None else {
          val best = open.minBy { c =>
            val score = if (t == 1) rel((q, c))
              else 0.5 * rel((q, c)) - 0.5 * picked.map(p => sim((q, c, p))).max
            (2.0 - score, c) // highest score, smallest id
          }
          picked :+= best
          Some((q, t, best))
        }
      }
    }.toSet
    assert(got === want)
  }
}
