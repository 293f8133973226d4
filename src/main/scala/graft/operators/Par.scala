package graft.operators

/** Overlap INDEPENDENT Spark jobs from a small driver-side pool —
  * optimization-guide §2.6: Spark's scheduler happily runs several jobs
  * at once inside one application; actions are only sequential because
  * driver code calls them sequentially. A multi-arm query (advisor
  * dials, shard-vs-whole drift gates, independent state-family builds)
  * whose arms each end in a small eager materialization leaves most of
  * the cluster idle through each arm's stage tails; submitting the arms
  * from a few threads back-fills that idle capacity with the next arm's
  * tasks. Default FIFO scheduling gives the earlier arm's tasks
  * resources first — exactly the back-fill behaviour wanted — and the
  * RESULT of each arm is unchanged: only the driver-side call order
  * overlaps, never what any arm computes.
  *
  * Scale shape: the same property holds on a cluster (the guide's
  * worked example overlaps per-day jobs to fill executor tails); 2-4
  * jobs in flight is enough to fill a tail without arms starving each
  * other, so `parallelism` defaults to 4 and callers pass their arm
  * count when smaller.
  *
  * Error contract: the first failing arm's ORIGINAL exception is
  * rethrown (unwrapped from the pool's ExecutionException) so
  * `require(...)` contract failures inside an arm surface exactly as
  * they would sequentially; remaining arms still run to completion
  * before the rethrow (they share the session — cancelling them
  * mid-action could poison unrelated state writes).
  */
object Par {

  /** Run `thunks` concurrently (at most `parallelism` in flight) and
    * return their results in input order. Sequential fast path for one
    * thunk — no pool, no wrapping.
    */
  def run[A](thunks: Seq[() => A], parallelism: Int = 4): Seq[A] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(t => t())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, thunks.size)))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] { def call(): A = t() })
      }
      // collect every outcome BEFORE throwing: arms share the session
      val outcomes = futs.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
        }
      }
      outcomes.collectFirst { case Left(e) => e }.foreach(throw _)
      outcomes.collect { case Right(a) => a }
    } finally pool.shutdown()
  }

  /** Two-arm convenience: `(a, b)` computed concurrently. */
  def both[A, B](a: () => A, b: () => B): (A, B) = {
    val r = run[Any](Seq(() => a(), () => b()), 2)
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
