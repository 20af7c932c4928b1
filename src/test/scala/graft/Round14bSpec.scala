package graft

/** Round-14 wave 2: job-count regression guard for the wide-unroll
  * family. The r14 rewrites of the four iterative-state queries
  * (Markov absorption, tangency Jacobi, PCA power iteration, risk
  * parity) replaced per-iteration materialization (one-plus Spark
  * jobs per sweep — 24 for Markov) with a single unrolled scalar
  * projection chain. Catalyst can't see that invariant, so this spec
  * pins it: each query must complete within a small fixed job budget,
  * far below what any per-iteration-materialization regression would
  * cost. Bounds are ~2× the measured counts — loose enough for plan
  * jitter (AQE stages, broadcasts), tight enough that re-introducing
  * per-sweep checkpoints (Markov: +24 jobs) fails immediately.
  */
class Round14bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def jobCount(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener events are posted asynchronously; give the bus a
      // beat to drain (the private listenerBus.waitUntilEmpty is
      // inaccessible outside org.apache.spark)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(l)
    jobs.get
  }

  private def run(name: String): Int = jobCount {
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
  }

  test("wide-unroll queries stay within their job budgets") {
    // measured (AQE stage materializations + broadcasts + the two
    // pinned checkpoints): markov 18, the three portfolio ops 14.
    // Budgets leave +4/+10 headroom but sit BELOW measured + the
    // smallest regression (+5 per-iterate checkpoints for PCA, +6
    // tangency, +8 risk parity, +24 markov sweeps).
    val budgets = Seq(
      "events_markov_attribution" -> 28,
      "eod_tangency" -> 19,
      "eod_pca_factor" -> 18,
      "eod_risk_parity" -> 19)
    val over = budgets.flatMap { case (name, budget) =>
      val n = run(name)
      info(s"$name: $n jobs (budget $budget)")
      if (n > budget) Some(s"$name ran $n jobs > budget $budget") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }
}
