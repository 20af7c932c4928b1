package graft

import org.apache.spark.sql.functions._

/** Round-15 (second optimization round) guards.
  *
  * 1. SMAX overflow guards (r14 verdict #3): the wide-unroll grids
  *    (eod_pca_factor / eod_tangency / eod_risk_parity, and
  *    markovAttribution's transient-state grid) pivot key-count-bounded
  *    state onto a static 1..SMAX position grid. A key cardinality
  *    beyond SMAX used to fall off the `when(fi === i …)` pivot
  *    aggregations SILENTLY — wrong answer, no error. The guards added
  *    in r15 raise instead; these tests prove the failure is loud and
  *    that the in-contract cardinality still passes.
  *
  * 2. Shared landing-dir staging (r14 verdict #1): streamReplay now
  *    stages each source table once per process and shares the
  *    read-only landing dir across replays; checkpoints stay fresh.
  *    Re-running the same streaming query twice must produce the
  *    identical relation (no offset/state carry-over), and a SECOND
  *    query over the same table must see every row.
  */
class Round15Spec extends SparkSpec {

  /** events-table twin with `n` distinct event types, written as a
    * single-file-per-table dir the SparkEntry loaders accept.
    */
  private def eventsDir(nTypes: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15-ev").toString
    val s = spark
    import s.implicits._
    val rows = for {
      t <- 0 until nTypes
      i <- 0 until 12
    } yield (
      (t * 12 + i).toLong,                                   // event_id
      java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
      (i % 5).toLong,                                        // user_id
      s"type_$t",                                            // event_type
      // genuinely noisy prices (a near-deterministic series quantizes
      // to ~zero variance and the clamped Jacobi denominators blow up
      // the decimal grid — not the failure under test here)
      50.0 + ((t * 7919 + i * 104729) % 997) / 10.0,         // value
      """{"k": 1}""")                                        // props
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def guardFires(query: String, dir: String): Boolean =
    try {
      SparkEntry.queries(query)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      false
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("") +
          Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
        assert(msg.contains("SMAX"),
          s"$query failed but not via the SMAX guard: $e")
        true
    }

  test("wide-unroll grids fail loudly past SMAX and pass within it") {
    val over = eventsDir(8)   // 8 series > SMAX = 7
    val under = eventsDir(7)  // exactly at the grid bound: must pass
    for (q <- Seq("eod_pca_factor", "eod_tangency", "eod_risk_parity")) {
      assert(guardFires(q, over), s"$q did not raise with 8 series")
      assert(!guardFires(q, under), s"$q raised with 7 series")
    }
  }

  test("markovAttribution raises past its transient-state grid") {
    val s = spark
    import s.implicits._
    def journeys(nChannels: Int) = {
      val rows = for {
        u <- 0 until 10
        (ch, i) <- ((0 until nChannels).map(c => s"ch_$c") :+ "purchase").zipWithIndex
      } yield ((u * 100 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"),
        u.toLong, ch, 1.0, "{}")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // 7 channels + start = 8 transient states > SMAX = 7 → loud failure
    val e = intercept[Throwable] {
      graft.operators.Events.markovAttribution(journeys(7), "purchase")
        .write.format("noop").mode("overwrite").save()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("SMAX"), s"failed but not via the SMAX guard: $e")
    // 6 channels + start = 7 fits the grid exactly → computes
    val ok = graft.operators.Events.markovAttribution(journeys(6), "purchase")
    assert(ok.count() == 6)
  }

  test("shared landing dir: replays stay deterministic across reruns") {
    val dir = "/root/testdata/sf0.001"
    def rows(q: String): Set[String] =
      SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).toSet
    // Two consecutive runs share the staged landing dir but fresh
    // checkpoints: identical output, every row seen both times.
    val first = rows("streaming_twap")
    val second = rows("streaming_twap")
    assert(first.nonEmpty && first == second)
    // A different query over the SAME staged table also sees all rows.
    val scd = rows("streaming_scd2")
    assert(scd.nonEmpty)
  }
}
