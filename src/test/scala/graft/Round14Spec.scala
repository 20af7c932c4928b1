package graft

import org.apache.spark.sql.functions._

/** Round-14 wave: windowed Theil–Sen (op 403) against a JVM
  * recomputation of the trailing-window slope grid, and the pHash
  * dedup eval (op 404) against a JVM brute recount of both the exact
  * Hamming≤10 truth set and the 2-of-4 band candidate set.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stats_theil_sen_windowed: slopes match a JVM trailing-window recount") {
    val W = 14
    val daily = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"value")
      .as[(String, Long, Double)].collect()
      .groupBy { case (t, us, _) =>
        (t, math.floor(us.toDouble / 86400000000.0).toLong) }
      .map { case ((t, d), rs) =>
        val q = rs.map(r => math.floor(r._3 * 1e6 + 0.5).toLong)
        (t, d, q.sum.toDouble / q.length / 1e6)
      }.toSeq
    def medianInterp(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val got = SparkEntry.queries("stats_theil_sen_windowed")(spark, dir)
      .select($"event_type", $"end_day", $"n_pairs", $"ts_slope")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val byType = daily.groupBy(_._1)
    got.foreach { case (t, w, nPairs, slope) =>
      val days = byType(t).filter { case (_, d, _) => d > w - W && d <= w }
      val slopes = for {
        (_, di, mi) <- days; (_, dj, mj) <- days if di < dj
      } yield (mj - mi) / (dj - di).toDouble
      // the grid is bounded by construction: ≤ W(W−1)/2 pairs
      assert(nPairs == slopes.size && nPairs <= W * (W - 1) / 2,
        s"$t@$w n_pairs $nPairs vs ${slopes.size}")
      val exp = math.round(medianInterp(slopes.toArray) * 1e6) / 1e6
      assert(math.abs(slope - exp) < 2e-6, s"$t@$w slope $slope vs $exp")
    }
    // every emitted end day is a real day of that series
    val realDays = byType.map { case (t, rs) =>
      t -> rs.map(_._2).toSet }
    got.foreach { case (t, w, _, _) =>
      assert(realDays(t).contains(w), s"$t emitted phantom end day $w") }
  }

  test("dedup_eval_phash: recall/precision match a JVM brute recount") {
    // the dedup corpus the queries run on: raw documents plus the
    // planted near-dup (+1000000, one appended token, every 50th) and
    // exact-dup (+2000000, every 97th) families
    val d = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val corpus = d
      .unionAll(d.where($"doc_id" % 50 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" the")).as("text")))
      .unionAll(d.where($"doc_id" % 97 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"), $"text"))
    val hb = graft.operators.Multimodal.dHashBands(
        graft.operators.Multimodal.withSyntheticPng(
          corpus, "doc_id", "text"),
        "doc_id", "image")
      .select($"doc_id", $"h0", $"h1", $"h2", $"h3")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    def ham(a: (Long, Long, Long, Long, Long),
            b: (Long, Long, Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4) +
        java.lang.Long.bitCount(a._5 ^ b._5)
    val truth = (for {
      i <- hb.indices; j <- (i + 1) until hb.length
      if ham(hb(i), hb(j)) <= 10
    } yield (hb(i)._1, hb(j)._1)).toSet
    def bands(x: (Long, Long, Long, Long, Long)) =
      Seq(x._2, x._3, x._4, x._5)
    val cand = (for {
      i <- hb.indices; j <- (i + 1) until hb.length
      ba = bands(hb(i)); bb = bands(hb(j))
      // 2-of-4 AND-composition: some unordered band PAIR matches whole
      if (for { p <- 0 until 4; q <- (p + 1) until 4 }
        yield ba(p) == bb(p) && ba(q) == bb(q)).exists(identity)
    } yield (hb(i)._1, hb(j)._1)).toSet
    val hit = cand.intersect(truth)
    val got = SparkEntry.queries("dedup_eval_phash")(spark, dir)
      .select($"n_truth", $"n_found", $"n_hit", $"precision", $"recall")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == truth.size, s"n_truth ${got._1} vs ${truth.size}")
    assert(got._2 == cand.size, s"n_found ${got._2} vs ${cand.size}")
    assert(got._3 == hit.size, s"n_hit ${got._3} vs ${hit.size}")
    assert(math.abs(got._4 -
      math.round(hit.size.toDouble / cand.size * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got._5 -
      math.round(hit.size.toDouble / truth.size * 1e6) / 1e6) < 1e-9)
    // the measured story: banding is high-precision, low-recall on the
    // radius-10 shell — the exact-verify step is structural, and the
    // recall number is REAL, not the pigeonhole guarantee it isn't
    assert(got._5 < 1.0 || truth.size == hit.size)
  }
}
