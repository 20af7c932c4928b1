package graft

import org.apache.spark.sql.functions._

import graft.operators.{Resample, Similarity}
import graft.sim.{MarketSim, PluginRegistry, WideSpreadPlugin}

class Operators2Spec extends SparkSpec {
  import spark.implicits._

  test("IVF ANN finds the identical vector with full probing") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" === 7)
    val out = Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 1,
        nCells = 8, nProbe = 8)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect()
    assert(out.length == 1 && out(0)._1 == 7L && out(0)._2 == 1.0)
  }

  test("IVF with partial probing stays a subset of brute-force candidates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" < 3)
    val ivf = Similarity.ivfTopK(q, e.where($"vec_id" >= 3), "vec_id",
      "embedding", 3, nCells = 8, nProbe = 2)
    assert(ivf.count() <= 9) // ≤ k per query; approximate by design
  }

  test("resampleStat generalizes the bootstrap to any aggregate") {
    val df = (1 to 100).map(i => ("s1", i, i.toDouble)).toDF("k", "o", "v")
    val out = Resample.resampleStat(df, "v", Seq("k"), Seq("o"), 5)(v => max(v))
      .as[(String, Long, Double)].collect()
    assert(out.length == 5)
    assert(out.forall { case (_, _, mx) => mx >= 1.0 && mx <= 100.0 })
    // deterministic: same seed → same draws
    val out2 = Resample.resampleStat(df, "v", Seq("k"), Seq("o"), 5)(v => max(v))
      .as[(String, Long, Double)].collect()
    assert(out.sameElements(out2))
  }

  test("keyed resample: independent series per key, decorrelated draws") {
    // two keys with IDENTICAL values: per-key md5 seeds must give them
    // DIFFERENT bootstrap draws (a shared seed would correlate fleets
    // of assets), while each key's own draws stay deterministic.
    val df = (1 to 50).flatMap(i =>
      Seq(("a", i, i.toDouble), ("b", i, i.toDouble))).toDF("k", "o", "v")
    val out = Resample.resampleMean(df, "v", Seq("k"), Seq("o"), 4)
      .as[(String, Long, Double)].collect()
    assert(out.length == 8)
    val byKey = out.groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
    assert(byKey("a") != byKey("b"), "identical series must draw differently per key")
  }

  test("resampleStats computes several named stats in one aggregation pass") {
    val df = (1 to 100).map(i => ("s1", i, i.toDouble)).toDF("k", "o", "v")
    val out = Resample.resampleStats(df, "v", Seq("k"), Seq("o"), 3)(
      "lo" -> (v => min(v)), "hi" -> (v => max(v)))
    assert(out.columns.toSeq == Seq("k", "trial", "lo", "hi"))
    val rows = out.as[(String, Long, Double, Double)].collect()
    assert(rows.length == 3 && rows.forall { case (_, _, lo, hi) => lo <= hi })
  }

  test("sim plugins apply in order by type (wide_spread widens quotes)") {
    PluginRegistry.register(WideSpreadPlugin)
    val quotes = MarketSim.simulateQuotes(spark, "T", days = 1, ticksPerDay = 200)
    val widened = PluginRegistry.applyAll(quotes,
      Seq("wide_spread" -> Map("factor" -> "3.0")), "quotes")
    val before = quotes.agg(avg($"ask" - $"bid")).as[Double].head()
    val after = widened.agg(avg($"ask" - $"bid")).as[Double].head()
    assert(after > before * 2.0 && after < before * 4.0)
    // trades-typed config list leaves quotes untouched
    val same = PluginRegistry.applyAll(quotes,
      Seq("wide_spread" -> Map("factor" -> "3.0")), "trades")
    assert(same.agg(avg($"ask" - $"bid")).as[Double].head() == before)
  }

  test("hot-bucket caps bound the quadratic pair blowup") {
    import graft.operators.Dedup
    // 20 docs all sharing the stop-shingle "the end of day", plus one
    // genuine near-dup pair.
    val docs = ((1 to 20).map(i => (i.toLong, s"doc number $i reports the end of day")) ++
      Seq((100L, "a very unique duplicated text body here"),
        (101L, "a very unique duplicated text body here"))).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.0)
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.0,
      maxPostings = 5)
    assert(capped.count() < uncapped.count())
    // the true duplicate pair survives the cap
    assert(capped.where($"id_a" === 100 && $"id_b" === 101).count() == 1)
    val lshCapped = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 5)
    assert(lshCapped.where($"id_a" === 100 && $"id_b" === 101).count() == 1)
  }

  test("previewPluginEffect reports per-column mean deltas as data") {
    PluginRegistry.register(WideSpreadPlugin)
    val quotes = MarketSim.simulateQuotes(spark, "T", days = 1, ticksPerDay = 200)
    val prev = PluginRegistry.previewPluginEffect(quotes, "wide_spread",
        Map("factor" -> "3.0"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(prev("bid")._4 < 0 && prev("ask")._4 > 0) // spread widened
    assert(math.abs(prev("day")._4) < 1e-12)         // untouched column
  }

  test("event windows are deterministic, bounded, and inside the day") {
    val w = MarketSim.eventWindows(spark, days = 10, numEvents = 3,
      minDurUs = 600000000L, maxDurUs = 3600000000L)
    val rows = w.as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 30)
    for ((day, idx, start, end) <- rows) {
      val dayStart = 1712928600000000L + day * 86400000000L
      assert(idx >= 0 && idx < 3)
      assert(start >= dayStart && end <= dayStart + 23400000000L)
      assert(end - start >= 600000000L && end - start < 3600000000L)
    }
    val again = MarketSim.eventWindows(spark, days = 10, numEvents = 3,
      minDurUs = 600000000L, maxDurUs = 3600000000L)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._2)).sameElements(again.sortBy(r => (r._1, r._2))))
  }

  test("flagEventTicks marks exactly the ticks inside their day's windows") {
    val quotes = MarketSim.simulateQuotes(spark, "T", days = 3, ticksPerDay = 500)
    val w = MarketSim.eventWindows(spark, days = 3, numEvents = 3,
      minDurUs = 600000000L, maxDurUs = 3600000000L)
    val windows = w.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._3, r._4))).toMap
    val flagged = MarketSim.flagEventTicks(quotes, w)
      .select($"day", unix_micros($"ts").as("ts_us"), $"in_event")
      .as[(Long, Long, Boolean)].collect()
    assert(flagged.length == 1500)
    for ((day, ts, in) <- flagged) {
      val expected = windows.getOrElse(day, Array.empty)
        .exists { case (s, e) => ts >= s && ts < e }
      assert(in == expected, s"day=$day ts=$ts")
    }
    assert(flagged.exists(_._3), "no tick ever inside an event window")
  }
}
