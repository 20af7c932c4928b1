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

  test("knnGraph: hot-bucket cap drops the degenerate cluster, keeps the rest") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = e.selectExpr("size(embedding)").as[Int].head()
    // Plant a 12-member constant cluster on ids 1000-1011: every copy
    // lands in the SAME sign bucket of BOTH tables — the dedup-bound
    // corpus's worst case the cap exists for.
    val constV = typedLit((0 until dim).map(d => 0.25 + 0.01 * d))
    val planted = e.select($"vec_id", $"embedding".cast("array<double>"))
      .unionAll(spark.range(1000, 1012).select(
        $"id".as("vec_id"), constV.as("embedding")))
    val capped = Similarity.knnGraph(planted, "vec_id", "embedding", 3, dim,
      planes = 4, maxBucket = 8).cache()
    // cluster members meet ONLY in their (dropped) constant bucket →
    // no edge between any two of them survives
    val intra = capped.where($"query_id" >= 1000 && $"neighbor_id" >= 1000)
    assert(intra.count() == 0, "capped graph must drop intra-hot-cluster edges")
    // vectors outside the hot bucket keep their neighborhoods:
    // capping can only REMOVE candidates, never change survivors' cosines
    val uncapped = Similarity.knnGraph(planted, "vec_id", "embedding", 3, dim,
      planes = 4, maxBucket = Int.MaxValue)
    val join = capped.where($"query_id" < 1000).as("c")
      .join(uncapped.as("u"), Seq("query_id", "neighbor_id"))
      .where(abs($"c.cosine" - $"u.cosine") > 1e-12)
    assert(join.count() == 0, "surviving edges must carry identical cosines")
    // a no-op cap (every bucket under it) must be EXACTLY the uncapped graph
    val wide = Similarity.knnGraph(planted, "vec_id", "embedding", 3, dim,
      planes = 4, maxBucket = Int.MaxValue - 1)
    assert(wide.exceptAll(uncapped).isEmpty && uncapped.exceptAll(wide).isEmpty)
  }

  test("knnProbe over the materialized index reproduces knnGraph exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = e.selectExpr("size(embedding)").as[Int].head()
    // The streaming twin's claim: stateless probes of the capped index
    // emit the batch graph's pair set (equi-join cap equivalence), so
    // max-merge + top-k over the emissions equals knnGraph bit-for-bit.
    val ix = Similarity.knnIndexRelation(e, "vec_id", "embedding", dim,
      planes = 4)
    val probed = Similarity.knnProbe(e, ix, "vec_id", "embedding", dim,
      planes = 4)
      .groupBy($"query_id", $"neighbor_id")
      .agg(max($"cosine").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    val streamed = probed.withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
    val batch = Similarity.knnGraph(e, "vec_id", "embedding", 3, dim,
      planes = 4)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("recallAtK: perfect self-comparison, and misses stay visible at 0") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
      (2L, 22L)).toDF("query_id", "neighbor_id")
    // approx finds 2 of query 1's neighbors and none of query 2's
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact, 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((2L, 2.0 / 3)), s"partial hit: $out")
    assert(out(2L) == ((0L, 0.0)), "missed query must appear at recall 0")
    // exact vs itself = recall 1 everywhere
    val self = Similarity.recallAtK(exact, exact, 3)
      .select($"recall").as[Double].collect()
    assert(self.length == 2 && self.forall(_ == 1.0))
  }

  test("planesForN targets ~16 per bucket and floors at 4") {
    assert(Similarity.planesForN(100) == 4)
    assert(Similarity.planesForN(2000) == 6)      // floor(log2 2000)=10
    assert(Similarity.planesForN(100000) == 12)   // floor(log2 1e5)=16
    assert(Similarity.planesForN(1L << 40) == 36) // bucket count tracks n/16
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

  test("preview inspectors: shape diff + column changes as data") {
    // a plugin that filters rows, drops a column, retypes one, adds one
    object MutatingPlugin extends graft.sim.SimPlugin {
      override val name = "mutating"
      override val pluginType = "quotes"
      override def apply(df: org.apache.spark.sql.DataFrame,
                         params: Map[String, String]) =
        df.where(col("day") === 0).drop("ask")
          .withColumn("bid", col("bid").cast("float"))
          .withColumn("extra", lit(1))
    }
    PluginRegistry.register(MutatingPlugin)
    val quotes = MarketSim.simulateQuotes(spark, "T", days = 2, ticksPerDay = 100)
    val shape = PluginRegistry.previewSummaryDiff(quotes, "mutating")
      .as[(Long, Long, Int, Int, Long, Int)].head()
    assert(shape == ((200L, 100L, quotes.columns.length,
      quotes.columns.length, -100L, 0)))
    val changes = PluginRegistry.previewColumnChanges(quotes, "mutating")
      .as[(String, String, String, String)].collect().toSet
    assert(changes == Set(
      ("extra", "added", null, "int"),
      ("ask", "removed", "double", null),
      ("bid", "retyped", "double", "float")))
    // the numeric-change inspector tolerates the dropped/retyped columns
    val prev = PluginRegistry.previewPluginEffect(quotes, "mutating")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!prev.contains("ask") && prev.contains("bid_size"))
  }

  test("multi-ticker universe: one plan, independent walks per ticker") {
    val uni = MarketSim.simulateQuotes(spark, Seq("AAA", "BBB"), days = 1,
      ticksPerDay = 300, seed = 42L)
    val counts = uni.groupBy($"ticker").count().as[(String, Long)].collect().toMap
    assert(counts == Map("AAA" -> 300L, "BBB" -> 300L))
    // different row ids → different md5 draws → decorrelated walks
    val lastBid = uni.where($"day" === 0).groupBy($"ticker")
      .agg(max(struct($"ts", $"bid"))("bid").as("b")).as[(String, Double)]
      .collect().toMap
    assert(lastBid("AAA") != lastBid("BBB"))
    // exactly ONE shuffle: the (ticker, day) walk window
    val nEx = uni.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange "))
    assert(nEx == 1, s"expected 1 exchange, saw $nEx")
  }

  test("reference sim schema: conditions/indicators/tape columns") {
    val q = MarketSim.simulateQuotes(spark, "T", days = 1, ticksPerDay = 2000)
    // quotes superset the reference column list (sim/quotes.py:72-91)
    val refQuoteCols = Seq("ticker", "ask_exchange", "ask_price", "ask_size",
      "bid_exchange", "bid_price", "bid_size", "conditions", "indicators",
      "participant_timestamp", "sequence_number", "sip_timestamp", "tape",
      "trf_timestamp")
    assert(refQuoteCols.forall(q.columns.contains))
    val rows = q.select($"exchange", $"tape", $"conditions", $"indicators")
      .as[(Int, Int, String, String)].collect()
    for ((ex, tape, cond, ind) <- rows) {
      // assign_tape mapping (sim/common.py:18)
      ex match {
        case 10 | 11 | 1 => assert(tape == 1)
        case 12 | 2      => assert(tape == 3)
        case 201 | 202   => assert(tape >= 1 && tape <= 3)
        case _           => assert(tape == 2)
      }
      assert(cond.toInt >= 1 && cond.toInt <= 19)
      assert(ind == "" || Seq("4", "12", "13").contains(ind))
    }
    // distribution shape: "19" with p=0.8, "" with p=0.9
    val n = rows.length.toDouble
    assert(rows.count(_._3 == "19") / n > 0.7)
    assert(rows.count(_._4 == "") / n > 0.8)
    // weighted exchange mix: Nasdaq(12, w=.25) must beat AMEX(1, w=.05)
    val exCounts = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(exCounts(12) > exCounts(1))
    // trades superset the reference column list (sim/trades.py:80-98)
    val t = MarketSim.simulateTrades(q, targetVolumePerDay = 100000L)
    val refTradeCols = Seq("ticker", "conditions", "correction", "exchange",
      "id", "participant_timestamp", "price", "sequence_number",
      "sip_timestamp", "size", "tape", "trf_id", "trf_timestamp")
    assert(refTradeCols.forall(t.columns.contains))
    val ids = t.select($"id").as[Long].collect().sorted
    assert(ids.head == 1000000L && ids.toSeq == (ids.head until ids.head + ids.length).toSeq)
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
