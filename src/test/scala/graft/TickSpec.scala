package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Tick

class TickSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  test("tick rule signs up/down/flat, first row 0") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 11.0), ("a", 3, 11.0), ("a", 4, 9.0))
      .toDF("k", "t", "p")
    val dir = df.select($"t", Tick.tickRule($"p", w).as("d"))
      .orderBy($"t").select($"d").as[Int].collect()
    assert(dir.sameElements(Array(0, 1, 0, -1)))
  }

  test("vwap = sum(pv)/sum(v)") {
    val df = Seq(("a", 10.0, 100.0), ("a", 20.0, 300.0)).toDF("k", "p", "v")
    val got = df.groupBy($"k").agg(Tick.vwap($"p", $"v").as("vw"))
      .select($"vw").as[Double].head()
    assert(math.abs(got - (10 * 100 + 20 * 300) / 400.0) < 1e-12)
  }

  test("realized volatility = sqrt(sum(logret^2))") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 101.0), ("a", 3, 99.5)).toDF("k", "t", "p")
    val got = df.withColumn("lr", Tick.microReturns($"p", w))
      .groupBy($"k").agg(Tick.realizedVolatility($"lr").as("rv"))
      .select($"rv").as[Double].head()
    val lr1 = math.log(101.0 / 100.0); val lr2 = math.log(99.5 / 101.0)
    assert(math.abs(got - math.sqrt(lr1 * lr1 + lr2 * lr2)) < 1e-12)
  }

  test("Kyle's lambda recovers an exact linear impact, null on flat flow") {
    // dp = 0.5·sv exactly → λ = 0.5
    val sv = Seq(100.0, -200.0, 300.0, -50.0)
    val df = sv.zipWithIndex.map { case (v, i) => ("a", i, 0.5 * v, v) }
      .toDF("k", "t", "dp", "sv")
    val got = df.groupBy($"k").agg(Tick.kyleLambda($"dp", $"sv").as("l"))
      .select($"l").as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12)
    val flat = Seq(("a", 0.1, 7.0), ("a", -0.2, 7.0)).toDF("k", "dp", "sv")
    assert(flat.groupBy($"k").agg(Tick.kyleLambda($"dp", $"sv").as("l"))
      .select($"l").as[Option[Double]].head().isEmpty)
  }

  test("Roll spread recovers a planted bid-ask bounce, null without one") {
    // Pure bounce around a flat mid: trades alternate ±s/2 → Δp
    // alternates ±s with cov(Δp, lagΔp) = −s² (population); with
    // covar_samp over the 4 (dp, dpl) pairs the estimate is 2√(s²·4/3)
    // for this exact alternating pattern — compute it directly.
    val dp = Seq(1.0, -1.0, 1.0, -1.0, 1.0)
    val rows = dp.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ("a", i, b, a) }.toSeq
    val df = rows.toDF("k", "t", "dp", "dpl")
    val got = df.groupBy($"k").agg(Tick.rollSpread($"dp", $"dpl").as("s"))
      .select($"s").as[Double].head()
    // cov_samp of {(−1,1),(1,−1),(−1,1),(1,−1)} = Σ(dp−0)(dpl−0)/3 = −4/3
    assert(math.abs(got - 2.0 * math.sqrt(4.0 / 3.0)) < 1e-12, s"got $got")
    // trending prices (positive serial covariance: dp tracks dpl) →
    // null, not NaN
    val trend = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0))
      .toDF("k", "dp", "dpl")
    assert(trend.groupBy($"k").agg(Tick.rollSpread($"dp", $"dpl").as("s"))
      .select($"s").as[Option[Double]].head().isEmpty)
  }

  test("Amihud illiquidity is mean |ret| per dollar, scaled 1e6") {
    val df = Seq(("a", 0.01, 1000.0), ("a", -0.02, 2000.0))
      .toDF("k", "ret", "dv")
    val got = df.groupBy($"k")
      .agg(Tick.amihudIlliquidity($"ret", $"dv").as("il"))
      .select($"il").as[Double].head()
    val want = (0.01 / 1000.0 * 1e6 + 0.02 / 2000.0 * 1e6) / 2
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  test("effective spread: mid fills are 0, ask fills equal the quoted spread") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val quotes = Seq(("u", ts(0), 99.0, 101.0)).toDF("k", "t", "bid", "ask")
    val trades = Seq(("u", ts(1), 100.0), ("u", ts(2), 101.0))
      .toDF("k", "t", "price")
    val j = graft.operators.AsOfJoin.backward(trades, quotes, "k", "t",
      Seq("bid", "ask"))
    val eff = j.withColumn("eff",
        abs($"price" - ($"right_bid" + $"right_ask") / 2) * 2)
      .select($"price", $"eff").as[(Double, Double)].collect().toMap
    assert(eff(100.0) == 0.0, "a mid fill has zero effective spread")
    assert(eff(101.0) == 2.0, "an ask fill pays the full quoted spread")
  }

  test("MAD and winsorized mean on a hand case with one outlier") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 1000.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i, x) }.toDF("k", "t", "x")
    val wk = Window.partitionBy($"k")
    val row = df
      .withColumn("med", graft.functions.Stats.quantile($"x", 0.5).over(wk))
      .withColumn("lo", graft.functions.Stats.quantile($"x", 0.05).over(wk))
      .withColumn("hi", graft.functions.Stats.quantile($"x", 0.95).over(wk))
      .groupBy($"k")
      .agg(graft.functions.Stats.madFromMedian($"x", $"med").as("mad"),
        graft.functions.Stats.winsorizedMean($"x", $"lo", $"hi").as("wm"))
      .select($"mad", $"wm").as[(Double, Double)].head()
    // med=3; |x-3| = {2,1,0,1,997} → median 1
    assert(math.abs(row._1 - 1.0) < 1e-12)
    // p05 = 1.2, p95 = 800.8 (R-7) → clamped {1.2,2,3,4,800.8}
    val lo = 1.0 + 0.2 * 1.0; val hi = 4.0 + 0.8 * 996.0
    val wm = (lo + 2 + 3 + 4 + hi) / 5
    assert(math.abs(row._2 - wm) < 1e-9, s"got ${row._2}, want $wm")
  }
}
