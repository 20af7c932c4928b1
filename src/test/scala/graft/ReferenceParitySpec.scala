package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Eod
import graft.syntax._

/** Behavior parity against the reference's own pinned expectations
  * (reference: tests/expr/test_expr_core.py, run on
  * tests/data/test_data.csv — the same file, read in place, read-only).
  * Tolerances mirror the reference's aae(..., 3/4) assertions.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val prices: DataFrame = spark.read
    .option("header", "true")
    .csv("/root/reference/tests/data/test_data.csv")
    .select(
      to_timestamp($"Date", "M/d/yyyy").as("date"),
      $"AAPL".cast("double"), $"MSFT".cast("double"), $"C".cast("double"))
    .withColumn("k", lit(1))
    .cache()

  private val w = Window.partitionBy($"k").orderBy($"date")

  private def aae(actual: Double, expected: Double, dp: Int = 3): Unit =
    assert(math.abs(actual - expected) < math.pow(10.0, -dp) * 0.51,
      s"$actual != $expected (±1e-$dp)")

  test("to_returns matches pinned AAPL values (test_expr_core.py:14)") {
    val r = prices.select($"AAPL".toReturns(w)).orderBy(monotonically_increasing_id())
    val vals = prices.select($"date", $"AAPL".toReturns(w).as("r")).orderBy($"date")
      .select($"r").as[Option[Double]].collect()
    assert(vals(0).isEmpty)
    aae(vals(1).get, -0.019)
    aae(vals(9).get, -0.022)
  }

  test("price_index and rebase match pinned values (test_expr_core.py:33/50)") {
    val pi = prices
      .withColumn("r", $"AAPL".toReturns(w))
      .select($"date", Eod.toPriceIndex($"r", w).as("pi")).orderBy($"date")
      .select($"pi").as[Double].collect()
    aae(pi(0), 100.0); aae(pi(9), 91.366)
    val rb = prices.select($"date", $"AAPL".rebase(w).as("rb")).orderBy($"date")
      .select($"rb").as[Double].collect()
    aae(rb(0), 100.0); aae(rb(9), 91.366)
  }

  test("drawdowns + max drawdown over first 10 rows (test_expr_core.py:59/102)") {
    val dd = prices.select($"date", $"AAPL".toDrawdownSeries(w).as("dd"))
      .orderBy($"date").select($"dd").as[Double].collect()
    aae(dd(0), 0.0); aae(dd(1), -0.019); aae(dd(9), -0.086)
    val first10 = prices.orderBy($"date").limit(10)
      .withColumn("ddA", $"AAPL".toDrawdownSeries(w))
      .withColumn("ddM", $"MSFT".toDrawdownSeries(w))
      .withColumn("ddC", $"C".toDrawdownSeries(w))
    val Array((a, m, c)) = first10.groupBy($"k")
      .agg(min($"ddA"), min($"ddM"), min($"ddC"))
      .select($"min(ddA)", $"min(ddM)", $"min(ddC)")
      .as[(Double, Double, Double)].collect()
    aae(a, -0.086); aae(m, -0.048); aae(c, -0.033)
  }

  test("year_frac ≈ 9.9986 over the full file (test_expr_core.py:115)") {
    val yf = prices.groupBy($"k").agg($"date".yearFrac())
      .select($"date_year_frac").as[Double].head()
    aae(yf, 9.9986, 4)
  }

  test("CAGR matches pinned AAPL/MSFT/C values (test_expr_core.py:121)") {
    val Array((a, m, c)) = prices.groupBy($"k")
      .agg(Eod.cagr($"AAPL", $"date"), Eod.cagr($"MSFT", $"date"),
        Eod.cagr($"C", $"date"))
      .as[(Int, Double, Double, Double)].collect().map(t => (t._2, t._3, t._4))
    aae(a, 0.440); aae(m, 0.041); aae(c, -0.205)
  }

  test("MTD/YTD on synthetic ramps (test_expr_core.py:71/86)") {
    // March 1 .. April 10, prices 100..140: MTD = 140/130 - 1
    val mtdDf = (0 until 41).map { i =>
      (1, java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 3, 1)
        .plusDays(i).atStartOfDay()), 100.0 + i)
    }.toDF("k", "date", "p")
      .withColumn("max_ts", max($"date").over(Window.partitionBy($"k")))
    val mtd = mtdDf.groupBy($"k").agg($"p".calcMtd($"date", $"max_ts"))
      .select($"p_mtd").as[Double].head()
    aae(mtd, 140.0 / 130.0 - 1, 4)
    // Jan 1 .. Apr 9, prices 100..199: YTD = 199/100 - 1
    val ytdDf = (0 until 100).map { i =>
      (1, java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i).atStartOfDay()), 100.0 + i)
    }.toDF("k", "date", "p")
      .withColumn("max_ts", max($"date").over(Window.partitionBy($"k")))
    val ytd = ytdDf.groupBy($"k").agg($"p".calcYtd($"date", $"max_ts"))
      .select($"p_ytd").as[Double].head()
    aae(ytd, 0.99, 4)
  }

  test("infer_freq labels (test_expr_core.py:160) + irregular → unknown") {
    def freqOf(stepDays: Int, n: Int = 10): String = {
      val df = (0 until n).map { i =>
        (1, java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(i.toLong * stepDays).atStartOfDay()))
      }.toDF("k", "date")
        .withColumn("delta_days",
          graft.functions.Tick.tsDeltaNs($"date", Window.partitionBy($"k").orderBy($"date"))
            / lit(86400.0 * 1e9))
      df.groupBy($"k").agg(Eod.inferFreq($"delta_days").as("f"))
        .select($"f").as[String].head()
    }
    assert(freqOf(1) == "daily")
    assert(freqOf(7) == "weekly")
    assert(freqOf(30) == "monthly")
    assert(freqOf(91) == "quarterly")
    assert(freqOf(365) == "yearly")
    val irr = Seq(0, 1, 6, 26, 55).map { d =>
      (1, java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(d).atStartOfDay()))
    }.toDF("k", "date")
      .withColumn("delta_days",
        graft.functions.Tick.tsDeltaNs($"date", Window.partitionBy($"k").orderBy($"date"))
          / lit(86400.0 * 1e9))
    assert(irr.groupBy($"k").agg(Eod.inferFreq($"delta_days").as("f"))
      .select($"f").as[String].head() == "unknown")
  }

  test("IR with zero-std diff → 0; excess returns float/column rf (test_expr_core.py:240/200)") {
    val df0 = Seq((0.01, 0.01), (0.01, 0.01), (0.01, 0.01)).toDF("r", "b")
    val ir = df0.agg($"r".calcInformationRatio($"b")).as[Double].head()
    assert(ir == 0.0)
    val ex = Seq(0.05).toDF("r")
      .select($"r".toExcessReturns(0.12, 12)).as[Double].head()
    aae(ex, 0.05 - (math.pow(1.12, 1.0 / 12) - 1), 8)
    val exCol = Seq((0.05, 0.01), (0.03, 0.01)).toDF("r", "rf")
      .select($"r".toExcessReturns($"rf")).as[Double].collect()
    aae(exCol(0), 0.04, 8); aae(exCol(1), 0.02, 8)
  }

  test("total return simple/flat/negative (test_expr_core.py:265)") {
    def tr(ps: Double*): Double =
      ps.zipWithIndex.map { case (p, i) => (1, i, p) }.toDF("k", "t", "p")
        .groupBy($"k").agg($"p".calcTotalReturn($"t"))
        .select($"p_total_return").as[Double].head()
    aae(tr(100.0, 110.0, 130.0), 0.3, 6)
    assert(tr(100.0, 100.0, 100.0) == 0.0)
    aae(tr(100.0, 90.0, 80.0), -0.2, 6)
  }

  test("prob_mom in [0,1] on the reference's example (test_expr_core.py:256)") {
    val df = Seq((0.02, 0.01), (0.01, 0.00), (-0.01, 0.01), (0.03, 0.01))
      .toDF("a", "b")
    val p = df.agg($"a".calcProbMom($"b")).as[Double].head()
    assert(p >= 0.0 && p <= 1.0)
  }

  test("deannualize pinned cases (test_expr_core.py:184)") {
    val d1 = Seq(0.12).toDF("r").select($"r".deannualize(12)).as[Double].head()
    aae(d1, math.pow(1.12, 1.0 / 12) - 1, 8)
    val d2 = Seq(0.10).toDF("r").select($"r".deannualize(252)).as[Double].head()
    aae(d2, math.pow(1.10, 1.0 / 252) - 1, 8)
  }

  test("risk/return ratio and sharpe match the closed form (test_expr_core.py:220/227)") {
    def meanStd(xs: Seq[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)))
    }
    val rrXs = Seq(0.01, 0.02, -0.01, 0.03, -0.02)
    val (rm, rs) = meanStd(rrXs)
    val rrr = rrXs.toDF("r").agg($"r".calcRiskReturnRatio()).as[Double].head()
    aae(rrr, rm / rs * math.sqrt(252.0), 8)
    val shXs = Seq(0.01, 0.02, -0.01, 0.005)
    val (sm, ss) = meanStd(shXs)
    val sh = shXs.toDF("r")
      .agg($"r".calcSharpe(rf = 0.0, n = 252, annualize = true))
      .as[Double].head()
    aae(sh, sm / ss * math.sqrt(252.0), 8)
    assert(sh != 0.0)
  }

  test("annualize: basic / zero / one-day / large (test_expr_core.py:308-351)") {
    val basic = Seq((0.05, 30), (0.10, 90), (0.25, 180)).toDF("r", "d")
      .select($"r".annualize($"d")).as[Double].collect()
    aae(basic(0), math.pow(1.05, 365.0 / 30) - 1, 6)
    aae(basic(1), math.pow(1.10, 365.0 / 90) - 1, 6)
    aae(basic(2), math.pow(1.25, 365.0 / 180) - 1, 6)
    assert(Seq((0.0, 60)).toDF("r", "d")
      .select($"r".annualize($"d")).as[Double].head() == 0.0)
    aae(Seq((0.01, 1)).toDF("r", "d")
      .select($"r".annualize($"d")).as[Double].head(),
      math.pow(1.01, 365.0) - 1, 4)
    aae(Seq((10.0, 730)).toDF("r", "d")
      .select($"r".annualize($"d")).as[Double].head(),
      math.pow(11.0, 365.0 / 730) - 1, 6)
  }

  test("sortino on the reference fixture, rf=0 n=1 (test_expr_core.py:363)") {
    // expected computed exactly as the reference test does: excess =
    // returns (rf=0), downside = min(excess[1:], 0) with sample std
    // around ITS mean, sortino = mean(excess)/downside_std * sqrt(1)
    val rets = prices.select($"date", $"AAPL".toReturns(w).as("r"))
      .orderBy($"date").select($"r").as[Option[Double]].collect()
      .flatten.toSeq // nulls (first row) dropped, like the reference's [1:]
    val neg = rets.drop(1).map(math.min(_, 0.0)) // ref skips first return here
    val negMean = neg.sum / neg.length
    val dstd = math.sqrt(neg.map(x => (x - negMean) * (x - negMean)).sum / (neg.length - 1))
    val expected = (rets.sum / rets.length) / dstd
    val actual = prices.withColumn("r", $"AAPL".toReturns(w))
      .agg($"r".sortinoRatio(rf = 0.0, n = 1)).as[Double].head()
    aae(actual, expected, 3)
  }

  test("calmar = cagr / |max_dd| on the monthly ramp (test_expr_core.py:390)") {
    val df = Seq(
      ("2020-01-01", 100.0), ("2020-02-01", 90.0),
      ("2020-03-01", 120.0), ("2020-04-01", 140.0))
      .toDF("d", "price")
      .select(lit(1).as("k"), to_timestamp($"d").as("date"), $"price")
    val dd = df.withColumn("dd", $"price".toDrawdownSeries(w))
    val actual = dd.groupBy($"k")
      .agg(Eod.calmar($"price", $"date", $"dd").as("c"))
      .select($"c").as[Double].head()
    // year_frac = 91 days / 365.25; cagr = 1.4^(1/yf) - 1; |max dd| = 0.1
    val cagr = math.pow(1.4, 365.25 / 91.0) - 1
    aae(actual, cagr / 0.1, 4)
  }

  test("ulcer index known example = sqrt(150) (test_expr_core.py:410)") {
    // the reference test's prose says sqrt(250) but its assertion is
    // sqrt((0²+10²+5²+15²+20²)/5) = sqrt(750/5) = sqrt(150) ≈ 12.2474;
    // we pin the executable truth, not the comment
    val df = Seq(100.0, 90.0, 95.0, 85.0, 80.0).zipWithIndex
      .map { case (p, i) => (1, i, p) }.toDF("k", "t", "price")
    val ui = df
      .withColumn("dd", Eod.toDrawdownSeries($"price",
        Window.partitionBy($"k").orderBy($"t")))
      .groupBy($"k").agg($"dd".ulcerIndex())
      .select($"dd_ulcer_index").as[Double].head()
    aae(ui, math.sqrt(150.0), 4)
  }

  test("UPI float rf and column rf (test_expr_core.py:471/501)") {
    def upiCase(ps: Seq[Double], rf: Double, n: Option[Int]): Unit = {
      val df = ps.zipWithIndex.map { case (p, i) => (1, i, p) }
        .toDF("k", "t", "price")
      val wp = Window.partitionBy($"k").orderBy($"t")
      val withCols = df
        .withColumn("r", $"price".toReturns(wp))
        .withColumn("dd", $"price".toDrawdownSeries(wp))
      val actual = withCols.groupBy($"k")
        .agg(Eod.ulcerPerformanceIndex($"r", $"dd", rf, n.getOrElse(252)).as("u"))
        .select($"u").as[Double].head()
      // reference-test arithmetic
      val rets = ps.sliding(2).map(p => p(1) / p(0) - 1).toSeq
        .map(r => if (rf != 0.0 && n.isDefined) r - rf / n.get else r)
      val cummax = ps.scanLeft(Double.NegativeInfinity)(math.max).tail
      val dds = ps.zip(cummax).map { case (p, m) => (p - m) / m * 100 }
      val ulcer = math.sqrt(dds.map(d => d * d).sum / dds.length)
      aae(actual, rets.sum / rets.length / ulcer, 4)
    }
    upiCase(Seq(100, 95, 97, 85, 80, 82), 0.0, None)
    upiCase(Seq(100, 95, 97, 85, 80, 82), 0.03, Some(252))
    // rising prices → zero ulcer: reference numpy yields +inf; graft's
    // guardrail convention is SQL-null for x/0 (documented divergence —
    // null keeps Spark/DuckDB agreement, inf does not exist in SQL land)
    val rising = Seq(100.0, 105.0, 110.0, 115.0, 120.0, 125.0).zipWithIndex
      .map { case (p, i) => (1, i, p) }.toDF("k", "t", "price")
    val wr = Window.partitionBy($"k").orderBy($"t")
    assert(rising
      .withColumn("r", $"price".toReturns(wr))
      .withColumn("dd", $"price".toDrawdownSeries(wr))
      .groupBy($"k")
      .agg(Eod.ulcerPerformanceIndex($"r", $"dd", 0.01, 252).as("u"))
      .select($"u").as[Option[Double]].head().isEmpty)
    // column rf
    val df = Seq(100.0, 95.0, 97.0, 85.0, 80.0, 82.0).zipWithIndex
      .map { case (p, i) => (1, i, p, 0.0001) }.toDF("k", "t", "price", "rf_col")
    val wp = Window.partitionBy($"k").orderBy($"t")
    val actual = df
      .withColumn("r", $"price".toReturns(wp))
      .withColumn("dd", $"price".toDrawdownSeries(wp))
      .groupBy($"k")
      .agg($"r".ulcerPerformanceIndex($"dd", $"rf_col"))
      .select($"r_ulcer_performance_index").as[Double].head()
    val ps = Seq(100.0, 95.0, 97.0, 85.0, 80.0, 82.0)
    val rets = ps.sliding(2).map(p => p(1) / p(0) - 1 - 0.0001).toSeq
    val cummax = ps.scanLeft(Double.NegativeInfinity)(math.max).tail
    val dds = ps.zip(cummax).map { case (p, m) => (p - m) / m * 100 }
    val ulcer = math.sqrt(dds.map(d => d * d).sum / dds.length)
    aae(actual, rets.sum / rets.length / ulcer, 4)
  }

  test("infer_nperiods label matrix (test_expr_core.py:539-551)") {
    def nper(deltaSec: Double): Option[Long] = {
      val df = (0 until 9).map(_ => (1, deltaSec)).toDF("k", "ds")
      df.groupBy($"k").agg(Eod.inferNperiods($"ds").as("n"))
        .select($"n").as[Option[Long]].head()
    }
    assert(nper(86400.0) == Some(252L))                      // 1d
    assert(nper(3600.0) == Some(252L * 24))                  // 1h
    assert(nper(60.0) == Some(252L * 24 * 60))               // 1m
    assert(nper(1.0) == Some(252L * 24 * 3600))              // 1s
    assert(nper(0.1) == Some(252L * 24 * 3600 * 10))         // 100ms
    assert(nper(31.0 * 86400) == Some(12L))                  // 1mo
    assert(nper(366.0 * 86400) == Some(1L))                  // 1y
    // irregular deltas → null
    val irr = Seq(1.0, 2.0, 3.0, 5.0, 8.0).map(d => (1, d)).toDF("k", "ds")
    assert(irr.groupBy($"k").agg(Eod.inferNperiods($"ds").as("n"))
      .select($"n").as[Option[Long]].head().isEmpty)
  }
}
