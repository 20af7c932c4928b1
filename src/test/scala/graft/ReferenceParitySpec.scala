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
}
