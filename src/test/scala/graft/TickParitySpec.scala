package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Tick

/** Behavior parity with the reference's pinned tick tests
  * (reference: tests/expr/test_tick.py), 1e-9 tolerances like its aae.
  */
class TickParitySpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"ticker").orderBy($"ts")

  private def ts(sec: Int): Timestamp =
    Timestamp.valueOf(s"2023-01-01 09:30:${"%02d".format(sec)}")

  private def aae(a: Double, e: Double): Unit =
    assert(math.abs(a - e) < 1e-9, s"$a != $e")

  test("trade rate per unit, grouped (test_tick.py:43)") {
    val df = Seq(
      ("AAPL", ts(0)), ("AAPL", ts(5)), ("AAPL", ts(10)),
      ("MSFT", ts(0)), ("MSFT", ts(10))).toDF("ticker", "ts")
    for ((per, aapl, msft) <- Seq(
        ("s", 3 / 10.0, 2 / 10.0), ("ms", 3 / 1e4, 2 / 1e4),
        ("us", 3 / 1e7, 2 / 1e7), ("ns", 3 / 1e10, 2 / 1e10))) {
      val m = df.groupBy($"ticker").agg(Tick.tradeRate($"ts", per).as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      aae(m("AAPL"), aapl); aae(m("MSFT"), msft)
    }
  }

  test("inter-trade time = 5s on a 5-second grid (test_tick.py:74)") {
    val df = Seq(("AAPL", ts(0)), ("AAPL", ts(5)), ("AAPL", ts(10))).toDF("ticker", "ts")
    val itt = df.withColumn("d", Tick.tsDeltaNs($"ts", w))
      .groupBy($"ticker").agg(Tick.interTradeTime($"d", "s").as("itt"))
      .select($"itt").as[Double].head()
    aae(itt, 5.0)
  }

  test("realized volatility grouped (test_tick.py:202)") {
    val df = Seq(
      ("AAPL", 1, 100.0), ("AAPL", 2, 101.0), ("AAPL", 3, 98.0),
      ("MSFT", 1, 200.0), ("MSFT", 2, 210.0)).toDF("ticker", "ts", "p")
    val m = df.withColumn("lr", Tick.microReturns($"p", w))
      .groupBy($"ticker").agg(Tick.realizedVolatility($"lr").as("rv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    aae(m("AAPL"), math.sqrt(
      math.pow(math.log(101.0 / 100), 2) + math.pow(math.log(98.0 / 101), 2)))
    aae(m("MSFT"), math.abs(math.log(210.0 / 200)))
  }

  test("tick rule sequence 0,1,0,-1,1 (test_tick.py:225)") {
    val df = Seq(100.0, 101.0, 101.0, 100.0, 102.0).zipWithIndex
      .map { case (p, i) => ("AAPL", i, p) }.toDF("ticker", "ts", "p")
    val dir = df.orderBy($"ts").select(Tick.tickRule($"p", w)).as[Int].collect()
    assert(dir.sameElements(Array(0, 1, 0, -1, 1)))
  }

  test("signed volume 0,200,0,-300,400 (test_tick.py:240)") {
    val df = Seq((100.0, 100), (101.0, 200), (101.0, 150), (100.0, 300), (102.0, 400))
      .zipWithIndex.map { case ((p, v), i) => ("AAPL", i, p, v.toDouble) }
      .toDF("ticker", "ts", "p", "v")
    val sv = df.orderBy($"ts")
      .select(Tick.signVolumeByTickRule($"v", $"p", w)).as[Double].collect()
    assert(sv.sameElements(Array(0.0, 200.0, 0.0, -300.0, 400.0)))
  }

  test("tick imbalance of net-zero signed flow is 0 (test_tick.py:261)") {
    val df = Seq(1, 1, -1, -1).map(("AAPL", _)).toDF("ticker", "sv")
    aae(df.groupBy($"ticker").agg(Tick.tickImbalance($"sv").as("i"))
      .select($"i").as[Double].head(), 0.0)
  }

  test("burstiness: regular grid → 0; null-guard on n<2 deltas (test_tick.py:324)") {
    val reg = Seq(("AAPL", ts(0)), ("AAPL", ts(5)), ("AAPL", ts(10))).toDF("ticker", "ts")
    aae(reg.withColumn("d", Tick.tsDeltaNs($"ts", w))
      .groupBy($"ticker").agg(Tick.burstiness($"d").as("b"))
      .select($"b").as[Double].head(), 0.0)
    // a single delta → stddev_samp undefined → null (reference: None)
    val two = Seq(("AAPL", ts(0)), ("AAPL", ts(7))).toDF("ticker", "ts")
    val b = two.withColumn("d", Tick.tsDeltaNs($"ts", w))
      .groupBy($"ticker").agg(Tick.burstiness($"d").as("b"))
      .select($"b").as[Option[Double]].head()
    assert(b.isEmpty || b.get.isNaN)
  }

  test("price impact, OFI, traded value, vwap, pvr (test_tick.py:404+)") {
    val df = Seq(("AAPL", 1, 100.0, 100.0), ("AAPL", 2, 103.0, 300.0))
      .toDF("ticker", "ts", "p", "v")
    val row = df.groupBy($"ticker").agg(
      Tick.priceImpact($"p", $"v", $"ts").as("impact"),
      Tick.tradedValue($"p", $"v").as("tv"),
      Tick.vwap($"p", $"v").as("vwap"),
      Tick.priceVolatilityRatio($"p").as("pvr")).head()
    aae(row.getDouble(1), 3.0 / 400.0)
    aae(row.getDouble(2), 100.0 * 100 + 103.0 * 300)
    aae(row.getDouble(3), (100.0 * 100 + 103.0 * 300) / 400.0)
    val mean = 101.5
    val sd = math.sqrt((math.pow(100 - mean, 2) + math.pow(103 - mean, 2)) / 1)
    aae(row.getDouble(4), sd / mean)
    val ofi = Seq(("AAPL", 100.0), ("AAPL", -40.0)).toDF("ticker", "sv")
      .groupBy($"ticker").agg(Tick.orderFlowImbalance($"sv").as("o"))
      .select($"o").as[Double].head()
    aae(ofi, 60.0)
  }
}
