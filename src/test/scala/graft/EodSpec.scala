package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Eod

/** Hand-computed oracles for the EOD analytics, mirroring the behavior
  * the reference tests pin down (tests/expr/test_returns.py etc.). */
class EodSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  private def series(prices: Double*) =
    prices.zipWithIndex.map { case (p, i) => ("a", i, p) }.toDF("k", "t", "p")

  test("toReturns: p/lag - 1") {
    val out = series(100.0, 110.0, 99.0)
      .select(Eod.toReturns($"p", w).as("r")).orderBy($"r".asc_nulls_first)
      .as[Option[Double]].collect()
    assert(out(0).isEmpty)
    assert(math.abs(out(1).get - (99.0 / 110.0 - 1)) < 1e-12)
    assert(math.abs(out(2).get - 0.1) < 1e-12)
  }

  test("drawdown series and max drawdown") {
    val df = series(100.0, 120.0, 90.0, 105.0)
      .withColumn("dd", Eod.toDrawdownSeries($"p", w))
    val dd = df.orderBy($"t").select($"dd").as[Double].collect()
    assert(dd(0) == 0.0 && dd(1) == 0.0)
    assert(math.abs(dd(2) - (90.0 / 120.0 - 1)) < 1e-12)
    assert(math.abs(dd(3) - (105.0 / 120.0 - 1)) < 1e-12)
    val mdd = df.groupBy($"k").agg(Eod.maxDrawdownFromDrawdown($"dd").as("m"))
      .select($"m").as[Double].head()
    assert(math.abs(mdd - (90.0 / 120.0 - 1)) < 1e-12)
  }

  test("sharpe annualized matches manual computation") {
    val rets = Seq(0.01, -0.02, 0.015, 0.005, -0.01)
    val df = rets.zipWithIndex.map { case (r, i) => ("a", i, r) }.toDF("k", "t", "r")
    val got = df.groupBy($"k").agg(Eod.sharpe($"r", 0.0, 252).as("s"))
      .select($"s").as[Double].head()
    val mean = rets.sum / rets.size
    val sd = math.sqrt(rets.map(x => (x - mean) * (x - mean)).sum / (rets.size - 1))
    assert(math.abs(got - mean / sd * math.sqrt(252.0)) < 1e-12)
  }

  test("totalReturn and rebase") {
    val df = series(50.0, 75.0, 60.0)
    val tr = df.groupBy($"k").agg(Eod.totalReturn($"p", $"t").as("tr"))
      .select($"tr").as[Double].head()
    assert(math.abs(tr - 0.2) < 1e-12)
    val rb = df.select(Eod.rebase($"p", w).as("rb")).orderBy($"rb")
      .as[Double].collect()
    assert(rb.sameElements(Array(100.0, 120.0, 150.0)))
  }

  test("degenerate series never error: zeros, single row, constants") {
    // One bad partition (zero price, constant series, single tick) in a
    // 100 TB job must produce nulls, not DIVIDE_BY_ZERO aborts.
    val zero = series(100.0, 0.0, 50.0)
    val rets = zero.select(Eod.toReturns($"p", w).as("r"))
      .as[Option[Double]].collect()
    assert(rets.contains(None))                        // 50/0 → null
    assert(rets.flatten.contains(-1.0))                // 0/100 - 1
    zero.select(Eod.toLogReturns($"p", w)).collect()   // no error
    zero.select(Eod.toDrawdownSeries($"p", w)).collect()
    val single = series(42.0)
    val cagr = single.groupBy($"k")
      .agg(Eod.cagr($"p", $"t".cast("timestamp")).as("c"))
      .select($"c").as[Option[Double]].head()
    assert(cagr.isEmpty)                               // yearFrac 0 → null
    val const = series(7.0, 7.0, 7.0)
    val sharpe = const.withColumn("r", Eod.toReturns($"p", w))
      .groupBy($"k").agg(Eod.sharpe($"r", 0.0, 252).as("s"))
      .select($"s").as[Option[Double]].head()
    assert(sharpe.isEmpty)                             // zero vol → null
  }

  test("price index hits zero and stays there after a total loss") {
    val df = Seq(("a", 0, 0.5), ("a", 1, -1.0), ("a", 2, 0.25))
      .toDF("k", "t", "r")
    val idx = df.select(Eod.toPriceIndex($"r", w).as("i")).orderBy($"i")
      .as[Double].collect().sorted
    // cumprod: 150, then 0 (total loss), then 0 — not a recovery
    assert(idx.count(_ == 0.0) == 2 && idx.contains(150.0))
  }
}
