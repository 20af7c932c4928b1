package graft

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

import graft.expressions.StudentTCdf
import graft.functions.{Eod, Tick}

/** Reference-shaped fluent API: `import graft.syntax._` gives every
  * Column the ffn-polars namespace methods with auto-aliasing
  * (reference: ffn_polars/__init__.py FFNNamespace registration +
  * utils/decorators.py auto_alias). `col("price").toReturns(w)` yields
  * a column named `price_returns`, exactly like the reference's
  * `pl.col("price").ffn.to_returns()`.
  */
package object syntax {

  private val SimpleName = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def baseName(c: Column): Option[String] =
    GraftSqlBridge.expression(c) match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      case a: Alias               => Some(a.name)
      // Spark 4 Columns are ColumnNode-backed; a plain col("x") may not
      // surface as an UnresolvedAttribute here — fall back to the
      // printable form when it looks like a bare column name.
      case _ => c.toString match {
        case s if SimpleName.matches(s) => Some(s)
        case _                          => None
      }
    }

  private def aliased(self: Column, res: Column, suffix: String): Column =
    baseName(self) match {
      case Some(b) if b.endsWith(s"_$suffix") => res.as(b)
      case Some(b)                            => res.as(s"${b}_$suffix")
      case None                               => res.as(suffix)
    }

  implicit class FfnColumnOps(private val self: Column) extends AnyVal {
    // ----- eod series
    def toReturns(w: WindowSpec): Column =
      aliased(self, Eod.toReturns(self, w), "returns")
    def toLogReturns(w: WindowSpec): Column =
      aliased(self, Eod.toLogReturns(self, w), "log_returns")
    def toPriceIndex(w: WindowSpec, start: Double = 100.0): Column =
      aliased(self, Eod.toPriceIndex(self, w, start), "price_index")
    def rebase(w: WindowSpec, value: Double = 100.0): Column =
      aliased(self, Eod.rebase(self, w, value), "rebased")
    def toDrawdownSeries(w: WindowSpec): Column =
      aliased(self, Eod.toDrawdownSeries(self, w), "drawdowns")
    def toExcessReturns(rf: Double, n: Int): Column =
      aliased(self, Eod.toExcessReturns(self, rf, n), "excess")
    def toExcessReturns(rf: Column): Column =
      aliased(self, Eod.toExcessReturns(self, rf), "excess")
    def deannualize(n: Int): Column =
      aliased(self, Eod.deannualize(self, n), "deannualized")
    def annualize(durations: Column, oneYear: Double = 365.0): Column =
      aliased(self, Eod.annualize(self, durations, oneYear), "annualized")

    // ----- eod aggregates
    def calcTotalReturn(ord: Column): Column =
      aliased(self, Eod.totalReturn(self, ord), "total_return")
    def calcCagr(ts: Column): Column =
      aliased(self, Eod.cagr(self, ts), "cagr")
    def calcSharpe(rf: Double = 0.0, n: Int = Eod.TradingDaysPerYear,
                   annualize: Boolean = true): Column =
      aliased(self, Eod.sharpe(self, rf, n, annualize), "sharpe")
    def calcRiskReturnRatio(): Column =
      aliased(self, Eod.riskReturnRatio(self), "risk_return_ratio")
    def sortinoRatio(rf: Double = 0.0, n: Int = Eod.TradingDaysPerYear,
                     annualize: Boolean = true): Column =
      aliased(self, Eod.sortino(self, rf, n, annualize), "sortino_ratio")
    def calcInformationRatio(benchmark: Column): Column =
      aliased(self, Eod.informationRatio(self, benchmark), "ir")
    def ulcerIndex(): Column =
      aliased(self, Eod.ulcerIndexFromDrawdown(self), "ulcer_index")
    def ulcerPerformanceIndex(dd: Column, rf: Double = 0.0,
                              n: Int = Eod.TradingDaysPerYear): Column =
      aliased(self, Eod.ulcerPerformanceIndex(self, dd, rf, n),
        "ulcer_performance_index")
    def ulcerPerformanceIndex(dd: Column, rf: Column): Column =
      aliased(self, Eod.ulcerPerformanceIndex(self, dd, rf),
        "ulcer_performance_index")
    def calcMaxDrawdown(): Column =
      aliased(self, Eod.maxDrawdownFromDrawdown(self), "max_drawdown")
    def calcMtd(ts: Column, maxTs: Column): Column =
      aliased(self, Eod.mtd(self, ts, maxTs), "mtd")
    def calcYtd(ts: Column, maxTs: Column): Column =
      aliased(self, Eod.ytd(self, ts, maxTs), "ytd")
    def yearFrac(): Column =
      aliased(self, Eod.yearFrac(self), "year_frac")
    def inferNperiods(af: Int = Eod.TradingDaysPerYear): Column =
      aliased(self, Eod.inferNperiods(self, af), "nperiods")
    def inferFreq(): Column =
      aliased(self, Eod.inferFreq(self), "inferred_freq")

    /** Probabilistic momentum vs a second return column: t CDF of the
      * information ratio with df = n-1 (reference ratios.py:121 +
      * src/lib.rs:8; here a native Catalyst expression).
      */
    def calcProbMom(b: Column): Column = {
      val d = self - b
      val cdf = GraftSqlBridge.column(StudentTCdf(
        GraftSqlBridge.expression(avg(d) / stddev_samp(d)),
        GraftSqlBridge.expression((count(d) - 1).cast("double"))))
      aliased(self, cdf, "prob_mom")
    }

    // ----- tick
    def calcTradeRate(per: String = "ms"): Column =
      aliased(self, Tick.tradeRate(self, per), "trade_rate")
    def calcVolumeRate(ts: Column, per: String = "s"): Column =
      aliased(self, Tick.volumeRate(self, ts, per), "volume_rate")
    def calcOrderFlowImbalance(): Column =
      aliased(self, Tick.orderFlowImbalance(self), "order_flow_imbalance")
    def calcTradedValue(volume: Column): Column =
      aliased(self, Tick.tradedValue(self, volume), "traded_value")
    def calcVwap(volume: Column): Column =
      aliased(self, Tick.vwap(self, volume), "vwap")
    def tickRule(w: WindowSpec): Column =
      aliased(self, Tick.tickRule(self, w), "direction")
    def applyTickRuleToVolume(price: Column, w: WindowSpec): Column =
      aliased(self, Tick.signVolumeByTickRule(self, price, w), "signed_volume")
    def calcTickImbalance(): Column =
      aliased(self, Tick.tickImbalance(self), "tick_imbalance")
    def calcMicroReturns(w: WindowSpec): Column =
      aliased(self, Tick.microReturns(self, w), "micro_returns")
    def calcPriceVolatilityRatio(): Column =
      aliased(self, Tick.priceVolatilityRatio(self), "price_volatility_ratio")
    def calcPriceImpact(volume: Column, ord: Column): Column =
      aliased(self, Tick.priceImpact(self, volume, ord), "price_impact")
    def calcRealizedVolatility(): Column =
      aliased(self, Tick.realizedVolatility(self), "realized_volatility")
    def calcInterTradeTime(per: String = "s"): Column =
      aliased(self, Tick.interTradeTime(self, per), "inter_trade_time")
    def calcBurstiness(): Column =
      aliased(self, Tick.burstiness(self), "burstiness")
  }
}
