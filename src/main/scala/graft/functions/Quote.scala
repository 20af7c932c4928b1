package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quote/NBBO analytics — fills in the reference's declared-but-empty
  * quote namespace (ffn_polars/expr/quote/__init__.py) with the
  * standard microstructure quantities its simulator produces
  * (sim/quotes.py: bid/ask/sizes per exchange).
  */
object Quote {
  /** Absolute quoted spread: ask - bid. */
  def spread(bid: Column, ask: Column): Column = ask - bid

  /** Quote midpoint: (bid+ask)/2. */
  def midpoint(bid: Column, ask: Column): Column = (bid + ask) / 2

  /** Relative spread in basis points: (ask-bid)/mid * 1e4. */
  def relativeSpreadBps(bid: Column, ask: Column): Column =
    safeDiv(spread(bid, ask), midpoint(bid, ask)) * 10000.0

  /** Size-weighted microprice: (ask*bidSz + bid*askSz)/(bidSz+askSz) —
    * the fair-value estimate that leans toward the heavier side.
    */
  def microprice(bid: Column, ask: Column, bidSize: Column,
                 askSize: Column): Column =
    safeDiv(ask * bidSize + bid * askSize,
      (bidSize + askSize).cast("double"))

  /** National best bid/offer per key: best (max) bid and best (min)
    * ask across venues, with the quoting venue of each side.
    * Aggregate form for `groupBy(ts-bucket, ticker)`.
    */
  def nbbo(df: DataFrame, keyCols: Seq[String], bid: String = "bid",
           ask: String = "ask", venue: String = "exchange"): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max(col(bid)).as("best_bid"),
        min(col(ask)).as("best_ask"),
        max_by(col(venue), col(bid)).as("best_bid_venue"),
        min_by(col(venue), col(ask)).as("best_ask_venue"))

  /** Trade-to-quote latency in microseconds (reference tick/latency.py
    * is a stub; this is its natural content given the as-of join).
    */
  def quoteLatencyUs(tradeTs: Column, quoteTs: Column): Column =
    Tick.epochUs(tradeTs) - Tick.epochUs(quoteTs)
}
