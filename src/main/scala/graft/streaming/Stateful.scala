package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom-state streaming operators via `flatMapGroupsWithState` —
  * per-key running analytics that declarative streaming aggregation
  * cannot express (window functions like lag/cummax don't exist on
  * streams; these are their stateful twins).
  *
  * Scale shape: state is O(number of keys) (one small record per
  * symbol), partitioned by the group key across executors — the same
  * keyBy shuffle as a streaming aggregate. Rows within a micro-batch
  * are sorted by event time per key; cross-batch order is handled by
  * the carried state (monotone high-water mark / last-quote-wins), so
  * modest inter-batch disorder degrades gracefully rather than
  * corrupting state.
  *
  * Memory note: the per-key event-time sort buffers ONE KEY'S rows of
  * the CURRENT micro-batch on the executor (`it.toArray`) — O(hottest
  * symbol per batch) heap, not O(batch). That is the inherent cost of
  * in-batch reordering; size micro-batches (trigger interval /
  * maxOffsetsPerTrigger) so a hot symbol's slice fits comfortably, or
  * pre-sort the source and drop the buffer entirely.
  */
object Stateful {

  // ------------------------------------------------------ running drawdown

  case class Tick(symbol: String, ts: Timestamp, price: Double)
  case class DrawdownRow(symbol: String, ts: Timestamp, price: Double,
                         high_water: Double, drawdown: Double)
  case class HighWater(max: Double)

  /** Per-symbol running high-water mark and drawdown, the streaming twin
    * of [[graft.functions.Eod.toDrawdownSeries]] (ref: eod/risk.py:64):
    * state carries cummax(price) across micro-batches; each tick emits
    * price/highWater - 1.
    */
  def runningDrawdown(ticks: Dataset[Tick]): Dataset[DrawdownRow] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[HighWater, DrawdownRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol, it, state) =>
          var hw = state.getOption.map(_.max).getOrElse(Double.NegativeInfinity)
          val out = it.toArray.sortBy(_.ts.getTime).map { t =>
            hw = math.max(hw, t.price)
            DrawdownRow(symbol, t.ts, t.price, hw,
              if (hw != 0.0) t.price / hw - 1 else Double.NaN)
          }
          state.update(HighWater(hw))
          out.iterator
      }
  }

  // ------------------------------------------------- streaming as-of quote

  /** Interleaved market events: kind = "quote" (bid/ask set) or "trade"
    * (price set). One stream, keyed by symbol — the streaming analogue
    * of the batch trade↔quote as-of join ([[graft.operators.AsOfJoin]]).
    */
  case class MarketEvent(symbol: String, ts: Timestamp, kind: String,
                         price: Double, bid: Double, ask: Double)
  case class EnrichedTrade(symbol: String, ts: Timestamp, price: Double,
                           bid: Double, ask: Double, mid: Double,
                           latency_ms: Long)
  case class QuoteState(bid: Double, ask: Double, tsMillis: Long)

  /** Enrich each trade with the prevailing (most recent at-or-before)
    * quote. State = last quote per symbol; trades arriving before any
    * quote are dropped (no prevailing NBBO — same as the batch as-of
    * join's null-match rows being filtered).
    */
  def asOfEnrich(events: Dataset[MarketEvent]): Dataset[EnrichedTrade] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.symbol)
      .flatMapGroupsWithState[QuoteState, EnrichedTrade](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol, it, state) =>
          var q = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[EnrichedTrade]()
          // Same-timestamp tie-break: quotes BEFORE trades, explicitly
          // (a trade at t sees a quote stamped t, matching the batch
          // as-of join's at-or-before semantics) — not an accident of
          // "quote" < "trade" string order.
          it.toArray.sortBy(e => (e.ts.getTime, e.kind == "trade")).foreach { e =>
            if (e.kind == "quote") {
              // last-quote-wins only forward in time: a late quote must
              // not roll the prevailing NBBO backwards.
              if (q == null || e.ts.getTime >= q.tsMillis)
                q = QuoteState(e.bid, e.ask, e.ts.getTime)
            } else if (q != null) {
              out += EnrichedTrade(symbol, e.ts, e.price, q.bid, q.ask,
                (q.bid + q.ask) / 2, e.ts.getTime - q.tsMillis)
            }
          }
          if (q != null) state.update(q)
          out.iterator
      }
  }

  // ------------------------------------------- tick rule (transformWithState)

  case class SignedTick(symbol: String, ts: Timestamp, price: Double,
                        direction: Int)

  /** Streaming twin of [[graft.functions.Tick.tickRule]] (ref: tick/
    * direction.py:11) on Spark 4's arbitrary-state v2 API
    * (`transformWithState`): lag(price) is a per-symbol ValueState, so
    * the up/down/flat classification survives micro-batch boundaries.
    * State is one double per symbol; batch rows are event-time sorted.
    */
  class TickRuleProcessor extends StatefulProcessor[String, Tick, SignedTick] {
    @transient private var lastPrice: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastPrice = getHandle.getValueState[Double]("lastPrice",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Tick],
                                 timerValues: TimerValues): Iterator[SignedTick] = {
      var prev = if (lastPrice.exists()) lastPrice.get() else Double.NaN
      val out = rows.toArray.sortBy(_.ts.getTime).map { t =>
        val dir =
          if (prev.isNaN || t.price == prev) 0
          else if (t.price > prev) 1
          else -1
        prev = t.price
        SignedTick(key, t.ts, t.price, dir)
      }
      if (!prev.isNaN) lastPrice.update(prev)
      out.iterator
    }
  }

  def tickRule(ticks: Dataset[Tick]): Dataset[SignedTick] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.symbol)
      .transformWithState(new TickRuleProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
