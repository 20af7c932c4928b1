package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed synthetic market-data generator — the Spark re-expression
  * of the reference's simulator (ffn_polars/sim/{quotes,trades}.py:
  * per-day NBBO quote ticks + trades sampled against them).
  *
  * The reference drives numpy RNG on one node; here randomness is
  * hash-derived per row id (md5 → uniform), so generation is pure
  * `spark.range(n)` column algebra: embarrassingly parallel, seeded,
  * reproducible at any parallelism, no driver-side arrays. A 100 TB
  * synthetic corpus is just a bigger `range`.
  */
object MarketSim {
  /** Deterministic uniform in [0,1) from (seed, id, tag). */
  private def u(seed: Long, id: Column, tag: String): Column =
    conv(substring(md5(concat_ws("_", lit(seed), id, lit(tag))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Trading day window: 09:30–16:00 US/Eastern ≈ fixed 6.5h in UTC ns
    * from an anchor date (reference sim/common.py:get_trading_window_ns).
    */
  private val DayNs = 23400L * 1000000000L // 6.5 hours
  private val AnchorUs = 1712928600000000L // 2024-04-12 13:30 UTC

  val Exchanges = Seq(12, 10, 11, 8, 2, 1, 201, 202) // sim/common.py EXCHANGES

  /** Simulate NBBO quote ticks: random-walk mid, exchange mix, spreads.
    * Output: ticker, ts, bid, ask, bid_size, ask_size, exchange, day.
    */
  def simulateQuotes(spark: SparkSession, ticker: String, days: Int,
                     ticksPerDay: Int, seed: Long = 42L): DataFrame = {
    val n = days.toLong * ticksPerDay
    val base = spark.range(n)
      .withColumn("day", (col("id") / ticksPerDay).cast("long"))
      .withColumn("k", col("id") % ticksPerDay)
    // Uniformly spaced-with-jitter intra-day timestamps, monotone per day.
    val tsUs = lit(AnchorUs) + col("day") * 86400000000L +
      ((col("k") + u(seed, col("id"), "jit")) * (DayNs / 1000L) / ticksPerDay).cast("long")
    // Random-walk mid: cumsum of ±step over the day (window per day —
    // one shuffle on (ticker, day), linear scan within).
    val w = Window.partitionBy(col("day")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = (u(seed, col("id"), "walk") - 0.5) * 0.02
    val mid = lit(100.0) + sum(step).over(w)
    val spread = lit(0.01) + u(seed, col("id"), "spr") * 0.04
    val exIdx = (u(seed, col("id"), "ex") * Exchanges.size).cast("int")
    base.select(
      lit(ticker).as("ticker"),
      timestamp_micros(tsUs).as("ts"),
      round(mid - spread / 2, 4).as("bid"),
      round(mid + spread / 2, 4).as("ask"),
      (u(seed, col("id"), "bs") * 90 + 10).cast("long").as("bid_size"),
      (u(seed, col("id"), "as") * 90 + 10).cast("long").as("ask_size"),
      element_at(array(Exchanges.map(lit): _*), exIdx + 1).as("exchange"),
      col("day"))
  }

  /** Hash-derived volatility event windows, the Spark re-expression of
    * the reference's market-event injection (sim/market_events.py:
    * inject_event_windows): per day, with `probability`, 1..numEvents
    * windows of duration [minDurUs, maxDurUs) placed inside the trading
    * day. Deterministic per (seed, day, index) — same md5-uniform
    * scheme as the tick generators, so it scales as a pure range job
    * and replays in any engine.
    */
  def eventWindows(spark: SparkSession, days: Int, numEvents: Int,
                   minDurUs: Long, maxDurUs: Long,
                   probability: Double = 0.5, seed: Long = 42L): DataFrame = {
    val d = spark.range(days).withColumnRenamed("id", "day")
      .withColumn("total",
        when(u(seed, col("day"), "p") > probability, 0L)
          .otherwise((u(seed, col("day"), "n") * numEvents).cast("long") + 1))
    d.where(col("total") > 0)
      .select(col("day"), explode(sequence(lit(0L), col("total") - 1)).as("event_idx"))
      .withColumn("_ek", col("day") * 1000 + col("event_idx"))
      .withColumn("_dur", lit(minDurUs) +
        (u(seed, col("_ek"), "d") * (maxDurUs - minDurUs)).cast("long"))
      .withColumn("start_us", lit(AnchorUs) + col("day") * 86400000000L +
        (u(seed, col("_ek"), "s") * (lit(DayNs / 1000L) - col("_dur"))).cast("long"))
      .select(col("day"), col("event_idx"), col("start_us"),
        (col("start_us") + col("_dur")).as("end_us"))
  }

  /** Flag ticks that fall inside any event window of their day
    * (reference market_events.py:is_within_events). Windows per day are
    * few by construction, so they broadcast as per-day interval lists
    * and the check is a tiny array scan — no range-join shuffle.
    */
  def flagEventTicks(ticks: DataFrame, windows: DataFrame): DataFrame = {
    val evs = windows.groupBy(col("day"))
      .agg(collect_list(struct(col("start_us"), col("end_us"))).as("_evs"))
    ticks.join(broadcast(evs), Seq("day"), "left")
      .withColumn("in_event",
        coalesce(exists(col("_evs"), e =>
          unix_micros(col("ts")) >= e.getField("start_us") &&
            unix_micros(col("ts")) < e.getField("end_us")), lit(false)))
      .drop("_evs")
  }

  /** Simulate trades by sampling quote ticks: each sampled quote yields a
    * trade at bid or ask (tick-rule side), sized to approach the target
    * daily volume. Pure column algebra over the quotes frame.
    */
  def simulateTrades(quotes: DataFrame, targetVolumePerDay: Long,
                     seed: Long = 42L): DataFrame = {
    val sampleRate = 0.1
    val q = quotes.withColumn("_r", u(seed, unix_micros(col("ts")), "take"))
      .where(col("_r") < sampleRate)
    val side = when(u(seed, unix_micros(col("ts")), "side") < 0.5, 1).otherwise(-1)
    val nPerDay = count(lit(1)).over(Window.partitionBy(col("ticker"), col("day")))
    q.select(
      col("ticker"), col("ts"),
      when(side === 1, col("ask")).otherwise(col("bid")).as("price"),
      (lit(targetVolumePerDay) / nPerDay *
        (lit(0.5) + u(seed, unix_micros(col("ts")), "sz"))).cast("long").as("size"),
      side.as("side"),
      col("exchange"), col("day"))
  }
}
