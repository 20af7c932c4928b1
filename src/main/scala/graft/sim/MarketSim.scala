package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed synthetic market-data generator — the Spark re-expression
  * of the reference's simulator (ffn_polars/sim/{quotes,trades}.py:
  * per-day NBBO quote ticks + trades sampled against them).
  *
  * The reference drives numpy RNG on one node, one ticker+day per call;
  * here randomness is hash-derived per row id (md5 → uniform), so
  * generation is pure `spark.range(n)` column algebra: embarrassingly
  * parallel, seeded, reproducible at any parallelism, no driver-side
  * arrays. A whole-universe corpus (tickers × days × ticks) is ONE plan
  * over one `range` — the shape the reference's per-symbol loop can't
  * express. A 100 TB synthetic corpus is just a bigger `range`.
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
  /** Participation weights per exchange (sim/common.py EXCHANGE_WEIGHTS). */
  val ExchangeWeights = Seq(0.25, 0.2, 0.15, 0.15, 0.1, 0.05, 0.05, 0.05)
  /** Cumulative weight thresholds; the raw scanLeft doubles are the
    * contract — the DuckDB oracle replays the identical IEEE compares.
    */
  val ExchangeCum: Seq[Double] = ExchangeWeights.scanLeft(0.0)(_ + _).tail

  /** Weighted exchange draw: inverse-CDF over ExchangeCum (the Spark
    * re-expression of np.random.choice(EXCHANGE_IDS, p=EXCHANGE_WEIGHTS)).
    */
  def weightedExchange(u0: Column): Column = {
    val first = when(u0 < ExchangeCum.head, Exchanges.head)
    Exchanges.tail.init.zip(ExchangeCum.tail.init)
      .foldLeft(first) { case (acc, (ex, c)) => acc.when(u0 < c, ex) }
      .otherwise(Exchanges.last)
  }

  /** SIP tape assignment (reference sim/common.py:assign_tape):
    * NYSE-listed venues → tape 1, Nasdaq venues → tape 3, TRFs → a
    * uniform draw over {1,2,3} (the reference's np.random.choice),
    * everything else → tape 2. `uTrf` supplies the TRF draw so the
    * mapping stays a pure deterministic expression.
    */
  def assignTape(exchange: Column, uTrf: Column): Column =
    when(exchange.isin(10, 11, 1), 1)
      .when(exchange.isin(12, 2), 3)
      .when(exchange.isin(201, 202), (uTrf * 3).cast("int") + 1)
      .otherwise(2)

  /** Quote condition codes (reference sim/quotes.py:generate_quote_conditions):
    * "19" (regular) with p=0.8, else a uniform code in 1..19.
    */
  def quoteConditions(uTake: Column, uVal: Column): Column =
    when(uTake < 0.8, lit("19"))
      .otherwise((lit(1) + floor(uVal * 19)).cast("long").cast("string"))

  /** Quote indicator codes (reference sim/quotes.py:generate_quote_indicators):
    * "" with p=0.9, else one of {4, 12, 13}.
    */
  def quoteIndicators(uTake: Column, uVal: Column): Column =
    when(uTake < 0.9, lit(""))
      .otherwise(element_at(array(lit("4"), lit("12"), lit("13")),
        (uVal * 3).cast("int") + 1))

  /** Single-ticker convenience overload — identical row-id mapping to a
    * one-element universe, so seeds and oracles replay unchanged.
    */
  def simulateQuotes(spark: SparkSession, ticker: String, days: Int,
                     ticksPerDay: Int, seed: Long = 42L): DataFrame =
    simulateQuotes(spark, Seq(ticker), days, ticksPerDay, seed)

  /** Simulate NBBO quote ticks for a whole universe: random-walk mid per
    * (ticker, day), weighted exchange mix, spreads, and the reference's
    * full column list (sim/quotes.py:72-91) — conditions, indicators,
    * tape, sequence/sip/trf timestamps — as a superset of the graft core
    * schema (ticker, ts, bid, ask, bid_size, ask_size, exchange, day).
    * `ask_price`/`bid_price` alias `ask`/`bid` under the reference's
    * names; unused columns prune out of any downstream plan.
    *
    * One `range(tickers × days × ticksPerDay)`; the only shuffle is the
    * walk window on (ticker, day) — linear scan within each partition,
    * so a universe of any width is still one plan and one exchange.
    */
  def simulateQuotes(spark: SparkSession, tickers: Seq[String], days: Int,
                     ticksPerDay: Int, seed: Long): DataFrame = {
    require(tickers.nonEmpty, "tickers must be non-empty")
    val perTicker = days.toLong * ticksPerDay
    val n = tickers.size * perTicker
    val base = spark.range(n)
      .withColumn("_tix", (col("id") / perTicker).cast("int"))
      .withColumn("day", ((col("id") % perTicker) / ticksPerDay).cast("long"))
      .withColumn("k", col("id") % ticksPerDay)
    // Uniformly spaced-with-jitter intra-day timestamps, monotone per day.
    val tsUs = lit(AnchorUs) + col("day") * 86400000000L +
      ((col("k") + u(seed, col("id"), "jit")) * (DayNs / 1000L) / ticksPerDay).cast("long")
    val tsNs = tsUs * 1000L
    // Random-walk mid: cumsum of ±step over the day (window per
    // (ticker, day) — one shuffle, linear scan within).
    val w = Window.partitionBy(col("_tix"), col("day")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = (u(seed, col("id"), "walk") - 0.5) * 0.02
    val mid = lit(100.0) + sum(step).over(w)
    val spread = lit(0.01) + u(seed, col("id"), "spr") * 0.04
    val bid = round(mid - spread / 2, 4)
    val ask = round(mid + spread / 2, 4)
    val askEx = weightedExchange(u(seed, col("id"), "ex"))
    val bidEx = weightedExchange(u(seed, col("id"), "bex"))
    base.select(
      element_at(array(tickers.map(lit): _*), col("_tix") + 1).as("ticker"),
      timestamp_micros(tsUs).as("ts"),
      bid.as("bid"),
      ask.as("ask"),
      (u(seed, col("id"), "bs") * 90 + 10).cast("long").as("bid_size"),
      (u(seed, col("id"), "as") * 90 + 10).cast("long").as("ask_size"),
      askEx.as("exchange"),
      col("day"),
      // --- reference-schema superset (sim/quotes.py:72-91) ---
      askEx.as("ask_exchange"),
      bidEx.as("bid_exchange"),
      ask.as("ask_price"),
      bid.as("bid_price"),
      quoteConditions(u(seed, col("id"), "qc"), u(seed, col("id"), "qcv"))
        .as("conditions"),
      quoteIndicators(u(seed, col("id"), "qi"), u(seed, col("id"), "qiv"))
        .as("indicators"),
      tsNs.as("participant_timestamp"),
      (lit(1000L) + col("k")).as("sequence_number"),
      (tsNs + 5000L + (u(seed, col("id"), "sip") * 45000).cast("long"))
        .as("sip_timestamp"),
      assignTape(askEx, u(seed, col("id"), "tape")).as("tape"),
      (tsNs + 10000L + (u(seed, col("id"), "trf") * 90000).cast("long"))
        .as("trf_timestamp"))
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
    * daily volume, carrying the reference's full trade column list
    * (sim/trades.py:80-98): conditions, correction, per-day sequential
    * id/sequence_number, sip/trf timestamps, trf_id, tape. Pure column
    * algebra over the quotes frame — two windows on (ticker, day), no
    * driver-side state.
    */
  def simulateTrades(quotes: DataFrame, targetVolumePerDay: Long,
                     seed: Long = 42L): DataFrame = {
    val sampleRate = 0.1
    // Draws are keyed on (ticker, ts), not ts alone: in a multi-ticker
    // universe, cross-ticker µs timestamp collisions would otherwise hand
    // the colliding rows identical take/side/size draws, correlating
    // trades across tickers.
    val tsU = unix_micros(col("ts"))
    val key = concat_ws("_", col("ticker"), tsU)
    val q = quotes.withColumn("_r", u(seed, key, "take"))
      .where(col("_r") < sampleRate)
    val tsN = tsU * 1000L
    val side = when(u(seed, key, "side") < 0.5, 1).otherwise(-1)
    val byDay = Window.partitionBy(col("ticker"), col("day"))
    val nPerDay = count(lit(1)).over(byDay)
    // Per-(ticker, day) sequential ids (reference np.arange per call);
    // ts is strictly monotone within a day so the ordering is total.
    val rn = row_number().over(byDay.orderBy(col("ts"))).cast("long")
    q.select(
      col("ticker"), col("ts"),
      when(side === 1, col("ask")).otherwise(col("bid")).as("price"),
      (lit(targetVolumePerDay) / nPerDay *
        (lit(0.5) + u(seed, key, "sz"))).cast("long").as("size"),
      side.as("side"),
      col("exchange"), col("day"),
      // --- reference-schema superset (sim/trades.py:80-98) ---
      lit("0").as("conditions"),
      lit(null).cast("long").as("correction"),
      (lit(1000000L) + rn - 1).as("id"),
      tsN.as("participant_timestamp"),
      (lit(2000000L) + rn - 1).as("sequence_number"),
      (tsN + 5000L + (u(seed, key, "tsip") * 195000).cast("long"))
        .as("sip_timestamp"),
      assignTape(col("exchange"), u(seed, key, "ttape")).as("tape"),
      (u(seed, key, "trfid") * 3).cast("long").as("trf_id"),
      (tsN + 10000L + (u(seed, key, "ttrf") * 390000).cast("long"))
        .as("trf_timestamp"))
  }
}
