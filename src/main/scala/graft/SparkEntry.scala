package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Eod, Tick}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query key maps to.
  *
  * Oracle-parity conventions (SURVEY §6):
  *   - every float output is round()ed identically on both sides;
  *   - row identity is (event_type, event_id) — never raw timestamps
  *     (Spark truncates parquet ns → µs; DuckDB keeps ns);
  *   - window order is always (ts, event_id) — deterministic;
  *   - money-style sums go through DECIMAL casts (order-independent,
  *     exact) instead of float sums;
  *   - scalar constants (e.g. deannualized rf) are computed once in
  *     Scala and inlined into the oracle SQL as round-trip literals.
  */
object SparkEntry {

  // ------------------------------------------------------------ helpers

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong,
    * so `ts` arrives as Long ns. Normalize to TimestampType via exact
    * integer division (`div`, not `/` — ns values exceed 2^53 so a
    * double round-trip would lose precision).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-asset ordered window: the one shuffle all series ops share. */
  private val wT = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
  private val ordCols = Seq(col("ts"), col("event_id"))

  /** Synthetic deterministic columns shared by Spark and oracle SQL. */
  private val volume = (col("event_id") % 100 + 1).cast("double")         // tick volume
  private val stablePrice = lit(100.0) + (col("event_id") % 21 - 10) / 10.0 // bounded price
  private val smallRet = (col("event_id") % 7 - 3) / 1000.0               // bounded returns
  private val annRet = col("value") / 100000.0                            // small annual ret

  private val SQL_VOL = "(event_id % 100 + 1)::DOUBLE"
  private val SQL_STABLE = "(100.0 + (event_id % 21 - 10) / 10.0)"
  private val SQL_SMALLRET = "((event_id % 7 - 3) / 1000.0)"
  private val SQL_ANNRET = "(value / 100000.0)"

  /** Deannualized rf constant, inlined into SQL as a round-trip literal. */
  private val RF = 0.05
  private val NP = 252
  private val rfPeriodic: Double = math.pow(1.0 + RF, 1.0 / NP) - 1.0
  private val RF_LIT: String = java.lang.Double.toString(rfPeriodic)

  /** returns CTE shared by many oracles. */
  private val R_CTE =
    """WITH r AS (
      |  SELECT event_type, event_id, ts, value,
      |         value / lag(value) OVER w - 1 AS ret
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
      |)""".stripMargin

  /** drawdown CTE (prices have no nulls in testdata; ffill is identity). */
  private val DD_CTE =
    """WITH d AS (
      |  SELECT event_type, event_id, ts, value,
      |         value / max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS dd
      |  FROM events
      |)""".stripMargin

  private def withRet(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("ret", Eod.toReturns(col("value"), wT))

  private def withDd(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("dd", Eod.toDrawdownSeries(col("value"), wT))

  // ------------------------------------------------------------ flagship

  /** Flagship: TPC-H-Q1-shaped pricing summary on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    relPricingSummary(spark, "/root/testdata/sf0.001")

  private def relPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    // DECIMAL sums: exact + order-independent → identical to the oracle.
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast("decimal(30,8)")).cast("double"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(30,8)")).cast("double"), 2).as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(30,8)")).cast("double"), 2).as("sum_disc_price"),
        round(avg(col("l_quantity").cast("decimal(30,8)")).cast("double"), 6).as("avg_qty"),
        round(avg(col("l_discount").cast("decimal(30,8)")).cast("double"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- EOD series (SURVEY §2 ops 1,2,7,8,12,6,20,21)
    "eod_returns" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.toReturns(col("value"), wT), 6).as("ret"))),
    "eod_log_returns" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.toLogReturns(col("value"), wT), 6).as("log_ret"))),
    "eod_price_index" -> ((s, dir) =>
      events(s, dir).withColumn("sret", smallRet)
        .select(col("event_type"), col("event_id"),
          round(Eod.toPriceIndex(col("sret"), wT), 4).as("price_index"))),
    "eod_rebase" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.rebase(col("value"), wT), 6).as("rebased"))),
    "eod_drawdown" -> ((s, dir) =>
      withDd(s, dir).select(col("event_type"), col("event_id"),
        round(col("dd"), 6).as("drawdown"))),
    "eod_excess_returns" -> ((s, dir) =>
      withRet(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.toExcessReturns(col("ret"), RF, NP), 6).as("excess"))),
    "eod_deannualize" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.deannualize(col("value") / 100.0, NP), 6).as("deannualized"))),
    "eod_annualize" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Eod.annualize(annRet, (col("event_id") % 30 + 1).cast("double")), 6)
          .as("annualized"))),

    // ---- EOD aggregates (ops 3,4,5,9,10,11,13,14,15,16,17,18,22,23,24)
    "eod_total_return" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.totalReturn(col("value"), col("ts")), 6).as("total_return"))
        .orderBy(col("event_type"))),
    "eod_cagr" -> ((s, dir) =>
      events(s, dir).withColumn("p", stablePrice).groupBy(col("event_type"))
        .agg(round(Eod.cagr(col("p"), col("ts")), 6).as("cagr"))
        .orderBy(col("event_type"))),
    "eod_year_frac" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.yearFrac(col("ts")), 6).as("year_frac"))
        .orderBy(col("event_type"))),
    "eod_mtd" -> ((s, dir) =>
      events(s, dir)
        .withColumn("max_ts", max(col("ts")).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(round(Eod.mtd(col("value"), col("ts"), col("max_ts")), 6).as("mtd"))
        .orderBy(col("event_type"))),
    "eod_ytd" -> ((s, dir) =>
      events(s, dir)
        .withColumn("max_ts", max(col("ts")).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(round(Eod.ytd(col("value"), col("ts"), col("max_ts")), 6).as("ytd"))
        .orderBy(col("event_type"))),
    "eod_sharpe" -> ((s, dir) =>
      withRet(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.sharpe(col("ret"), RF, NP), 6).as("sharpe"))
        .orderBy(col("event_type"))),
    "eod_risk_return" -> ((s, dir) =>
      withRet(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.riskReturnRatio(col("ret")), 6).as("risk_return_ratio"))
        .orderBy(col("event_type"))),
    "eod_sortino" -> ((s, dir) =>
      withRet(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.sortino(col("ret"), RF, NP), 6).as("sortino"))
        .orderBy(col("event_type"))),
    "eod_information_ratio" -> ((s, dir) => {
      val r = withRet(s, dir)
        .where(col("event_type").isin("click", "view"))
        .withColumn("rn", row_number().over(wT))
      val a = r.where(col("event_type") === "click").select(col("rn"), col("ret").as("ra"))
      val b = r.where(col("event_type") === "view").select(col("rn"), col("ret").as("rb"))
      a.join(b, "rn")
        .agg(round(Eod.informationRatio(col("ra"), col("rb")), 6).as("ir"))
    }),
    "eod_max_drawdown" -> ((s, dir) =>
      withDd(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.maxDrawdownFromDrawdown(col("dd")), 6).as("max_drawdown"))
        .orderBy(col("event_type"))),
    "eod_ulcer_index" -> ((s, dir) =>
      withDd(s, dir).groupBy(col("event_type"))
        .agg(round(Eod.ulcerIndexFromDrawdown(col("dd")), 6).as("ulcer_index"))
        .orderBy(col("event_type"))),
    "eod_upi" -> ((s, dir) =>
      withDd(s, dir).withColumn("ret", Eod.toReturns(col("value"), wT))
        .groupBy(col("event_type"))
        .agg(round(Eod.ulcerPerformanceIndex(col("ret"), col("dd")), 6).as("upi"))
        .orderBy(col("event_type"))),
    "eod_calmar" -> ((s, dir) => {
      val e = events(s, dir).withColumn("p", stablePrice)
        .withColumn("dd", Eod.toDrawdownSeries(col("p"), wT))
      e.groupBy(col("event_type"))
        .agg(round(Eod.calmar(col("p"), col("ts"), col("dd")), 6).as("calmar"))
        .orderBy(col("event_type"))
    }),
    "eod_infer_nperiods" -> ((s, dir) =>
      events(s, dir)
        .withColumn("delta_sec", Tick.tsDeltaNs(col("ts"), wT) / 1e9)
        .groupBy(col("event_type"))
        .agg(Eod.inferNperiods(col("delta_sec")).as("nperiods"))
        .orderBy(col("event_type"))),
    "eod_infer_freq" -> ((s, dir) =>
      events(s, dir)
        .withColumn("delta_days", Tick.tsDeltaNs(col("ts"), wT) / lit(86400.0 * 1e9))
        .groupBy(col("event_type"))
        .agg(Eod.inferFreq(col("delta_days")).as("freq"))
        .orderBy(col("event_type"))),

    // ---- Tick (ops 25-38)
    "tick_trade_rate" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Tick.tradeRate(col("ts"), "ms"), 6).as("trade_rate"))
        .orderBy(col("event_type"))),
    "tick_inter_trade_time" -> ((s, dir) =>
      events(s, dir).withColumn("delta_ns", Tick.tsDeltaNs(col("ts"), wT))
        .groupBy(col("event_type"))
        .agg(round(Tick.interTradeTime(col("delta_ns"), "s"), 6).as("inter_trade_time"))
        .orderBy(col("event_type"))),
    "tick_burstiness" -> ((s, dir) =>
      events(s, dir).withColumn("delta_ns", Tick.tsDeltaNs(col("ts"), wT))
        .groupBy(col("event_type"))
        .agg(round(Tick.burstiness(col("delta_ns")), 6).as("burstiness"))
        .orderBy(col("event_type"))),
    "tick_volume_rate" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Tick.volumeRate(volume, col("ts"), "s"), 6).as("volume_rate"))
        .orderBy(col("event_type"))),
    "tick_ofi" -> ((s, dir) =>
      events(s, dir)
        .withColumn("sv", Tick.signVolumeByTickRule(volume, col("value"), wT))
        .groupBy(col("event_type"))
        .agg(round(Tick.orderFlowImbalance(col("sv")), 6).as("ofi"))
        .orderBy(col("event_type"))),
    "tick_traded_value" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(sum((col("value") * volume).cast("decimal(30,10)")).cast("double"), 2)
          .as("traded_value"))
        .orderBy(col("event_type"))),
    "tick_vwap" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(
          sum((col("value") * volume).cast("decimal(30,10)")).cast("double") /
            sum(volume.cast("decimal(30,10)")).cast("double"), 6).as("vwap"))
        .orderBy(col("event_type"))),
    "tick_rule" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        Tick.tickRule(col("value"), wT).cast("int").as("direction"))),
    "tick_signed_volume" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Tick.signVolumeByTickRule(volume, col("value"), wT), 6).as("signed_volume"))),
    "tick_imbalance" -> ((s, dir) =>
      events(s, dir).withColumn("dir", Tick.tickRule(col("value"), wT))
        .groupBy(col("event_type"))
        .agg(round(Tick.tickImbalance(col("dir")), 6).as("tick_imbalance"))
        .orderBy(col("event_type"))),
    "tick_micro_returns" -> ((s, dir) =>
      events(s, dir).select(col("event_type"), col("event_id"),
        round(Tick.microReturns(col("value"), wT), 6).as("micro_ret"))),
    "tick_pvr" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Tick.priceVolatilityRatio(col("value")), 6).as("pvr"))
        .orderBy(col("event_type"))),
    "tick_price_impact" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(Tick.priceImpact(col("value"), volume, col("ts")), 6).as("price_impact"))
        .orderBy(col("event_type"))),
    "tick_realized_vol" -> ((s, dir) =>
      events(s, dir).withColumn("lr", Tick.microReturns(col("value"), wT))
        .groupBy(col("event_type"))
        .agg(round(Tick.realizedVolatility(col("lr")), 6).as("realized_vol"))
        .orderBy(col("event_type"))),

    // ---- Relational core (ops 43-45)
    "rel_pricing_summary" -> ((s, dir) => relPricingSummary(s, dir)),
    "rel_join_agg" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem"); val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer"); val n = tbl(s, dir, "nation")
      val r = tbl(s, dir, "region")
      // dims broadcast; fact-fact join shuffles on the key.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(30,8)")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "rel_topn_per_group" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total_price"))
        .orderBy(col("o_orderpriority"), col("rk"))
    })
  )

  // ------------------------------------------------------------ oracles

  def oracleSql: Map[String, String] = Map(
    "eod_returns" ->
      """SELECT event_type, event_id,
        |  round(value / lag(value) OVER w - 1, 6) AS ret
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "eod_log_returns" ->
      """SELECT event_type, event_id,
        |  round(ln(value / lag(value) OVER w), 6) AS log_ret
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "eod_price_index" ->
      s"""SELECT event_type, event_id,
        |  round(exp(sum(ln(1 + coalesce($SQL_SMALLRET, 0))) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100, 4) AS price_index
        |FROM events""".stripMargin,
    "eod_rebase" ->
      """SELECT event_type, event_id,
        |  round(value / first_value(value) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100, 6) AS rebased
        |FROM events""".stripMargin,
    "eod_drawdown" ->
      s"$DD_CTE SELECT event_type, event_id, round(dd, 6) AS drawdown FROM d",
    "eod_excess_returns" ->
      s"$R_CTE SELECT event_type, event_id, round(ret - $RF_LIT, 6) AS excess FROM r",
    "eod_deannualize" ->
      """SELECT event_type, event_id,
        |  round(pow(value / 100.0 + 1.0, 1.0 / 252) - 1.0, 6) AS deannualized
        |FROM events""".stripMargin,
    "eod_annualize" ->
      s"""SELECT event_type, event_id,
        |  round(pow($SQL_ANNRET + 1.0, 365.0 / ((event_id % 30 + 1)::DOUBLE)) - 1.0, 6) AS annualized
        |FROM events""".stripMargin,
    "eod_total_return" ->
      """SELECT event_type,
        |  round(arg_max(value, ts) / arg_min(value, ts) - 1, 6) AS total_return
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_cagr" ->
      s"""SELECT event_type,
        |  round(pow(arg_max($SQL_STABLE, ts) / arg_min($SQL_STABLE, ts),
        |    1.0 / ((epoch_us(max(ts)) - epoch_us(min(ts))) / (1e6 * 31557600.0))) - 1, 6) AS cagr
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_year_frac" ->
      """SELECT event_type,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / (1e6 * 31557600.0), 6) AS year_frac
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_mtd" ->
      """WITH e AS (SELECT *, max(ts) OVER (PARTITION BY event_type) AS max_ts FROM events)
        |SELECT event_type,
        |  round(arg_max(value, ts) / arg_max(
        |    CASE WHEN month(ts) != month(max_ts) OR year(ts) != year(max_ts) THEN value END,
        |    CASE WHEN month(ts) != month(max_ts) OR year(ts) != year(max_ts) THEN ts END) - 1, 6) AS mtd
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_ytd" ->
      """WITH e AS (SELECT *, max(ts) OVER (PARTITION BY event_type) AS max_ts FROM events)
        |SELECT event_type,
        |  round(arg_max(CASE WHEN year(ts) = year(max_ts) THEN value END,
        |                CASE WHEN year(ts) = year(max_ts) THEN ts END)
        |      / arg_min(CASE WHEN year(ts) = year(max_ts) THEN value END,
        |                CASE WHEN year(ts) = year(max_ts) THEN ts END) - 1, 6) AS ytd
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_sharpe" ->
      s"""$R_CTE SELECT event_type,
        |  round(avg(ret - $RF_LIT) / stddev_samp(ret - $RF_LIT) * sqrt(252.0), 6) AS sharpe
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_risk_return" ->
      s"""$R_CTE SELECT event_type,
        |  round(avg(ret) / stddev_samp(ret) * sqrt(252.0), 6) AS risk_return_ratio
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_sortino" ->
      s"""$R_CTE SELECT event_type,
        |  round(CASE WHEN stddev_samp(least(ret - ${java.lang.Double.toString(RF / NP)}, 0.0)) != 0.0
        |    THEN avg(ret - ${java.lang.Double.toString(RF / NP)})
        |         / stddev_samp(least(ret - ${java.lang.Double.toString(RF / NP)}, 0.0)) * sqrt(252.0)
        |    END, 6) AS sortino
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_information_ratio" ->
      """WITH r AS (
        |  SELECT event_type, value / lag(value) OVER w - 1 AS ret,
        |         row_number() OVER w AS rn
        |  FROM events WHERE event_type IN ('click', 'view')
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |), a AS (SELECT rn, ret AS ra FROM r WHERE event_type = 'click'),
        |   b AS (SELECT rn, ret AS rb FROM r WHERE event_type = 'view')
        |SELECT round(coalesce(
        |  CASE WHEN isnan(avg(ra - rb) / stddev_samp(ra - rb)) THEN 0.0
        |       ELSE avg(ra - rb) / stddev_samp(ra - rb) END, 0.0), 6) AS ir
        |FROM a JOIN b USING (rn)""".stripMargin,
    "eod_max_drawdown" ->
      s"""$DD_CTE SELECT event_type, round(min(dd), 6) AS max_drawdown
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_ulcer_index" ->
      s"""$DD_CTE SELECT event_type, round(sqrt(avg(pow(dd * 100.0, 2.0))), 6) AS ulcer_index
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_upi" ->
      """WITH d AS (
        |  SELECT event_type, event_id, ts, value,
        |         value / max(value) OVER w2 - 1 AS dd,
        |         value / lag(value) OVER w - 1 AS ret
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
        |         w2 AS (PARTITION BY event_type ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type,
        |  round(avg(ret) / sqrt(avg(pow(dd * 100.0, 2.0))), 6) AS upi
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_calmar" ->
      s"""WITH d AS (
        |  SELECT event_type, event_id, ts, $SQL_STABLE AS p,
        |         $SQL_STABLE / max($SQL_STABLE) OVER (
        |           PARTITION BY event_type ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS dd
        |  FROM events
        |)
        |SELECT event_type,
        |  round((pow(arg_max(p, ts) / arg_min(p, ts),
        |    1.0 / ((epoch_us(max(ts)) - epoch_us(min(ts))) / (1e6 * 31557600.0))) - 1)
        |    / abs(min(dd)), 6) AS calmar
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_infer_nperiods" ->
      """WITH d AS (
        |  SELECT event_type,
        |    (epoch_us(ts) * 1000 - lag(epoch_us(ts) * 1000) OVER w) / 1e9 AS delta_sec
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |), v AS (
        |  SELECT event_type,
        |    CASE WHEN delta_sec > 1e-9 AND NOT isnan(delta_sec) THEN delta_sec END AS ds
        |  FROM d
        |)
        |SELECT event_type,
        |  CAST(CASE WHEN stddev_samp(ds) <= 1e-3 THEN
        |    CASE WHEN abs(mode(ds) - 365 * 86400.0) <= 86400.0 THEN 1
        |         WHEN abs(mode(ds) - 91 * 86400.0) <= 3 * 86400.0 THEN 4
        |         WHEN abs(mode(ds) - 30 * 86400.0) <= 3 * 86400.0 THEN 12
        |         WHEN abs(mode(ds) - 7 * 86400.0) <= 60 THEN 52
        |         WHEN abs(mode(ds) - 86400.0) <= 10 THEN 252
        |         WHEN abs(mode(ds) - 3600.0) <= 5 THEN 6048
        |         WHEN abs(mode(ds) - 60.0) <= 1 THEN 362880
        |         WHEN abs(mode(ds) - 1.0) <= 0.1 THEN 21772800
        |         WHEN mode(ds) > 0 THEN round(252.0 * 24 * 3600 / mode(ds))
        |    END END AS BIGINT) AS nperiods
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eod_infer_freq" ->
      """WITH d AS (
        |  SELECT event_type,
        |    (epoch_us(ts) * 1000 - lag(epoch_us(ts) * 1000) OVER w) / (86400.0 * 1e9) AS delta_days
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type,
        |  CASE WHEN stddev_samp(delta_days) IS NULL OR stddev_samp(delta_days) > 1.0 THEN 'unknown'
        |       WHEN abs(mode(delta_days) - 365.25) < 5 THEN 'yearly'
        |       WHEN abs(mode(delta_days) - 91) <= 3 THEN 'quarterly'
        |       WHEN abs(mode(delta_days) - 30) <= 3 THEN 'monthly'
        |       WHEN abs(mode(delta_days) - 7) <= 1 THEN 'weekly'
        |       WHEN abs(mode(delta_days) - 1) <= 0.1 THEN 'daily'
        |       ELSE 'unknown' END AS freq
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "tick_trade_rate" ->
      """SELECT event_type,
        |  round(count(*)::DOUBLE / ((epoch_us(max(ts)) * 1000 - epoch_us(min(ts)) * 1000) / 1e6), 6) AS trade_rate
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_inter_trade_time" ->
      """WITH d AS (
        |  SELECT event_type,
        |    epoch_us(ts) * 1000 - lag(epoch_us(ts) * 1000) OVER w AS delta_ns
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type, round(avg(delta_ns) / 1e9, 6) AS inter_trade_time
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_burstiness" ->
      """WITH d AS (
        |  SELECT event_type,
        |    epoch_us(ts) * 1000 - lag(epoch_us(ts) * 1000) OVER w AS delta_ns
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type, round(stddev_samp(delta_ns) / avg(delta_ns), 6) AS burstiness
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_volume_rate" ->
      s"""SELECT event_type,
        |  round(sum($SQL_VOL) / ((epoch_us(max(ts)) * 1000 - epoch_us(min(ts)) * 1000) / 1e9), 6) AS volume_rate
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_ofi" ->
      s"""WITH t AS (
        |  SELECT event_type, $SQL_VOL *
        |    (CASE WHEN value > lag(value) OVER w THEN 1
        |          WHEN value < lag(value) OVER w THEN -1 ELSE 0 END) AS sv
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type, round(sum(sv), 6) AS ofi
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_traded_value" ->
      s"""SELECT event_type,
        |  round(CAST(sum(CAST(value * $SQL_VOL AS DECIMAL(30,10))) AS DOUBLE), 2) AS traded_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_vwap" ->
      s"""SELECT event_type,
        |  round(CAST(sum(CAST(value * $SQL_VOL AS DECIMAL(30,10))) AS DOUBLE)
        |      / CAST(sum(CAST($SQL_VOL AS DECIMAL(30,10))) AS DOUBLE), 6) AS vwap
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_rule" ->
      """SELECT event_type, event_id,
        |  CAST(CASE WHEN value > lag(value) OVER w THEN 1
        |            WHEN value < lag(value) OVER w THEN -1 ELSE 0 END AS INT) AS direction
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "tick_signed_volume" ->
      s"""SELECT event_type, event_id,
        |  round($SQL_VOL * (CASE WHEN value > lag(value) OVER w THEN 1
        |                         WHEN value < lag(value) OVER w THEN -1 ELSE 0 END), 6) AS signed_volume
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "tick_imbalance" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CASE WHEN value > lag(value) OVER w THEN 1
        |         WHEN value < lag(value) OVER w THEN -1 ELSE 0 END AS dir
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type, round(sum(dir)::DOUBLE / count(*)::DOUBLE, 6) AS tick_imbalance
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_micro_returns" ->
      """SELECT event_type, event_id,
        |  round(ln(value) - lag(ln(value)) OVER w, 6) AS micro_ret
        |FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)""".stripMargin,
    "tick_pvr" ->
      """SELECT event_type, round(stddev_samp(value) / avg(value), 6) AS pvr
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_price_impact" ->
      s"""SELECT event_type,
        |  round((arg_max(value, ts) - arg_min(value, ts)) / sum($SQL_VOL), 6) AS price_impact
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tick_realized_vol" ->
      """WITH t AS (
        |  SELECT event_type, ln(value) - lag(ln(value)) OVER w AS lr
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |)
        |SELECT event_type, round(sqrt(sum(pow(lr, 2.0))), 6) AS realized_vol
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(avg(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 6) AS avg_qty,
        |  round(CAST(avg(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_join_agg" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "rel_topn_per_group" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |)
        |SELECT o_orderpriority, rk, o_orderkey, round(o_totalprice, 2) AS total_price
        |FROM ranked WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin
  )
}
