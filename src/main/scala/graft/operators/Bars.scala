package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-based OHLCV bar construction from tick data — the content of
  * the reference's declared-but-empty bars module (ffn_polars/expr/
  * tick/bars.py). One hash aggregation over (key, window): open/close
  * via min_by/max_by on the timestamp (deterministic under partial
  * aggregation), VWAP per bar. Scales as a single shuffle keyed by
  * (key, bar) with map-side combine.
  */
object Bars {
  /** Tumbling-window OHLCV bars, e.g. `timeBars(df, "ticker", "ts",
    * "price", "volume", "5 minutes")`.
    */
  def timeBars(df: DataFrame, key: String, ts: String, price: String,
               volume: String, barLength: String): DataFrame =
    df.groupBy(col(key), window(col(ts), barLength).as("w"))
      .agg(
        min_by(col(price), col(ts)).as("open"),
        max(col(price)).as("high"),
        min(col(price)).as("low"),
        max_by(col(price), col(ts)).as("close"),
        sum(col(volume)).as("volume"),
        // decimal sums: order-independent → bar VWAPs are identical
        // across retries/partitionings (and engine-reproducible)
        (sum((col(price) * col(volume)).cast("decimal(30,10)")).cast("double") /
          sum(col(volume).cast("decimal(30,10)")).cast("double")).as("vwap"),
        count(lit(1)).as("n_ticks"))
      .select(col(key), col("w.start").as("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("volume"),
        col("vwap"), col("n_ticks"))

  /** Tick bars: one bar per `every` ticks (reference-adjacent concept;
    * needs a per-key ordered index → window then aggregate).
    */
  def tickBars(df: DataFrame, key: String, ts: String, price: String,
               volume: String, every: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts))
    df.withColumn("_bar", ((row_number().over(w) - 1) / every).cast("long"))
      .groupBy(col(key), col("_bar"))
      .agg(
        min_by(col(price), col(ts)).as("open"),
        max(col(price)).as("high"),
        min(col(price)).as("low"),
        max_by(col(price), col(ts)).as("close"),
        sum(col(volume)).as("volume"),
        count(lit(1)).as("n_ticks"))
      .withColumnRenamed("_bar", "bar")
  }
}
