package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drawdown episode table — the classic `drawdown_details` report of
  * the original ffn library (the reference port exposes the series
  * ops at ffn_polars/expr/eod/risk.py:64,90; this report is the
  * canonical consumer of that series): one row per underwater
  * episode with its start, trough, end, depth and length.
  *
  * Shape, not iteration: the episode id is a running count of
  * at-high-water rows (dd ≥ 0), so every underwater run shares the
  * id of the high that preceded it — the standard gaps-and-islands
  * trick, one window pass over the same per-series partitioning every
  * other series op uses. Episode stats are then ONE hash agg keyed by
  * (series, episode) with map-side combine: start = first underwater
  * row, trough = the lexicographic min of (dd, ts, ord) — the
  * EARLIEST row attaining the episode's min drawdown, deterministic
  * under duplicate timestamps — end = last underwater row, and
  * `recovered` marks whether the series made a new high afterwards
  * (an ongoing final drawdown reports false). Episodes are never
  * materialized row-per-tick anywhere downstream.
  *
  * The drawdown input is quantized (`round(dd, 6)`) BEFORE the
  * at-high test and the trough argmin so episode boundaries and
  * trough ties are decided on the same values the report exposes —
  * a last-ulp difference could otherwise move a row across episodes
  * between engines.
  */
object Drawdown {

  /** Episode table from a price series. Both timestamps and the `ord`
    * ids of the start/trough/end rows come out — ids are the
    * engine-portable row identity (parquet ns timestamps truncate
    * differently across readers), timestamps are the human report.
    *
    * Columns out: key, episode, start_ts, start_id, trough_ts,
    * trough_id, end_ts, end_id, n_obs, depth, recovered.
    */
  def details(df: DataFrame, key: String, ts: String, ord: String,
              price: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(col(ts), col(ord))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val filled = last(col(price), ignoreNulls = true).over(wCum)
    val dd = round(filled / max(filled).over(wCum) - 1, 6)
    val troughKey = struct(col("dd"), col(ts), col(ord))
    val ordKey = struct(col(ts), col(ord))
    df.withColumn("dd", dd)
      .withColumn("rn", row_number().over(wOrd))
      // Full-partition count rides the same key partitioning as the
      // cumulative windows — no second scan, no join.
      .withColumn("n_series", count(lit(1)).over(wAll))
      .withColumn("episode",
        sum(when(col("dd") >= 0, 1).otherwise(0)).over(wCum))
      .where(col("dd") < 0)
      .groupBy(col(key), col("episode"))
      .agg(
        min(col(ts)).as("start_ts"),
        min_by(col(ord), ordKey).as("start_id"),
        min_by(col(ts), troughKey).as("trough_ts"),
        min_by(col(ord), troughKey).as("trough_id"),
        max(col(ts)).as("end_ts"),
        max_by(col(ord), ordKey).as("end_id"),
        count(lit(1)).as("n_obs"),
        min(col("dd")).as("depth"),
        // recovered ⟺ some row (necessarily at-high) follows the run
        (max(col("rn")) < max(col("n_series"))).as("recovered"))
  }
}
