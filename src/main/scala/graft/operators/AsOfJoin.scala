package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join (latest right row with ts <= left ts,
  * per key) — the operator behind trade↔quote alignment in the reference
  * (ffn_polars/sim/trades.py builds trades off the latest quote; the
  * tick/latency module is its consumer).
  *
  * Spark-first formulation: tag both sides, union, sort within a single
  * key-partitioned window, forward-fill the right side's payload, keep
  * left rows. ONE shuffle on the key — no range-join explosion, no
  * per-key driver loops; this is the formulation that survives 100 TB
  * (both sides stream through a single sort-merge per key partition).
  */
object AsOfJoin {

  /** For each left row: latest right row with right.ts <= left.ts within
    * the same `key`. Right payload columns come back as `right_<name>`
    * (null when no prior right row exists — left-join semantics).
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String]): DataFrame =
    fillAsOf(left, right, key, ts, rightPayload, descending = false)

  /** Tolerance-bounded backward as-of (the `tolerance=` variant of
    * every as-of API, and the stale-quote guard real trade↔quote
    * alignment needs): the latest right row with ts <= left ts AND
    * age ≤ `maxAgeUs` microseconds. A match older than the tolerance
    * reverts to the no-match (null payload) outcome; `right_age_us`
    * reports the matched age. Same single key-shuffle plan as
    * [[backward]] — the tolerance is a post-fill predicate, never a
    * range-join explosion.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     ts: String, rightPayload: Seq[String],
                     maxAgeUs: Long): DataFrame = {
    val j = backward(left, right, key, ts, rightPayload :+ ts)
    val age = graft.functions.Tick.epochUs(col(ts)) -
      graft.functions.Tick.epochUs(col(s"right_$ts"))
    val within = col(s"right_$ts").isNotNull && age <= maxAgeUs
    rightPayload.foldLeft(j) { (df, c) =>
      df.withColumn(s"right_$c", when(within, col(s"right_$c")))
    }.withColumn("right_age_us", when(within, age))
      .drop(s"right_$ts")
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.ts >= left.ts within the same key (the mirror strategy —
    * "next quote after the trade"). Identical single-shuffle shape:
    * the window just traverses each key partition in DESCENDING time,
    * so forward-fill of the future right row is the same
    * last-ignoreNulls.
    */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
              rightPayload: Seq[String]): DataFrame =
    fillAsOf(left, right, key, ts, rightPayload, descending = true)

  /** Nearest as-of (the third join_asof strategy in the reference's
    * host API, polars `strategy="nearest"`): for each left row, the
    * right row with the SMALLEST absolute time distance within the
    * key; ties prefer the backward (earlier) match — a documented,
    * deterministic convention the oracle replays. Composition of the
    * two directional fills (two key-shuffles, still no range-join
    * explosion); `right_dist_us` reports the winning distance.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
              rightPayload: Seq[String]): DataFrame = {
    val pay = rightPayload :+ ts
    val b = pay.foldLeft(backward(left, right, key, ts, pay)) {
      (df, c) => df.withColumnRenamed(s"right_$c", s"_b_$c")
    }
    val f = pay.foldLeft(forward(b, right, key, ts, pay)) {
      (df, c) => df.withColumnRenamed(s"right_$c", s"_f_$c")
    }
    val us = (c: org.apache.spark.sql.Column) =>
      graft.functions.Tick.epochUs(c)
    val bAge = us(col(ts)) - us(col(s"_b_$ts"))
    val fAge = us(col(s"_f_$ts")) - us(col(ts))
    val useB = col(s"_f_$ts").isNull ||
      (col(s"_b_$ts").isNotNull && bAge <= fAge)
    rightPayload.foldLeft(f) { (df, c) =>
        df.withColumn(s"right_$c",
          when(useB, col(s"_b_$c")).otherwise(col(s"_f_$c")))
      }
      .withColumn("right_dist_us", when(useB, bAge).otherwise(fAge))
      .drop(pay.flatMap(c => Seq(s"_b_$c", s"_f_$c")): _*)
  }

  /** Shared fill: union the tagged sides, forward-fill the matched
    * right row as ONE struct, unpack to `right_<name>` columns.
    *
    * The struct fill is what makes the match ROW-ATOMIC: per-column
    * `last(ignoreNulls)` would let a NULL payload field fall through
    * to an OLDER right row than the one the match (and any age
    * predicate) reflects — a stale value sneaking past a tolerance
    * gate, and a divergence from ASOF JOIN semantics, which match
    * whole rows. The struct is non-null for every right row even when
    * all its fields are null, so the fill always carries the latest
    * matched row exactly as an ASOF JOIN would.
    */
  private def fillAsOf(left: DataFrame, right: DataFrame, key: String,
                       ts: String, rightPayload: Seq[String],
                       descending: Boolean): DataFrame = {
    val leftCols = left.columns
    val payStruct = struct(rightPayload.map(c => col(c).as(c)): _*)
    val payType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col(ts), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) :+
        lit(null).cast(payType).as("_rpay"): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col(ts), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("_rpay"): _*)
    // Right rows sort before left rows at equal ts (_side 0 < 1), so an
    // exactly-simultaneous quote is visible to the trade — ASOF `>=`.
    // Forward mode just traverses each key partition in DESCENDING time.
    val ord = if (descending) col(ts).desc else col(ts)
    val w = Window.partitionBy(col(key)).orderBy(ord, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_rpay", last(col("_rpay"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(filled) { (df, c) =>
        df.withColumn(s"right_$c", col(s"_rpay.$c"))
      }
      .where(col("_side") === 1).drop("_side", "_rpay")
  }
}
