package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bootstrap resampling of a stat over a returns column — the Spark
  * re-expression of ffn_polars/df/core.py:10 `resample_returns`.
  *
  * The reference draws numpy random indices on a single node; that can't
  * scale (and can't be oracle-checked), so the index stream here is a
  * deterministic LCG over (trial, draw): idx = ((a*(t*P + j) + c) mod
  * 2^31) mod n. Fully distributed: trials×draws is a generated relation
  * joined to row_number()ed data — one shuffle, no driver loops, and an
  * identical formula runs in ANSI SQL.
  */
object Resample {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31
  val P = 100003L     // trial stride (prime, decorrelates trials)

  /** Deterministic (trial, rn) draw relation joined to the
    * row_number()ed input — the shared scaffolding for all resampled
    * stats. The single-partition row_number is fine: a "series" is one
    * asset's history by construction (thousands of rows), not the whole
    * corpus.
    *
    * `ordCols` must be a deterministic total order (e.g. (ts, event_id),
    * never ts alone — tied timestamps would make the rn assignment, and
    * therefore every draw, nondeterministic).
    */
  private def drawsAndRows(df: DataFrame, valueCol: String, ordCols: Seq[String],
                           numTrials: Int): DataFrame = {
    val base = df.select((col(valueCol).as("v") +: ordCols.map(col)): _*)
      .where(col("v").isNotNull)
    val n = base.count()
    val indexed = base
      .withColumn("rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(ordCols.map(col): _*)) - 1)
      .select("rn", "v")
    val draws = indexed.sparkSession.range(numTrials.toLong * n)
      .select((col("id") / n).cast("long").as("trial"),
        pmod(lit(A) * (((col("id") / n).cast("long") * P) + (col("id") % n)) + C, lit(M))
          .mod(n).as("rn"))
    // The indexed series is one asset's history (bounded, thousands of
    // rows); the draw table is trials×n. Broadcasting the series keeps
    // the big side shuffle-free regardless of AQE's stats estimate.
    draws.join(broadcast(indexed), "rn")
  }

  /** Resample `valueCol` (ordered by `ordCols`, which must be a total
    * order) `numTrials` times with replacement; returns (trial, stat)
    * where stat = mean of the sampled values, computed exactly via
    * 1e-6-quantized integer sums (engine-order-independent).
    */
  def resampleMean(df: DataFrame, valueCol: String, ordCols: Seq[String],
                   numTrials: Int): DataFrame =
    drawsAndRows(df, valueCol, ordCols, numTrials)
      .withColumn("q", round(col("v") * 1e6).cast("long"))
      .groupBy(col("trial"))
      .agg(round(sum(col("q")).cast("double") / (count(lit(1)) * 1e6), 6).as("stat"))
      .orderBy(col("trial"))

  /** Generic form (reference resample_returns takes an arbitrary stat
    * fn): any aggregate Column over the resampled value column `v`.
    */
  def resampleStat(df: DataFrame, valueCol: String, ordCols: Seq[String],
                   numTrials: Int)(stat: Column => Column): DataFrame =
    drawsAndRows(df, valueCol, ordCols, numTrials)
      .groupBy(col("trial"))
      .agg(stat(col("v")).as("stat"))
      .orderBy(col("trial"))
}
