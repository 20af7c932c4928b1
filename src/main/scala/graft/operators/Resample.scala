package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bootstrap resampling of stats over a returns column — the Spark
  * re-expression of ffn_polars/df/core.py:10 `resample_returns`.
  *
  * The reference draws numpy random indices on a single node; that can't
  * scale (and can't be oracle-checked), so the index stream here is a
  * deterministic LCG over (key, trial, draw): idx = ((a·(ks + t·P + j)
  * + c) mod 2^31) mod n_k, where ks is an md5-derived per-key seed and
  * n_k the key's series length. Fully distributed AND fully in-plan:
  *
  *  - `rn`/`n_k` come from windows partitioned by the series key — no
  *    driver-side count(), no single-partition global sort;
  *  - the (key, trial, j) draw relation is the indexed data itself
  *    crossed with a broadcast trial range, so it has exactly
  *    trials × n_k rows per key with n_k never materialized anywhere;
  *  - the draw→value lookup is an equi-join on (key, idx) — shuffles on
  *    the key like every other keyed operator, 1000-executor-safe.
  *
  * The same formula runs in ANSI SQL (md5 nibbles → ks), so even the
  * "random" draws are oracle-replayable.
  */
object Resample {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31
  val P = 100003L     // trial stride (prime, decorrelates trials)

  /** md5-derived per-key LCG seed: first 8 hex chars of
    * md5(unit-separator-joined key columns) as a long in [0, 2^32).
    * Engine-neutral: SQL replays it as md5(k) for one key (concat_ws
    * never inserts the separator for a single column) or
    * md5(concat_ws(chr(31), ...)) for several.
    */
  private def keySeed(keyCols: Seq[String]): Column =
    conv(substring(md5(concat_ws("\u001f", keyCols.map(col): _*)), 1, 8), 16, 10)
      .cast("long")

  /** Deterministic (key, trial, rn) draw relation joined back to the
    * row_number()ed input — the shared scaffolding for all resampled
    * stats. Each key is an independent series resampled `numTrials`
    * times with replacement (sample size = its own length).
    *
    * `keyCols` must identify one series each (an asset, a symbol, an
    * event type) — they partition every window and every shuffle, which
    * is what keeps this operator distributed; resampling a single
    * global series is the degenerate one-key case.
    *
    * `ordCols` must be a deterministic total order within a key (e.g.
    * (ts, event_id), never ts alone — tied timestamps would make the rn
    * assignment, and therefore every draw, nondeterministic).
    */
  private def drawsAndRows(df: DataFrame, valueCol: String,
                           keyCols: Seq[String], ordCols: Seq[String],
                           numTrials: Int): DataFrame = {
    require(keyCols.nonEmpty,
      "resample needs >=1 series-key column (a keyless global resample " +
        "would funnel the whole input through one window partition)")
    val base = df.select((col(valueCol).as("v") +:
        (keyCols ++ ordCols).map(col)): _*)
      .where(col("v").isNotNull)
    val byKey = Window.partitionBy(keyCols.map(col): _*)
    val indexed = base
      .withColumn("rn", row_number().over(byKey.orderBy(ordCols.map(col): _*)) - 1)
      .select((keyCols.map(col) :+ col("rn") :+ col("v")): _*)
    // Per-key stats as ONE tiny aggregated relation (a row per series:
    // length + md5 seed), broadcast onto the draw generator — cheaper
    // than a second unbounded-count window pass over the data and a
    // digest per draw row, and the same values either way.
    val keyStats = indexed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("ks", keySeed(keyCols))
    val trials = df.sparkSession.range(numTrials.toLong)
      .select(col("id").as("trial"))
    // The draw relation IS the indexed data × broadcast trials (each row
    // contributes draw ordinal j = its own rn), so it is born with
    // trials × n_k rows per key — no driver count, no giant sequence()
    // array, and it inherits the data's partitioning.
    val draws = indexed
      .select((keyCols.map(col) :+ col("rn").as("j")): _*)
      .join(broadcast(keyStats), keyCols)
      .crossJoin(broadcast(trials))
      .withColumn("rn",
        pmod(lit(A) * (col("ks") + col("trial") * P + col("j")) + C, lit(M))
          .mod(col("n")))
      .select((keyCols.map(col) :+ col("trial") :+ col("rn")): _*)
    // hash join, not sort-merge: the draw side is trials× the data and
    // never worth sorting; the per-partition build side is one key's
    // series slice.
    draws.join(indexed.hint("shuffle_hash"), keyCols :+ "rn")
  }

  /** Resample `valueCol` per key (ordered by `ordCols`, which must be a
    * total order within each key) `numTrials` times with replacement;
    * returns (keyCols..., trial, stat) where stat = mean of the sampled
    * values, computed exactly via 1e-6-quantized integer sums
    * (engine-order-independent).
    *
    * ROW ORDER IS UNSPECIFIED (r14, Spark convention — like any
    * DataFrame transformation result): the relation's VALUES are
    * deterministic, but callers that need a presentation order must
    * sort. Before r14 these helpers carried a trailing orderBy, which
    * paid a range-partitioning exchange of the whole result purely for
    * presentation (the reference's resample returns ordered output;
    * this library follows Spark's unordered-relation contract instead).
    */
  def resampleMean(df: DataFrame, valueCol: String, keyCols: Seq[String],
                   ordCols: Seq[String], numTrials: Int): DataFrame =
    drawsAndRows(df, valueCol, keyCols, ordCols, numTrials)
      .withColumn("q", round(col("v") * 1e6).cast("long"))
      .groupBy((keyCols.map(col) :+ col("trial")): _*)
      .agg(round(sum(col("q")).cast("double") / (count(lit(1)) * 1e6), 6).as("stat"))

  /** Multi-stat form — the reference's resample_returns applies an
    * arbitrary stat fn returning a ROW of named stats per trial
    * (ffn_polars df/core.py:36-44, e.g. mean + sharpe per bootstrap
    * trial); each (name, fn) pair becomes an output column. All stats
    * share one draw relation and one aggregation pass.
    */
  def resampleStats(df: DataFrame, valueCol: String, keyCols: Seq[String],
                    ordCols: Seq[String], numTrials: Int)
                   (stats: (String, Column => Column)*): DataFrame = {
    require(stats.nonEmpty, "need >=1 (name, aggregate) stat")
    val aggs = stats.map { case (name, fn) => fn(col("v")).as(name) }
    drawsAndRows(df, valueCol, keyCols, ordCols, numTrials)
      .groupBy((keyCols.map(col) :+ col("trial")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Single-stat convenience (any aggregate Column over the resampled
    * value column `v`).
    */
  def resampleStat(df: DataFrame, valueCol: String, keyCols: Seq[String],
                   ordCols: Seq[String], numTrials: Int)
                  (stat: Column => Column): DataFrame =
    resampleStats(df, valueCol, keyCols, ordCols, numTrials)("stat" -> stat)
}
