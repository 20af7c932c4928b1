package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join — the general operator
  * behind "events inside a window" queries (the reference's event-window
  * flagging, ffn_polars/sim/market_events.py:is_within_events, is the
  * broadcast special case of this; here both sides may be large).
  *
  * Spark-first formulation: Catalyst plans a bare
  * `p.ts BETWEEN i.lo AND i.hi` as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(|P|·|I|) and the
  * classic 100 TB killer. The scale path is BINNING: quantize the range
  * domain into fixed-width bins, explode each interval onto the bins it
  * covers, map each point to its single bin, equi-join on the bin id,
  * then apply the exact range predicate. The join becomes a plain
  * shuffled hash/sort-merge join on an integer key; the explode factor
  * is bounded by span/binWidth + 1, so a binWidth near the typical
  * interval span keeps the blow-up ≈ 2×. Each (point, interval) pair
  * meets EXACTLY once — a point owns one bin — so no post-join dedup is
  * needed (the dedup a naive overlap-binning scheme would require).
  *
  * The domain is plain longs (epoch-µs for time, but any numeric range
  * works). Inclusive on both ends, matching SQL BETWEEN.
  */
object RangeJoin {

  /** Inner range join: rows of `points` paired with every row of
    * `intervals` whose [lo, hi] contains the point (inclusive).
    * `pointCol`/`loCol`/`hiCol` are LongType columns; other column
    * names must be disjoint between the two sides. Degenerate
    * intervals with lo > hi match nothing; NULL bounds or points are
    * dropped (SQL BETWEEN with NULL matches nothing).
    */
  def binned(points: DataFrame, pointCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")
    val bin = "__range_bin"
    val pb = points
      .filter(col(pointCol).isNotNull)
      .withColumn(bin, expr(s"`$pointCol` div ${binWidth}L"))
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn(bin, explode(sequence(
        expr(s"`$loCol` div ${binWidth}L"), expr(s"`$hiCol` div ${binWidth}L"))))
    pb.join(ib, Seq(bin))
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(bin)
  }
}
