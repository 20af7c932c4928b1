package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout planning — the piece of a 100 TB training-data
  * pipeline that runs AFTER curation: deciding which output file every
  * row lands in. Two planners:
  *
  *  - [[shardPlan]]: size-budgeted sequential sharding (the "~512 MB
  *    parquet files" rule every lake enforces), deterministic so a
  *    re-run reproduces the same shard manifest bit-for-bit.
  *  - [[zorderValue]]: Morton/z-order interleaving of quantized
  *    dimensions (the OPTIMIZE ZORDER BY layout): files clustered on
  *    the z-key bound EVERY interleaved dimension's min/max, so scans
  *    filtering on any of them prune files — vs a single-column sort
  *    that prunes only its leading column.
  *
  * Both are pure integer Column algebra: no UDFs, codegen-friendly, and
  * engine-portable (the oracle runs the identical arithmetic).
  */
object Layout {

  /** Deterministic size-budgeted shard ids, per `groupCol` (one output
    * directory per group, the partitioned-write shape). Rows are
    * ordered by `idCol` within the group; a row's shard is its
    * EXCLUSIVE size prefix `div target` — the first-fit rule: shards
    * overflow by at most one row (a row larger than `target` gets a
    * shard of its own), ids are dense and monotone in `idCol`, and the
    * plan is a pure function of the data, so re-runs and engines agree.
    *
    * ONE per-group window pass (the write layer's own sort order), no
    * single-partition window anywhere.
    */
  def shardPlan(df: DataFrame, groupCol: String, idCol: String,
                sizeCol: String, target: Long): DataFrame = {
    require(target > 0, s"target must be positive, got $target")
    // integer `div`, not `/`: a double quotient can round up across an
    // integer boundary and misplace the row one shard late
    df.withColumn("shard_id",
      expr(s"coalesce(sum(`$sizeCol`) OVER (PARTITION BY `$groupCol` " +
        s"ORDER BY `$idCol` ROWS BETWEEN UNBOUNDED PRECEDING AND 1 " +
        s"PRECEDING), 0L) div ${target}L"))
  }

  /** Compaction (OPTIMIZE) planner over a file manifest — the
    * small-file bin-packer every lakehouse runs after streaming
    * ingest: files under `small` bytes are assigned to dense
    * target-size compaction bins (EXCLUSIVE small-size prefix `div`
    * target — the [[shardPlan]] rule, so bins overflow by at most one
    * file and the plan is a pure function of the manifest); files ≥
    * `small` keep their layout (action 'keep', bin −1). The manifest
    * is metadata-sized (#files, not #rows), exactly what production
    * compaction planners scan; one per-group window pass.
    */
  def compactionPlan(files: DataFrame, groupCol: String, orderCol: String,
                     sizeCol: String, small: Long, target: Long): DataFrame = {
    require(small > 0 && target > 0, s"small=$small target=$target")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sz = col(sizeCol).cast("long")
    val smallSz = when(sz < small, sz).otherwise(lit(0L))
    files
      .withColumn("_pre", coalesce(sum(smallSz).over(w), lit(0L)))
      .withColumn("action",
        when(sz < small, lit("compact")).otherwise(lit("keep")))
      .withColumn("bin",
        when(sz < small, expr(s"_pre div ${target}L")).otherwise(lit(-1L)))
      .drop("_pre")
  }

  /** Morton z-value of pre-quantized dimensions: each `dims(i)` must be
    * a non-negative integer < 2^bits; bit b of dim i lands at output
    * bit `b * ndims + i`. Pure shift/mask/add algebra, unrolled at plan
    * time — whole-stage codegen fuses it into one projection.
    */
  def zorderValue(dims: Seq[Column], bits: Int): Column = {
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits=$bits ndims=${dims.size} exceeds long range")
    val terms = for {
      (d, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    terms.reduce(_ + _)
  }

  /** The same z-value as ANSI SQL text, for oracle parity: the exact
    * shift/mask/add expression [[zorderValue]] plans, over the given
    * dim expressions.
    */
  def zorderSql(dims: Seq[String], bits: Int): String = {
    val terms = for {
      (d, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield s"((($d >> $b) & 1) << ${b * dims.size + i})"
    terms.mkString(" + ")
  }
}
