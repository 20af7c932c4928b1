package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Source layer for the star-schema testdata (and any parquet lake with
  * the same shape). Readers stay plain `spark.read.parquet` so Catalyst
  * keeps pushdown/pruning; the one normalization this layer owns is the
  * nanosecond-timestamp fix-up for `events`.
  */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeTimestamps(if (name == "events") normalizeEventTs(df) else df)
  }

  /** ns→µs ingest shim (reference README.md:40's nanosecond-support
    * TODO): accept nanosecond-grain event time as int64 ns-since-epoch
    * and land it on Spark's native µs TimestampType at the source
    * boundary. THE TRUNCATION CONTRACT, pinned by SourcesSpec:
    *   - sub-microsecond precision is DROPPED via `div 1000` — exact
    *     int64 integral division (`div`, not `/`: ns magnitudes exceed
    *     2^53, a double round-trip would corrupt low microseconds);
    *   - `div` truncates TOWARD ZERO, so post-epoch instants truncate
    *     earlier (1500 ns → 1 µs) and pre-epoch instants truncate
    *     later (−1500 ns → −1 µs) — both toward the epoch; ns already
    *     on a µs boundary are exact either side of the epoch.
    * Downstream event-time logic (windows, watermarks, as-of joins)
    * sees at most 999 ns of one-sided skew; ties created by the drop
    * break on the secondary sort key (event_id) like every other tie.
    */
  def fromNanos(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))

  /** events.parquet historically carried TIMESTAMP(NANOS), which Spark's
    * reader rejects; with spark.sql.legacy.parquet.nanosAsLong the column
    * arrives as Long ns — rebuild via the [[fromNanos]] contract.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => fromNanos(df, "ts")
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Parquet written with `isAdjustedToUTC=false` (e.g. pandas/pyarrow
    * naive timestamps) reads back as TIMESTAMP_NTZ in Spark 4, which
    * `unix_micros`, `withWatermark`, and the duration kernels all reject.
    * The session TZ is pinned to UTC everywhere in this library, so
    * casting NTZ → TimestampType is value-exact (same micros since
    * epoch). Applied to EVERY timestamp column of every table so a
    * testdata regeneration flipping the flag is a no-op.
    */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)(coerceNtz)
  }

  /** Coerce ONE column NTZ → TimestampType if (and only if) it is NTZ
    * — the single shared implementation behind [[normalizeTimestamps]]
    * and the streaming event-time coercion (EventStream.eventTime).
    */
  def coerceNtz(df: DataFrame, c: String): DataFrame =
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }

  /** Register all tables as temp views for SQL users. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Write a table bucketed+sorted by join keys. Two tables bucketed
    * the same way join WITHOUT a shuffle (see SourcesSpec) — at 100 TB
    * this is the difference between a co-located merge join and
    * re-shuffling the fact table on every query.
    *
    * `saveAsTable(overwrite)` only replaces tables the CURRENT catalog
    * knows about; a managed-table directory left by a previous JVM
    * (fresh in-memory catalog, same warehouse) fails the write with
    * LOCATION_ALREADY_EXISTS — so drop both the entry and the stale
    * directory first.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Hive-style partitioned parquet sink. Reads filtered on the
    * partition columns prune whole directories (PartitionFilters in the
    * scan — see SourcesSpec): at 100 TB a date/asset-partitioned lake
    * turns time-range queries into scans of only the touched days.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
