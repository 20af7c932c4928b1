package graft.sim

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Simulator plugin system — the Spark counterpart of the reference's
  * sim/plugins/{base,registry}.py: named, typed ("quotes" | "trades")
  * DataFrame transforms applied in configuration order after base
  * generation. Plugins stay declarative (DataFrame => DataFrame), so
  * they compose into the same Catalyst plan as the generator itself.
  */
trait SimPlugin {
  def name: String
  /** Which stream this plugin applies to: "quotes" or "trades". */
  def pluginType: String
  def apply(df: DataFrame, params: Map[String, String]): DataFrame
}

object PluginRegistry {
  private val registry = TrieMap.empty[String, SimPlugin]

  def register(plugin: SimPlugin): Unit = registry.put(plugin.name, plugin)
  def get(name: String): Option[SimPlugin] = registry.get(name)

  /** Apply the configured plugins of `pluginType` in order (reference
    * sim/__init__.py apply_plugins).
    */
  def applyAll(df: DataFrame, configs: Seq[(String, Map[String, String])],
               pluginType: String): DataFrame =
    configs.foldLeft(df) { case (acc, (name, params)) =>
      registry.get(name) match {
        case Some(p) if p.pluginType == pluginType => p(acc, params)
        case _                                     => acc
      }
    }

  /** Plugin-effect preview (reference sim/utils/preview.py:
    * preview_plugin_effect), as DATA rather than console prints: one
    * row per numeric column with its mean before/after the plugin and
    * the delta. Built declaratively (stack + join), so previewing a
    * 100 TB frame is still two aggregate jobs, not a driver loop.
    */
  def previewPluginEffect(df: DataFrame, pluginName: String,
                          params: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.NumericType
    val plugin = registry.getOrElse(pluginName,
      throw new IllegalArgumentException(s"plugin '$pluginName' not registered"))
    val after = plugin(df, params)
    // Per side: only columns that are numeric in THAT frame — a plugin
    // may drop/rename/retype columns (the reference preview tolerates
    // per-column failures; here they fall out of the join instead).
    def numCols(d: DataFrame): Seq[String] = d.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    def melt(d: DataFrame, as: String) = {
      val cols = numCols(d)
      if (cols.isEmpty)
        // stack(0) is invalid SQL; an empty preview is just no rows
        d.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("column",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField(as,
              org.apache.spark.sql.types.DoubleType))))
      else {
        val agg = d.select(cols.map(c => avg(col(c)).as(c)).toIndexedSeq: _*)
        val stackArgs = cols.map(c => s"'$c', `$c`").mkString(", ")
        agg.selectExpr(s"stack(${cols.length}, $stackArgs) as (column, $as)")
      }
    }
    // inner join on column name: columns numeric on both sides compare;
    // dropped/added/retyped ones are absent rather than erroring
    melt(df, "mean_before").join(melt(after, "mean_after"), "column")
      .withColumn("delta", col("mean_after") - col("mean_before"))
  }

  /** Shape-change inspector (reference sim/utils/preview.py:39
    * summary_diff), as DATA: one row with row/column counts before and
    * after the plugin. Row counts are two distributed count aggregates
    * joined 1×1 — previewing a 100 TB frame never collects it.
    */
  def previewSummaryDiff(df: DataFrame, pluginName: String,
                         params: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    val plugin = registry.getOrElse(pluginName,
      throw new IllegalArgumentException(s"plugin '$pluginName' not registered"))
    val after = plugin(df, params)
    df.agg(count(lit(1)).as("rows_before"))
      .withColumn("cols_before", lit(df.columns.length))
      .crossJoin(after.agg(count(lit(1)).as("rows_after"))
        .withColumn("cols_after", lit(after.columns.length)))
      .select(col("rows_before"), col("rows_after"),
        col("cols_before"), col("cols_after"),
        (col("rows_after") - col("rows_before")).as("rows_delta"),
        (col("cols_after") - col("cols_before")).as("cols_delta"))
  }

  /** Column-difference inspector (reference sim/utils/preview.py:59
    * column_changes), as DATA: one row per added / removed / retyped
    * column. Pure schema metadata — no job runs at all.
    */
  def previewColumnChanges(df: DataFrame, pluginName: String,
                           params: Map[String, String] = Map.empty): DataFrame = {
    val plugin = registry.getOrElse(pluginName,
      throw new IllegalArgumentException(s"plugin '$pluginName' not registered"))
    val after = plugin(df, params)
    val before = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val now = after.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      now.keys.filterNot(before.contains).toSeq.sorted
        .map(c => (c, "added", null: String, now(c))) ++
      before.keys.filterNot(now.contains).toSeq.sorted
        .map(c => (c, "removed", before(c), null: String)) ++
      before.keys.filter(c => now.get(c).exists(_ != before(c))).toSeq.sorted
        .map(c => (c, "retyped", before(c), now(c)))
    import df.sparkSession.implicits._
    rows.toDF("column", "change", "type_before", "type_after")
  }
}

/** Example plugin: widen quote spreads by a multiplicative factor
  * inside a [startUs, endUs) event window — the shape of the
  * reference's market-event injection (sim/market_events.py).
  */
object WideSpreadPlugin extends SimPlugin {
  import org.apache.spark.sql.functions._
  override val name = "wide_spread"
  override val pluginType = "quotes"
  override def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
    val factor = params.getOrElse("factor", "2.0").toDouble
    val startUs = params.getOrElse("start_us", "0").toLong
    val endUs = params.getOrElse("end_us", Long.MaxValue.toString).toLong
    val inWindow = unix_micros(col("ts")) >= startUs && unix_micros(col("ts")) < endUs
    val mid = (col("bid") + col("ask")) / 2
    val half = (col("ask") - col("bid")) / 2 * factor
    df.withColumn("bid", when(inWindow, round(mid - half, 4)).otherwise(col("bid")))
      .withColumn("ask", when(inWindow, round(mid + half, 4)).otherwise(col("ask")))
  }
}
