package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed aggregations. A hot key (one ticker with 10% of
  * all ticks, one dedup bucket with a million docs) serializes a
  * groupBy on one reducer; salting splits each key into `salts`
  * sub-keys, aggregates partially per sub-key, then combines — two
  * small shuffles instead of one skewed one.
  *
  * Spark's map-side partial aggregation already handles *algebraic*
  * skew for hash aggregates; explicit salting is the tool when the
  * partial results themselves are large (collect_list-ish states,
  * distinct counts) or when AQE's skew handling can't apply (e.g.
  * window shuffles). The salt is a deterministic hash of a row column,
  * so retried tasks land identically (no rand()).
  */
object Skew {
  /** Salted sum: exact (sum is algebraic). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: String,
                saltCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltCol)), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(value)).as("_psum"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$value"))

  /** Salted average via (sum, count) — exact up to float re-association. */
  def saltedAvg(df: DataFrame, keys: Seq[String], value: String,
                saltCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltCol)), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(value)).as("_psum"), count(col(value)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg((sum(col("_psum")) / sum(col("_pcnt"))).as(s"avg_$value"))

  /** Salted exact distinct count: distinct within salted sub-groups
    * first (the salt must be derived from the counted column so equal
    * values land in the same sub-group), then sum of partial distincts.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
                          value: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(value)), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(countDistinct(col(value)).as("_pd"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_pd")).as(s"distinct_$value"))
}
