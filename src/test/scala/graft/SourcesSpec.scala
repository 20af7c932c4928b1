package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("square rewrite rule: pow(x,2) becomes a multiply in the plan") {
    functions.Graft.register(spark)
    val df = Seq(1.5, 2.5).toDF("x").select(pow($"x", 2.0).as("sq"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("(x#") && optimized.toLowerCase.contains("* x#")
      || !optimized.contains("POWER"), optimized)
    assert(df.as[Double].collect().sorted.sameElements(Array(2.25, 6.25)))
  }

  test("rel_pow2_rewrite: driver query runs the rewritten multiply") {
    functions.Graft.register(spark)
    val df = SparkEntry.queries("rel_pow2_rewrite")(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("POWER"),
      "pow(x,2) survived optimization: " + optimized.take(800))
    // value half: exact integral squares match a local replay
    val got = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, xs) =>
        k -> (xs.length.toLong, xs.map(x => x._2 * x._2).sum) }
    assert(got == want, s"got $got want $want")
  }

  test("bucketed tables join without a shuffle (co-located merge join)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val o = Tables.load(s2, "/root/testdata/sf0.001", "orders")
    val l = Tables.load(s2, "/root/testdata/sf0.001", "lineitem")
    Tables.writeBucketed(o.select($"o_orderkey", $"o_totalprice"),
      "orders_b", Seq("o_orderkey"), 4)
    Tables.writeBucketed(l.select($"l_orderkey", $"l_quantity"),
      "lineitem_b", Seq("l_orderkey"), 4)
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(1200)}")
    assert(joined.count() > 0)
  }

  test("registerViews exposes every table to SQL") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").as[Long].head() > 0)
    assert(spark.sql("SELECT count(*) FROM events").as[Long].head() > 0)
  }

  test("NTZ parquet (isAdjustedToUTC=false) loads as TimestampType, value-exact") {
    import org.apache.spark.sql.types._
    // Write a fixture whose ts is TIMESTAMP_NTZ — what pandas/pyarrow
    // naive timestamps become in Spark 4's reader — plus an NTZ date col
    // on a non-events table name, to pin the generalized normalization.
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val micros = Seq(1712928600000000L, 1712928601500000L)
    spark.createDataFrame(
        spark.sparkContext.parallelize(micros.zipWithIndex.map { case (us, i) =>
          org.apache.spark.sql.Row(i.toLong, us)
        }),
        StructType(Seq(StructField("event_id", LongType),
          StructField("ts_us", LongType))))
      .withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // raw read must come back NTZ or the fixture proves nothing
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.orderBy($"event_id")
      .select(unix_micros($"ts")).as[Long].collect()
    assert(got.toSeq == micros,
      s"NTZ→TZ cast not value-exact under UTC: ${got.toSeq}")
    // generalized path: any table, any NTZ column name
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, 1712928600000000L))),
        StructType(Seq(StructField("o_orderkey", LongType),
          StructField("us", LongType))))
      .withColumn("o_orderdate", timestamp_micros($"us").cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(Tables.load(spark, dir, "orders").schema("o_orderdate").dataType ==
      TimestampType)
  }

  test("partitioned writes prune partitions on filtered reads") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    Tables.writePartitioned(
      ev.select($"event_id", $"value", $"event_type"), out, Seq("event_type"))
    val back = spark.read.parquet(out).where($"event_type" === "click")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning in scan:\n${plan.take(1200)}")
    // pruned scan must not read the other types' directories
    val n = back.count()
    val total = spark.read.parquet(out).count()
    assert(n > 0 && n < total)
  }

  test("fromNanos pins the ns->us truncation contract (toward zero)") {
    val df = Seq(
      (1L, 1500L),          // post-epoch, sub-us remainder -> earlier
      (2L, 999L),           // under one us -> 0
      (3L, -1500L),         // pre-epoch -> truncates LATER (toward 0)
      (4L, 1712928600000000000L), // exact us boundary -> exact
      (5L, -1000L)          // negative exact boundary -> exact
    ).toDF("event_id", "ts")
    val out = Tables.fromNanos(df, "ts")
    assert(out.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val us = out.select($"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts"))
      .as[(Long, Long)].collect().toMap
    assert(us(1L) == 1L)
    assert(us(2L) == 0L)
    assert(us(3L) == -1L)
    assert(us(4L) == 1712928600000000L)
    assert(us(5L) == -1L)
  }
}
