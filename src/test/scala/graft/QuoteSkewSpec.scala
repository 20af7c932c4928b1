package graft

import org.apache.spark.sql.functions._

import graft.functions.Quote
import graft.operators.Skew

class QuoteSkewSpec extends SparkSpec {
  import spark.implicits._

  test("quote primitives: spread/mid/relative/microprice") {
    val df = Seq((99.0, 101.0, 300.0, 100.0)).toDF("bid", "ask", "bs", "as")
    val r = df.select(
      Quote.spread($"bid", $"ask"),
      Quote.midpoint($"bid", $"ask"),
      Quote.relativeSpreadBps($"bid", $"ask"),
      Quote.microprice($"bid", $"ask", $"bs", $"as")).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 100.0)
    assert(math.abs(r.getDouble(2) - 200.0) < 1e-9)
    // microprice leans toward the heavy bid side: (101*300 + 99*100)/400
    assert(math.abs(r.getDouble(3) - (101.0 * 300 + 99.0 * 100) / 400) < 1e-12)
  }

  test("NBBO picks best bid/ask and their venues across exchanges") {
    val df = Seq(
      ("A", 1, 99.0, 101.0, 10), ("A", 2, 99.5, 101.5, 11),
      ("A", 3, 99.2, 100.8, 12)).toDF("ticker", "ts", "bid", "ask", "exchange")
    val r = Quote.nbbo(df, Seq("ticker")).head()
    assert(r.getDouble(1) == 99.5 && r.getDouble(2) == 100.8)
    assert(r.getInt(3) == 11 && r.getInt(4) == 12)
  }

  private def withSQLConf(pairs: (String, String)*)(body: => Unit): Unit = {
    // conf.get returns null (not an exception) for unset keys whose
    // default is null — treat those as "unset on restore"
    val old = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splits the hot key at runtime (rel_join_agg shape)") {
    // rel_join_agg's fact-fact join relies on AQE for the skewed orders
    // key at scale; pin that behavior: one hot key holding ~99% of the
    // fact rows, thresholds scaled down to test size.
    val fact = ((1 to 40000).map(i => ("hot", s"payload_value_$i")) ++
      (1 to 400).map(i => (s"k${i % 20}", s"p$i"))).toDF("key", "payload")
    val dim = (Seq("hot") ++ (0 until 20).map("k" + _))
      .map(k => (k, k.length)).toDF("key", "attr")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    withSQLConf(confs: _*) {
      val joined = fact.join(dim, "key")
      // collect() drives joined.queryExecution itself, so executedPlan
      // below is the FINALIZED adaptive plan (a fresh write.save() would
      // re-plan on its own QueryExecution and leave this one unexecuted)
      assert(joined.collect().length == 40400)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join side:\n$plan")
    }
    // negative control: with skew handling off the marker must vanish,
    // so this test FAILS if someone disables AQE skew-join handling
    withSQLConf(confs :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      val joined = fact.join(dim, "key")
      assert(joined.collect().length == 40400)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n$plan")
      assert(!plan.contains("skew=true"))
    }
  }

  test("salted aggregations equal their direct counterparts on skewed data") {
    // 90% of rows on one hot key
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toDouble, s"u${i % 37}")
    }
    val df = rows.toDF("key", "v", "u")
    val direct = df.groupBy($"key")
      .agg(sum($"v"), avg($"v"), countDistinct($"u"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val ss = Skew.saltedSum(df, Seq("key"), "v", "u", 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sa = Skew.saltedAvg(df, Seq("key"), "v", "u", 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sd = Skew.saltedCountDistinct(df, Seq("key"), "u", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, (s, a, d)) =>
      assert(math.abs(ss(k) - s) < 1e-6, s"sum $k")
      assert(math.abs(sa(k) - a) < 1e-9, s"avg $k")
      assert(sd(k) == d, s"distinct $k")
    }
  }
}
