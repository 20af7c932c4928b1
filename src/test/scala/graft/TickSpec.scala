package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Tick

class TickSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  test("tick rule signs up/down/flat, first row 0") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 11.0), ("a", 3, 11.0), ("a", 4, 9.0))
      .toDF("k", "t", "p")
    val dir = df.select($"t", Tick.tickRule($"p", w).as("d"))
      .orderBy($"t").select($"d").as[Int].collect()
    assert(dir.sameElements(Array(0, 1, 0, -1)))
  }

  test("vwap = sum(pv)/sum(v)") {
    val df = Seq(("a", 10.0, 100.0), ("a", 20.0, 300.0)).toDF("k", "p", "v")
    val got = df.groupBy($"k").agg(Tick.vwap($"p", $"v").as("vw"))
      .select($"vw").as[Double].head()
    assert(math.abs(got - (10 * 100 + 20 * 300) / 400.0) < 1e-12)
  }

  test("realized volatility = sqrt(sum(logret^2))") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 101.0), ("a", 3, 99.5)).toDF("k", "t", "p")
    val got = df.withColumn("lr", Tick.microReturns($"p", w))
      .groupBy($"k").agg(Tick.realizedVolatility($"lr").as("rv"))
      .select($"rv").as[Double].head()
    val lr1 = math.log(101.0 / 100.0); val lr2 = math.log(99.5 / 101.0)
    assert(math.abs(got - math.sqrt(lr1 * lr1 + lr2 * lr2)) < 1e-12)
  }
}
