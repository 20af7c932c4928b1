package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Eod

class RollingSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  test("rolling mean/vol over a trailing frame match manual windows") {
    val rets = Seq(0.01, -0.02, 0.03, 0.0, 0.01, -0.01)
    val df = rets.zipWithIndex.map { case (r, i) => ("a", i, r) }.toDF("k", "t", "r")
    val out = df.select($"t",
        Eod.rollingMean($"r", w, 3).as("m"),
        Eod.rollingVolatility($"r", w, 3).as("v"))
      .orderBy($"t").as[(Int, Double, Option[Double])].collect()
    // t=2: frame {0.01,-0.02,0.03}
    val f = Seq(0.01, -0.02, 0.03)
    val mean = f.sum / 3
    assert(math.abs(out(2)._2 - mean) < 1e-12)
    val sd = math.sqrt(f.map(x => (x - mean) * (x - mean)).sum / 2)
    assert(math.abs(out(2)._3.get - sd) < 1e-12)
    // leading partial frames: t=0 has a single sample → null vol
    assert(out(0)._2 == 0.01)
  }

  test("rolling sharpe = rolling mean / rolling vol * sqrt(252)") {
    val rets = (1 to 30).map(i => math.sin(i.toDouble) / 100)
    val df = rets.zipWithIndex.map { case (r, i) => ("a", i, r) }.toDF("k", "t", "r")
    val rows = df.select(
        Eod.rollingSharpe($"r", w, 10).as("s"),
        (Eod.rollingMean($"r", w, 10) / Eod.rollingVolatility($"r", w, 10)
          * math.sqrt(252.0)).as("manual"))
      .where($"s".isNotNull)
      .as[(Double, Double)].collect()
    rows.foreach { case (s, m) => assert(math.abs(s - m) < 1e-12) }
  }

  test("rolling sortino: loss-only RMS denominator, null when no losses") {
    val rets = Seq(0.02, -0.01, 0.03, -0.02, 0.01)
    val df = rets.zipWithIndex.map { case (r, i) => ("a", i, r) }.toDF("k", "t", "r")
    val out = df.select($"t",
        Eod.rollingDownsideDev($"r", w, 3).as("dd"),
        Eod.rollingSortino($"r", w, 3).as("so"))
      .orderBy($"t").as[(Int, Double, Option[Double])].collect()
    // t=3: frame {-0.01, 0.03, -0.02} → RMS of {-0.01, 0, -0.02}
    val dd = math.sqrt((0.01 * 0.01 + 0.0 + 0.02 * 0.02) / 3)
    assert(math.abs(out(3)._2 - dd) < 1e-12)
    val mean = (-0.01 + 0.03 - 0.02) / 3
    assert(math.abs(out(3)._3.get - mean / dd * math.sqrt(252.0)) < 1e-12)
    // t=0: the only frame row is a gain → zero downside → null sortino
    assert(out(0)._2 == 0.0 && out(0)._3.isEmpty)
  }

  test("rolling up/down capture and win rate over a trailing frame") {
    // paired (ra, rb): benchmark up at t=0,2, down at t=1,3
    val rows = Seq(
      ("a", 0, 0.02, 0.01), ("a", 1, -0.01, -0.02),
      ("a", 2, 0.03, 0.02), ("a", 3, 0.01, -0.01))
    val df = rows.toDF("k", "t", "ra", "rb")
    val out = df.select($"t",
        Eod.rollingUpCapture($"ra", $"rb", w, 3).as("up"),
        Eod.rollingDownCapture($"ra", $"rb", w, 3).as("dn"),
        Eod.rollingWinRate($"ra", w, 3).as("wr"))
      .orderBy($"t")
      .as[(Int, Option[Double], Option[Double], Double)].collect()
    // t=2 frame {0,1,2}: up rows 0,2 → avg(ra)=0.025 / avg(rb)=0.015
    assert(math.abs(out(2)._2.get - 0.025 / 0.015) < 1e-12)
    // down rows: just row 1 → -0.01 / -0.02
    assert(math.abs(out(2)._3.get - 0.5) < 1e-12)
    assert(math.abs(out(2)._4 - 2.0 / 3) < 1e-12)
    // t=0 frame has no falling-benchmark row → null down-capture
    assert(out(0)._3.isEmpty && out(0)._2.isDefined)
    // t=3 frame {1,2,3}: down rows 1,3 → avg(ra)=0.0 / avg(rb)=-0.015 = -0.0
    assert(math.abs(out(3)._3.get - 0.0) < 1e-12)
  }
}
