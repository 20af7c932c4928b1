package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drawdown, Sketch}

/** Drawdown episode report (op 126) and the KMV bottom-k sketch
  * family (ops 126b/127b).
  */
class DrawdownKmvSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: Long) => new java.sql.Timestamp(s * 1000)

  test("drawdown details: episodes, trough, depth, recovery flags") {
    // highs at 100, 110, 111; two underwater runs, the second ongoing
    val prices = Seq(100.0, 110.0, 105.0, 102.0, 108.0, 111.0, 107.0)
    val df = prices.zipWithIndex.map { case (p, i) =>
      ("a", ts(i.toLong), i.toLong, p)
    }.toDF("k", "ts", "id", "p")
    val out = Drawdown.details(df, "k", "ts", "id", "p")
      .orderBy($"episode")
      .select($"episode", $"start_id", $"trough_id", $"end_id", $"n_obs",
        $"depth", $"recovered")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(out.length == 2)
    // episode after the 2nd high: rows 105,102,108; trough 102 @ id 3
    assert(out(0)._1 == 2L && out(0)._2 == 2L && out(0)._3 == 3L &&
      out(0)._4 == 4L && out(0)._5 == 3L && out(0)._7)
    assert(math.abs(out(0)._6 - (102.0 / 110.0 - 1)) < 1e-6)
    // final drawdown 107 < 111, never recovered
    assert(out(1)._2 == 6L && out(1)._3 == 6L && out(1)._4 == 6L &&
      out(1)._5 == 1L && !out(1)._7)
    assert(math.abs(out(1)._6 - (107.0 / 111.0 - 1)) < 1e-6)
  }

  test("drawdown summary aggregates the episode table consistently") {
    val prices = Seq(100.0, 110.0, 105.0, 102.0, 108.0, 111.0, 107.0)
    val df = prices.zipWithIndex.map { case (p, i) =>
      ("a", ts(i.toLong), i.toLong, p)
    }.toDF("k", "ts", "id", "p")
    val det = Drawdown.details(df, "k", "ts", "id", "p")
    val s = det.groupBy($"k")
      .agg(count(lit(1)).as("n_ep"), min($"depth").as("max_depth"),
        max($"n_obs").as("max_dur"), sum($"n_obs").as("underwater"))
      .select($"n_ep", $"max_depth", $"max_dur", $"underwater")
      .as[(Long, Double, Long, Long)].head()
    // two episodes; deepest = 102/110−1; longest 3 rows; 4 of 7 underwater
    assert(s._1 == 2L && s._3 == 3L && s._4 == 4L)
    assert(math.abs(s._2 - (102.0 / 110.0 - 1)) < 1e-6)
  }

  test("drawdown details: a null price forward-fills, never breaks an episode") {
    val rows = Seq[(String, Long, Option[Double])](
      ("a", 0L, Some(100.0)), ("a", 1L, Some(90.0)),
      ("a", 2L, None), ("a", 3L, Some(100.0)), ("a", 4L, Some(95.0)))
    val df = rows.map { case (k, i, p) => (k, ts(i), i, p) }
      .toDF("k", "ts", "id", "p")
    val out = Drawdown.details(df, "k", "ts", "id", "p")
      .orderBy($"episode")
      .select($"start_id", $"end_id", $"n_obs", $"recovered")
      .as[(Long, Long, Long, Boolean)].collect()
    // one recovered episode spanning the null row (ffilled 90), one ongoing
    assert(out.toSeq == Seq((1L, 2L, 2L, true), (4L, 4L, 1L, false)))
  }

  test("KMV: below k the sketch is the distinct set and the count is exact") {
    val df = (0 until 10).map(i => ("g", s"v$i")).toDF("g", "v")
    val sk = Sketch.kmvSketch(df, Seq("g"), "v", k = 64)
    assert(sk.count() == 10)
    val est = Sketch.kmvEstimate(sk, Seq("g"), k = 64)
      .select($"n_kept", $"est_distinct").as[(Long, Double)].head()
    assert(est == ((10L, 10.0)))
  }

  test("KMV estimate lands in the expected error band") {
    // k=256 → relative std error ~1/sqrt(k-2) ≈ 6.3%
    val df = (0 until 5000).map(i => ("g", s"tok_$i")).toDF("g", "v")
    val sk = Sketch.kmvSketch(df, Seq("g"), "v", k = 256)
    val est = Sketch.kmvEstimate(sk, Seq("g"), k = 256)
      .select($"est_distinct").as[Double].head()
    assert(math.abs(est - 5000) / 5000 < 0.2, s"estimate $est")
  }

  test("KMV two-level bucket cut is lossless and sketches merge losslessly") {
    val all = (0 until 3000).map(i => s"tok_$i")
    val df = all.map(("g", _)).toDF("g", "v")
    val direct = Sketch.kmvSketch(df, Seq("g"), "v", k = 64, buckets = 8)
      .select($"h").as[Long].collect().toSet
    // ground truth: k smallest distinct 32-bit hashes, computed flat
    val flat = df.select(conv(substring(md5($"v"), 1, 8), 16, 10)
        .cast("long").as("h"))
      .distinct().orderBy($"h").limit(64).as[Long].collect().toSet
    assert(direct == flat)
    // union of the two halves' sketches ⊇ bottom-k of the union
    val h1 = Sketch.kmvSketch(all.take(1500).map(("g", _)).toDF("g", "v"),
      Seq("g"), "v", k = 64)
    val h2 = Sketch.kmvSketch(all.drop(1500).map(("g", _)).toDF("g", "v"),
      Seq("g"), "v", k = 64)
    val merged = h1.select($"h").union(h2.select($"h")).distinct()
      .orderBy($"h").limit(64).as[Long].collect().toSet
    assert(merged == flat)
  }

  test("KMV Jaccard estimate tracks the true overlap") {
    // A = 0..999, B = 500..1499 → J = 500/1500 = 1/3
    val a = (0 until 1000).map(i => ("a", s"t$i"))
    val b = (500 until 1500).map(i => ("b", s"t$i"))
    val sk = Sketch.kmvSketch((a ++ b).toDF("g", "v"), Seq("g"), "v", k = 256)
    val j = Sketch.kmvJaccard(sk, "g", k = 256)
      .select($"ga", $"gb", $"jaccard_est").as[(String, String, Double)].head()
    assert(j._1 == "a" && j._2 == "b")
    assert(math.abs(j._3 - 1.0 / 3.0) < 0.15, s"jaccard ${j._3}")
  }
}
