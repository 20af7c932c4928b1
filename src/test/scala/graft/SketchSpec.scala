package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Corpus, Sketch}

/** Sketch family (SURVEY §2 ops 118-119), the weighted sampler (120),
  * C4 line filters (121), and the tolerance as-of (122).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate is within the expected error band") {
    // 10k distinct values, m=256 → relative std error 1.04/16 ≈ 6.5%.
    val df = (0 until 10000).map(i => s"val_$i").toDF("v")
    val regs = Sketch.hllRegisters(df.withColumn("g", lit("x")), Seq("g"), "v")
    val est = Sketch.hllEstimate(regs, Seq("g"))
      .select($"est_distinct").as[Double].head()
    assert(math.abs(est - 10000) / 10000 < 0.2, s"estimate $est")
  }

  test("HLL is duplicate-insensitive and registers max-merge") {
    val base = (0 until 2000).map(i => s"tok_$i")
    val dups = base ++ base ++ base.take(500)
    val half1 = base.take(1200).toDF("v").withColumn("g", lit("a"))
    val half2 = base.drop(800).toDF("v").withColumn("g", lit("b")) // overlap 800..1199
    val whole = dups.toDF("v").withColumn("g", lit("w"))

    val estWhole = Sketch.hllEstimate(
      Sketch.hllRegisters(whole, Seq("g"), "v"), Seq("g"))
      .select($"est_distinct").as[Double].head()
    // Merge the two halves' register tables by max — must equal the
    // single-pass estimate over their union (= base = whole distinct).
    val merged = Sketch.hllRegisters(half1.unionByName(half2), Seq("g"), "v")
      .groupBy($"reg").agg(max($"max_rank").as("max_rank"))
      .withColumn("g", lit("m"))
    val estMerged = Sketch.hllEstimate(merged, Seq("g"))
      .select($"est_distinct").as[Double].head()
    assert(estWhole == estMerged, s"$estWhole != $estMerged")
  }

  test("NULL values carry no cardinality or frequency") {
    val clean = (0 until 500).map(i => Option(s"v_$i"))
    val noisy = clean ++ Seq.fill(50)(Option.empty[String])
    def est(xs: Seq[Option[String]]) = Sketch.hllEstimate(
      Sketch.hllRegisters(xs.toDF("v").withColumn("g", lit(1)), Seq("g"), "v"),
      Seq("g")).select($"est_distinct").as[Double].head()
    assert(est(clean) == est(noisy))
    assert(Sketch.cmsCounters(noisy.toDF("v"), "v").agg(sum($"cnt"))
      .as[Long].head() == 4 * 500L)
  }

  test("HLL overlap: identical groups intersect fully, disjoint near zero") {
    val xs = (0 until 3000).map(i => s"t$i")
    val ys = (0 until 3000).map(i => s"u$i") // disjoint from xs
    val df = (xs.map(("a", _)) ++ xs.map(("b", _)) ++ ys.map(("c", _)))
      .toDF("g", "v")
    val ov = graft.operators.Sketch.hllOverlap(
        graft.operators.Sketch.hllRegisters(df, Seq("g"), "v"))
      .orderBy($"ga", $"gb")
      .select($"ga", $"gb", $"est_a", $"est_b", $"est_union", $"est_intersect")
      .as[(String, String, Double, Double, Double, Double)].collect()
    val ab = ov.find(r => r._1 == "a" && r._2 == "b").get
    // identical sets: union registers == single registers, so the
    // intersect estimate is EXACTLY the single estimate
    assert(ab._5 == ab._3 && ab._6 == ab._3)
    val ac = ov.find(r => r._1 == "a" && r._2 == "c").get
    // disjoint sets: intersect ≈ 0 within the ~3x-compounded HLL error
    assert(math.abs(ac._6) < 0.3 * ac._5, s"disjoint intersect ${ac._6}")
  }

  test("CMS never underestimates and ranks the true heavy hitter first") {
    val toks = Seq.fill(500)("heavy") ++ (0 until 300).map(i => s"light_$i")
    val df = toks.toDF("tok")
    val out = Sketch.cmsTopK(df, "tok", depth = 4, width = 1024, topK = 5)
      .select($"v", $"est_cnt", $"exact_cnt")
      .as[(String, Long, Long)].collect()
    assert(out.head._1 == "heavy" && out.head._3 == 500L)
    out.foreach { case (_, est, exact) => assert(est >= exact) }
    // Counter table is fixed-size regardless of input.
    assert(Sketch.cmsCounters(df, "tok", 4, 1024).count() <= 4 * 1024)
  }

  test("weightedSampleN: exact n per stratum, weight-biased, zero-weight excluded") {
    val rows = (0L until 50L).map(i => (i, "s", 10000L)) ++
      (50L until 1050L).map(i => (i, "s", 1L)) ++
      Seq((9999L, "s", 0L)) // weight 0 — must never appear
    val df = rows.toDF("id", "src", "w")
    val out = Corpus.weightedSampleN(df, "id", $"src", $"w", n = 20)
      .select($"id").as[Long].collect()
    assert(out.length == 20)
    assert(!out.contains(9999L))
    // P(heavy) is ~10000× light per draw; the deterministic md5 draw
    // must reflect the bias overwhelmingly.
    assert(out.count(_ < 50) >= 15, s"heavy picks: ${out.count(_ < 50)}")
    // Deterministic: same input → same sample.
    val again = Corpus.weightedSampleN(df, "id", $"src", $"w", n = 20)
      .select($"id").as[Long].collect()
    assert(out.sorted.sameElements(again.sorted))
  }

  test("c4LineFilters applies the line and doc rules") {
    val good = "one two three four five six.\nseven eight nine ten eleven!\n" +
      "this line has six words too.\nshort one." // last line < 5 words → dropped
    val noPunct = "one two three four five six\nseven eight nine ten eleven\nmore words no punct here now"
    val lorem = good + "\nand Lorem Ipsum dolor sit amet."
    val brace = good + "\nvar x = function() {."
    val df = Seq((1L, good), (2L, noPunct), (3L, lorem), (4L, brace))
      .toDF("doc_id", "text")
    val out = Corpus.c4LineFilters(df, "doc_id", "text")
      .orderBy($"id")
      .select($"n_lines", $"n_kept_lines", $"has_lorem", $"has_brace", $"keep_doc")
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(out(0) == ((4L, 3L, false, false, true)))   // 3 kept lines → keep
    assert(out(1) == ((3L, 0L, false, false, false)))  // no terminal punct
    assert(out(2) == ((5L, 4L, true, false, false)))   // lorem kills the doc
    assert(out(3) == ((5L, 4L, false, true, false)))   // brace kills the doc
  }

  test("as-of match is row-atomic: a NULL payload field never falls back to an older row") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val trades = Seq((1L, ts(110), 10L)).toDF("k", "ts", "tid")
    // newer quote has a NULL px — the match must carry THAT row's null,
    // not resurrect px=7.0 from the older quote
    val quotes = Seq((1L, ts(90), Some(7.0)), (1L, ts(100), Option.empty[Double]))
      .toDF("k", "ts", "px")
    val plain = AsOfJoin.backward(trades, quotes, "k", "ts", Seq("px"))
      .select($"tid", $"right_px").as[(Long, Option[Double])].head()
    assert(plain == ((10L, None)))
    // and the tolerance gate can't be passed by the stale value either
    val tol = AsOfJoin.backwardWithin(trades, quotes, "k", "ts", Seq("px"),
        maxAgeUs = 15L * 1000000L)
      .select($"tid", $"right_px", $"right_age_us")
      .as[(Long, Option[Double], Option[Long])].head()
    assert(tol == ((10L, None, Some(10000000L))))
  }

  test("backwardWithin nulls matches older than the tolerance") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val trades = Seq((1L, ts(100), 10L), (1L, ts(500), 11L), (2L, ts(50), 12L))
      .toDF("k", "ts", "tid")
    val quotes = Seq((1L, ts(90), 7.0), (1L, ts(120), 8.0))
      .toDF("k", "ts", "px")
    val out = AsOfJoin.backwardWithin(trades, quotes, "k", "ts",
        Seq("px"), maxAgeUs = 60L * 1000000L)
      .orderBy($"tid")
      .select($"tid", $"right_px", $"right_age_us")
      .as[(Long, Option[Double], Option[Long])].collect()
    assert(out(0) == ((10L, Some(7.0), Some(10000000L)))) // 10s old — kept
    assert(out(1) == ((11L, None, None))) // best match 380s old — too stale
    assert(out(2) == ((12L, None, None))) // no quote at all for key 2
  }

  test("histogram quantile sketch: estimates within half a bin width") {
    val vals = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val sk = Sketch.histSketch(vals, Seq("g"), "v", lo = 0.0, hi = 128.0,
      nBins = 32) // width 4
    val qs = Sketch.histQuantiles(sk, Seq("g"), Seq(0.25, 0.5, 0.75),
        lo = 0.0, hi = 128.0, nBins = 32)
      .select($"q", $"est", $"n").as[(Double, Double, Long)]
      .collect().sortBy(_._1)
    assert(qs.map(_._3).forall(_ == 100L))
    // interpolated truths 25.75/50.5/75.25; the bin-midpoint sits
    // within width/2 of the RANK statistic, so within one full bin
    // width (4) of the interpolated quantile
    val truth = Map(0.25 -> 25.75, 0.5 -> 50.5, 0.75 -> 75.25)
    qs.foreach { case (q, est, _) =>
      assert(math.abs(est - truth(q)) <= 4.0, s"q=$q est=$est") }
  }

  test("histogram sketches merge by summing bins; outliers clamp to edges") {
    val a = (1 to 50).map(i => ("x", i.toDouble))
    val b = (51 to 100).map(i => ("x", i.toDouble)) :+ (("x", 99999.0))
    val whole = Sketch.histSketch((a ++ b).toDF("g", "v"), Seq("g"), "v",
      0.0, 128.0, 32)
    val merged = Sketch.histSketch(a.toDF("g", "v"), Seq("g"), "v", 0.0, 128.0, 32)
      .unionByName(Sketch.histSketch(b.toDF("g", "v"), Seq("g"), "v", 0.0, 128.0, 32))
      .groupBy($"g", $"bin").agg(sum($"cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    // the 99999.0 outlier landed in the top bin, not outside the sketch
    val top = whole.where($"bin" === 31).select($"cnt").as[Long].head()
    assert(top >= 1L)
  }
}
