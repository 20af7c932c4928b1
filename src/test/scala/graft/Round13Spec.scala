package graft

import org.apache.spark.sql.functions._

/** Round-13 wave: experimentation guards (SRM/CUPED/power users),
  * return forensics (bias ratio, Treynor–Mazuy), the
  * Grubbs/Theil–Sen/Bartlett/Mood stats quartet, embedding isotropy,
  * term burstiness, CCNet perplexity buckets, LSH range search,
  * perceptual-hash dedup and the streaming streaks twin. Each test is
  * an INDEPENDENT recomputation or an implementation-free invariant —
  * never a replay of the operator's own algebra.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def events =
    graft.sources.Tables.load(spark, dir, "events")

  /** md5 coin identical to the operators' op-77 convention. */
  private def coin(userId: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab_$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2).toInt
  }

  test("events_srm: chi2 matches a JVM-side md5 recount") {
    val users = events.select($"user_id").distinct()
      .as[Long].collect()
    val na = users.count(coin(_) == 0).toDouble
    val nb = users.size - na
    val exp = (na - nb) * (na - nb) / (na + nb)
    val got = SparkEntry.queries("events_srm")(spark, dir)
      .select($"n_a", $"n_b", $"chi2").as[(Long, Long, Double)]
      .collect().head
    assert(got._1 == na.toLong && got._2 == nb.toLong)
    assert(math.abs(got._3 - exp) < 1e-6, s"chi2 ${got._3} vs $exp")
  }

  test("events_cuped: theta and adjusted diff match a JVM recount") {
    val rows = events
      .select($"user_id", unix_micros($"ts"), $"value")
      .as[(Long, Long, Double)].collect()
    val mid = math.floor(
      (rows.map(_._2).min + rows.map(_._2).max) / 2.0).toLong
    val per = rows.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._2 < mid)
        .map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum
      val y = rs.filter(_._2 >= mid)
        .map(r => math.floor(r._3 * 1e6 + 0.5).toLong).sum
      (u, x, y)
    }.toArray
    val n = per.length.toDouble
    def d(l: Long) = l.toDouble
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxy = per.map(r => BigInt(r._2) * BigInt(r._3)).sum
    val sxx = per.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val theta = (n * sxy.toDouble - d(sx) * d(sy)) /
      (n * sxx.toDouble - d(sx) * d(sx))
    val a = per.filter(r => coin(r._1) == 0)
    val b = per.filter(r => coin(r._1) == 1)
    val xbar = d(sx) / n / 1e6
    def m(rs: Array[(Long, Long, Long)], f: ((Long, Long, Long)) => Long) =
      d(rs.map(f).sum) / rs.length / 1e6
    val expDiff = (m(a, _._3) - theta * (m(a, _._2) - xbar)) -
      (m(b, _._3) - theta * (m(b, _._2) - xbar))
    val got = SparkEntry.queries("events_cuped")(spark, dir)
      .select($"theta", $"diff_cuped", $"n_a", $"n_b")
      .as[(Double, Double, Long, Long)].collect().head
    assert(got._3 == a.length && got._4 == b.length)
    assert(math.abs(got._1 - theta) < 1e-5, s"theta ${got._1} vs $theta")
    assert(math.abs(got._2 - expDiff) < 1e-5, s"diff ${got._2} vs $expDiff")
  }

  test("events_power_users: histogram covers every user once, tiers split at 8/20") {
    val out = SparkEntry.queries("events_power_users")(spark, dir)
      .select($"active_days", $"tier", $"n_users")
      .as[(Long, String, Long)].collect()
    val nUsers = events.select($"user_id").distinct().count()
    assert(out.map(_._3).sum == nUsers)
    out.foreach { case (d, t, _) =>
      val exp = if (d >= 20) "power" else if (d >= 8) "core" else "casual"
      assert(t == exp, s"$d days labeled $t")
    }
  }

  test("eod_bias_ratio: band counts match a per-series JVM recount") {
    val rets = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) =>
          math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val got = SparkEntry.queries("eod_bias_ratio")(spark, dir)
      .select($"event_type", $"n_up_band", $"n_dn_band", $"bias_ratio")
      .as[(String, Long, Long, Double)].collect()
    got.foreach { case (k, up, dn, br) =>
      val q = rets(k)
      val n = q.length.toDouble
      val s = q.sum.toDouble
      val s2 = q.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val qsig = math.floor(
        math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0)) + 0.5)
        .toLong
      val expUp = q.count(v => v >= 0 && v <= qsig)
      val expDn = q.count(v => v >= -qsig && v < 0)
      assert(up == expUp && dn == expDn, s"$k bands ($up,$dn) vs ($expUp,$expDn)")
      assert(math.abs(br - math.floor(expUp / (1.0 + expDn) * 1e6 + 0.5) / 1e6)
        < 1e-9)
    }
  }

  test("eod_treynor_mazuy: OLS residuals are orthogonal to 1, x1, x2") {
    // Implementation-free OLS property: for each pair the residuals
    // of the fitted quadratic must be orthogonal to every regressor.
    val pairs = SparkEntry.queries("eod_treynor_mazuy")(spark, dir)
      .select($"pair_id", $"alpha", $"beta", $"gamma")
      .as[(String, Double, Double, Double)].collect()
    val rets = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) => y / x - 1 }.toArray
      }
    val bench = rets("view")
    pairs.foreach { case (k, a, b, g) =>
      val ra = rets(k)
      val n = math.min(ra.length, bench.length)
      // quantized regressors exactly as the operator defines them
      val ys = (0 until n).map(i => math.floor(ra(i) * 1e6 + 0.5) / 1e6)
      val x1 = (0 until n).map(i => math.floor(bench(i) * 1e6 + 0.5) / 1e6)
      val x2 = (0 until n).map(i =>
        math.floor(bench(i) * bench(i) * 1e6 + 0.5) / 1e6)
      val res = (0 until n).map(i => ys(i) - a - b * x1(i) - g * x2(i))
      val scale = ys.map(math.abs).sum + 1.0
      assert(math.abs(res.sum) / scale < 1e-3, s"$k: Σe=${res.sum}")
      assert(math.abs((0 until n).map(i => res(i) * x1(i)).sum) /
        (scale * 10) < 1e-2, s"$k: Σe·x1")
      assert(math.abs((0 until n).map(i => res(i) * x2(i)).sum) /
        (scale * 100) < 1e-2, s"$k: Σe·x2")
    }
  }

  test("stats_grubbs: G matches the direct max-deviation recount") {
    val rets = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) =>
          math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val got = SparkEntry.queries("stats_grubbs")(spark, dir)
      .select($"event_type", $"g_stat").as[(String, Double)].collect()
    got.foreach { case (k, g) =>
      val q = rets(k)
      val n = q.length.toDouble
      val mean = q.sum / n
      val sd = math.sqrt(q.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      val exp = q.map(v => math.abs(v - mean)).max / sd
      assert(math.abs(g - exp) < 1e-4, s"$k G $g vs $exp")
    }
  }

  test("stats_theil_sen: median pairwise slope matches a JVM recount") {
    val daily = events
      .select($"event_type", unix_micros($"ts"), $"value")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.groupBy(r => math.floor(r._2.toDouble / 86400000000.0).toLong)
          .map { case (d, vs) =>
            (d, vs.map(v => math.floor(v._3 * 1e6 + 0.5).toLong).sum.toDouble
              / vs.length / 1e6)
          }.toArray.sortBy(_._1)
      }
    val got = SparkEntry.queries("stats_theil_sen")(spark, dir)
      .select($"event_type", $"n_pairs", $"ts_slope")
      .as[(String, Long, Double)].collect()
    got.foreach { case (k, np, slope) =>
      val ds = daily(k)
      val slopes = (for {
        i <- ds.indices; j <- ds.indices if ds(i)._1 < ds(j)._1
      } yield (ds(j)._2 - ds(i)._2) / (ds(j)._1 - ds(i)._1)).sorted
      assert(np == slopes.length)
      val m = slopes.length
      val med = if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      assert(math.abs(slope - med) < 1e-5, s"$k slope $slope vs $med")
    }
  }

  test("stats_bartlett: chi2 matches a direct group-variance recount") {
    val rets = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) =>
          math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val k = rets.size.toDouble
    val ns = rets.values.map(_.length.toDouble)
    val s2s = rets.values.map { q =>
      val n = q.length.toDouble
      val mean = q.sum / n
      q.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    }
    val nTot = ns.sum
    val sp2 = ns.zip(s2s).map { case (n, s2) => (n - 1) * s2 }.sum / (nTot - k)
    val num = (nTot - k) * math.log(sp2) -
      ns.zip(s2s).map { case (n, s2) => (n - 1) * math.log(s2) }.sum
    val c = 1.0 + (ns.map(n => 1.0 / (n - 1)).sum - 1.0 / (nTot - k)) /
      (3.0 * (k - 1))
    val exp = num / c
    val got = SparkEntry.queries("stats_bartlett")(spark, dir)
      .select($"chi2").as[Double].collect().head
    assert(math.abs(got - exp) < 1e-4, s"chi2 $got vs $exp")
  }

  test("stats_mood_median: counts split at the interpolated grand median") {
    val rets = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) =>
          math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val all = rets.values.flatten.toArray.sorted
    val h = (all.length - 1) * 0.5
    val gm = all(h.toInt) + (h - h.toInt) *
      (all(math.ceil(h).toInt) - all(h.toInt))
    val above = rets.values.map(_.count(_.toDouble > gm)).sum
    val got = SparkEntry.queries("stats_mood_median")(spark, dir)
      .select($"n", $"grand_median", $"chi2").as[(Long, Double, Double)]
      .collect().head
    assert(got._1 == all.length)
    assert(math.abs(got._2 - math.floor(gm) / 1e6) < 1e-3 ||
      math.abs(got._2 - gm / 1e6) < 1e-6)
    // recount chi2 from the 2×k table
    val cells = rets.values.map { q =>
      (q.count(_.toDouble > gm).toDouble, q.count(_.toDouble <= gm).toDouble)
    }
    val n = all.length.toDouble
    val ta = cells.map(_._1).sum; val tb = cells.map(_._2).sum
    val exp = n * cells.map(c => c._1 * c._1 / (c._1 + c._2)).sum / ta +
      n * cells.map(c => c._2 * c._2 / (c._1 + c._2)).sum / tb - n
    assert(math.abs(got._3 - exp) < 1e-4, s"chi2 ${got._3} vs $exp")
    assert(above + rets.values.map(_.count(_.toDouble <= gm)).sum ==
      all.length)
  }

  test("embed_isotropy: identity equals the brute-force pairwise mean") {
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"embedding".cast("array<double>")).as[Array[Double]]
      .collect()
      .map { v =>
        val nm = math.sqrt(v.map(x => x * x).sum)
        v.map(x => math.floor(x / nm * 1e6 + 0.5) / 1e6)
      }
    val n = vecs.length
    var acc = 0.0
    for (i <- 0 until n; j <- 0 until n if i != j)
      acc += vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
    val exp = acc / (n.toDouble * (n - 1))
    val got = SparkEntry.queries("embed_isotropy")(spark, dir)
      .select($"mean_pairwise_cosine").as[Double].collect().head
    assert(math.abs(got - exp) < 1e-6, s"isotropy $got vs $exp")
  }

  test("text_term_burstiness: one term's VMR matches a JVM recount") {
    val out = SparkEntry.queries("text_term_burstiness")(spark, dir)
      .select($"term", $"df", $"total", $"vmr")
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 50)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"text").as[String].collect()
    val nd = docs.length.toDouble
    val (term, df, total, vmr) = out.head
    val counts = docs.map(_.trim.split("\\s+").count(_ == term))
    assert(counts.count(_ > 0) == df)
    assert(counts.sum == total)
    val c2 = counts.map(c => c.toDouble * c).sum
    val expVmr = math.floor(
      (nd * c2 - total.toDouble * total) / (nd * total) * 1e6 + 0.5) / 1e6
    assert(math.abs(vmr - expVmr) < 1e-9, s"$term vmr $vmr vs $expVmr")
  }

  test("corpus_ppl_buckets: per-lang doc mass conserved, head cleaner than tail") {
    val out = SparkEntry.queries("corpus_ppl_buckets")(spark, dir)
      .select($"lang", $"bucket", $"n_docs", $"mean_xent")
      .as[(String, String, Long, Double)].collect()
    val perLang = out.groupBy(_._1)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == docs(lang), s"$lang doc mass")
      val byB = rows.map(r => r._2 -> r._4).toMap
      assert(byB("head") <= byB("tail"), s"$lang head > tail xent")
    }
  }

  test("ann_range_search: threshold respected and consistent with topk") {
    val rs = SparkEntry.queries("ann_range_search")(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    assert(rs.forall(_._3 >= 0.25 - 1e-9))
    val inRange = rs.map(r => (r._1, r._2)).toSet
    // every top-k hit at or above the threshold must appear
    SparkEntry.queries("ann_topk_lsh")(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .filter(_._3 >= 0.2501) // skip boundary rounding ambiguity
      .foreach { case (q, nb, c) =>
        assert(inRange.contains((q, nb)), s"topk ($q,$nb,$c) missing")
      }
  }

  test("mm_phash_dedup: planted identical payloads pair at Hamming 0") {
    val out = SparkEntry.queries("mm_phash_dedup")(spark, dir)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect()
    assert(out.forall(_._3 <= 10))
    val pairs = out.map(r => (r._1, r._2, r._3))
    // doc_id % 97 == 0 got an IDENTICAL text copy at +2000000 ⇒ the
    // same md5 ⇒ the same image ⇒ Hamming 0 through every band.
    val docIds = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long].collect().filter(_ % 97 == 0)
    docIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 2000000 && p._3 == 0),
        s"planted dup $id missing at Hamming 0")
    }
  }

  test("streaming_streaks: final maxima equal a batch island recount") {
    val rows = events.where($"value" > 0)
      .select($"event_type", $"event_id", $"value")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1)
    val expMax = rows.map { case (k, rs) =>
      val p = rs.sortBy(_._2).map(_._3)
      val sgns = p.sliding(2).collect { case Array(x, y) =>
        java.lang.Long.signum(math.floor((y / x - 1) * 1e6 + 0.5).toLong)
      }.toArray
      var cur = 0L; var curSgn = 2; var mw = 0L; var ml = 0L
      sgns.foreach { s =>
        cur = if (s == curSgn) cur + 1 else 1L
        curSgn = s
        if (s == 1) mw = math.max(mw, cur)
        if (s == -1) ml = math.max(ml, cur)
      }
      k -> (mw, ml)
    }
    val got = SparkEntry.queries("streaming_streaks")(spark, dir)
      .groupBy($"symbol")
      .agg(max($"max_win_streak").as("mw"), max($"max_loss_streak").as("ml"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    got.foreach { case (k, mw, ml, n) =>
      val (emw, eml) = expMax(k)
      assert(mw == emw && ml == eml, s"$k ($mw,$ml) vs ($emw,$eml)")
      assert(n == rows(k).size - 1, s"$k emitted $n rows")
    }
  }
}
