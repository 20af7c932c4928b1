package graft

import org.apache.spark.sql.functions._

/** Round-11 fourth wave: Dickey–Fuller unit root, Engle–Granger
  * cointegration, Welch's t, one-way ANOVA, realized higher moments,
  * TPC-H Q17, UniMax budget allocation. Each query is checked against
  * an INDEPENDENT in-test recomputation (collected rows + plain Scala
  * math in a different algebraic form), not a restatement of the
  * production expression.
  */
class Round11dSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** value series per event_type in the pinned (ts, event_id) order. */
  private def seriesRows(): Map[String, Array[Double]] =
    graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._3)).map(_._4)
      }

  private def retsOf(p: Array[Double]): Array[Double] =
    p.sliding(2).map { case Array(a, b) => b / a - 1 }.toArray

  test("eod_adf: closed-form DF regression matches centered-sum OLS") {
    val got = SparkEntry.queries("eod_adf")(spark, dir)
      .select($"event_type", $"rho", $"adf_tstat", $"verdict")
      .as[(String, Double, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((k, p) <- seriesRows()) {
      val y = p.map(math.log)
      val x = y.dropRight(1)
      val dy = y.drop(1).zip(x).map { case (a, b) => a - b }
      val n = x.length
      val mx = x.sum / n; val my = dy.sum / n
      val cxx = x.map(v => (v - mx) * (v - mx)).sum
      val cxy = x.zip(dy).map { case (a, b) => (a - mx) * (b - my) }.sum
      val cyy = dy.map(v => (v - my) * (v - my)).sum
      val rho = cxy / cxx
      val s2 = (cyy - rho * cxy) / (n - 2.0)
      val t = rho / math.sqrt(s2 / cxx)
      assert(math.abs(got(k)._1 - rho) < 1e-6, s"$k rho ${got(k)._1} vs $rho")
      assert(math.abs(got(k)._2 - t) < 1e-5, s"$k t ${got(k)._2} vs $t")
      assert(got(k)._3 == (if (t < -2.86) "stationary" else "unit_root"),
        s"$k verdict")
    }
  }

  test("eod_cointegration: Engle–Granger two-stage matches") {
    val got = SparkEntry.queries("eod_cointegration")(spark, dir)
      .select($"pair_id", $"beta", $"eg_tstat")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val series = seriesRows()
    val vb = series("view").map(math.log)
    for ((k, p) <- series if k != "view") {
      val ya0 = p.map(math.log)
      val m = math.min(ya0.length, vb.length)
      val ya = ya0.take(m); val yb = vb.take(m)
      val ma = ya.sum / m; val mb = yb.sum / m
      val beta = ya.zip(yb).map { case (a, b) => (a - ma) * (b - mb) }.sum /
        yb.map(b => (b - mb) * (b - mb)).sum
      val e = ya.zip(yb).map { case (a, b) => (a - ma) - beta * (b - mb) }
      val el = e.dropRight(1)
      val de = e.drop(1).zip(el).map { case (a, b) => a - b }
      val sed = el.zip(de).map { case (a, b) => a * b }.sum
      val see = el.map(v => v * v).sum
      val sdd = de.map(v => v * v).sum
      val rho = sed / see
      val s2 = (sdd - rho * sed) / (el.length - 1.0)
      val t = rho / math.sqrt(s2 / see)
      assert(math.abs(got(k)._1 - beta) < 1e-6, s"$k beta")
      assert(math.abs(got(k)._2 - t) < 1e-5, s"$k t ${got(k)._2} vs $t")
    }
  }

  test("stats_welch_ttest: direct moments + Satterthwaite df") {
    val got = SparkEntry.queries("stats_welch_ttest")(spark, dir)
      .select($"event_type", $"t_stat", $"df_welch")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rets = seriesRows().map { case (k, p) => k -> retsOf(p) }
    def mv(g: Array[Double]) = {
      val n = g.length; val m = g.sum / n
      (n, m, g.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (nb, mb, vb) = mv(rets("view"))
    for ((k, g) <- rets if k != "view") {
      val (na, ma, va) = mv(g)
      val sa = va / na; val sb = vb / nb
      val t = (ma - mb) / math.sqrt(sa + sb)
      val dfW = (sa + sb) * (sa + sb) /
        (sa * sa / (na - 1) + sb * sb / (nb - 1))
      assert(math.abs(got(k)._1 - t) < 1e-5, s"$k t")
      assert(math.abs(got(k)._2 - dfW) < 0.05, s"$k df")
    }
  }

  test("stats_anova: between/within decomposition form") {
    val rets = seriesRows().map { case (k, p) => k -> retsOf(p) }
    val k = rets.size
    val n = rets.values.map(_.length).sum
    val gm = rets.values.flatten.sum / n
    val ssb = rets.values
      .map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = rets.values.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val eta = ssb / (ssb + ssw)
    val got = SparkEntry.queries("stats_anova")(spark, dir)
      .select($"k", $"n", $"f_stat", $"eta_sq")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == k && got._2 == n)
    assert(math.abs(got._3 - f) < 1e-4, s"f ${got._3} vs $f")
    assert(math.abs(got._4 - eta) < 1e-6, s"eta ${got._4} vs $eta")
  }

  test("tick_realized_moments: power sums of log returns") {
    val got = SparkEntry.queries("tick_realized_moments")(spark, dir)
      .select($"event_type", $"realized_vol", $"realized_skew",
        $"realized_kurt")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((k, p) <- seriesRows()) {
      val lr = p.sliding(2)
        .map { case Array(a, b) => math.log(b) - math.log(a) }.toArray
      val n = lr.length
      val rv = lr.map(x => x * x).sum
      val s3 = lr.map(x => x * x * x).sum
      val s4 = lr.map(x => x * x * x * x).sum
      assert(math.abs(got(k)._1 - math.sqrt(rv)) < 1e-6, s"$k rvol")
      assert(math.abs(got(k)._2 - math.sqrt(n.toDouble) * s3 /
        (rv * math.sqrt(rv))) < 1e-5, s"$k skew")
      assert(math.abs(got(k)._3 - n * s4 / (rv * rv)) < 1e-4, s"$k kurt")
    }
  }

  test("rel_tpch_q17: small-quantity revenue, independent recompute") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect()
    val brand = spark.read.parquet(s"$dir/part.parquet")
      .where($"p_brand" === "Brand#23").select($"p_partkey")
      .as[Long].collect().toSet
    val b = li.filter(r => brand(r._1))
    val avgQ = b.groupBy(_._1)
      .map { case (pk, rs) => pk -> rs.map(_._2).sum / rs.length }
    val sel = b.filter(r => r._2 < 0.2 * avgQ(r._1))
    assert(sel.nonEmpty, "test data has no Brand#23 small-qty lineitems")
    val want = sel.map(_._3).sum / 7.0
    val got = SparkEntry.queries("rel_tpch_q17")(spark, dir)
      .select($"avg_yearly", $"n_items").as[(Double, Long)].collect().head
    assert(got._2 == sel.length, s"n ${got._2} vs ${sel.length}")
    assert(math.abs(got._1 - want) < 0.02, s"${got._1} vs $want")
  }

  test("eod_garch_filter: truncated recursion recomputed per row") {
    val got = SparkEntry.queries("eod_garch_filter")(spark, dir)
      .select($"event_type", $"event_id", $"garch_vol")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3) }
    val (om, al, be) = (2.0e-8, 0.08, 0.90)
    for ((k, p) <- seriesRows()) {
      val rets = retsOf(p)
      // independent form: run the recursion σ²_t = ω + α·r² + β·σ²
      // over exactly the last min(60, t−1) returns from σ² = 0 —
      // algebraically the production closed form, different code path.
      // returns are 1-based r_1..r_m over the ret-bearing rows; the
      // query emits rows rn = 2..m, row t filtering on r_{t-1-k0..t-2}
      val want = (2 to rets.length).map { t =>
        val k0 = math.min(60, t - 1)
        var s2 = 0.0
        for (j <- (t - 1 - k0) until (t - 1))
          s2 = om + al * rets(j) * rets(j) + be * s2
        // the recursion folds ω with β-powers exactly like the closed
        // form's geometric series; subtract nothing — σ = sqrt(s2)
        math.sqrt(s2)
      }
      val g = got(k)
      assert(g.length == want.length, s"$k rows ${g.length} vs ${want.length}")
      for ((a, b) <- g.zip(want))
        assert(math.abs(a - b) < 1e-7, s"$k $a vs $b")
    }
  }

  test("stats_kruskal: midrank H matches a direct global ranking") {
    val rets = seriesRows().map { case (k, p) => k -> retsOf(p) }
    val pooled = rets.toSeq.flatMap { case (g, rs) =>
      rs.map(x => (g, math.floor(x * 1e6 + 0.5).toLong))
    }
    val n = pooled.length
    // direct midranks: sort all values, average positions per tie run
    val byVal = pooled.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2 + 1).sum.toDouble / xs.length
      }
    val rg = pooled.groupBy(_._1).map { case (g, xs) =>
      g -> (xs.map(x => byVal(x._2)).sum, xs.length)
    }
    val s = rg.values.map { case (rsum, ng) => rsum * rsum / ng }.sum
    val h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    val tie = pooled.groupBy(_._2).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val c = 1.0 - tie / (math.pow(n, 3) - n)
    val got = SparkEntry.queries("stats_kruskal")(spark, dir)
      .select($"k", $"n", $"h_stat", $"tie_correction", $"h_adj")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == rets.size && got._2 == n)
    assert(math.abs(got._3 - h) < 1e-4, s"h ${got._3} vs $h")
    assert(math.abs(got._4 - c) < 1e-6, s"tie ${got._4} vs $c")
    assert(math.abs(got._5 - h / c) < 1e-4, s"h_adj")
  }

  test("ann_recall_sq8: hits against full-precision brute truth") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val corpus = vecs.filter(_._1 >= 5)
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (u, v) => u * v }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val dim = vecs.head._2.length
    val mns = (0 until dim).map(i => corpus.map(_._2(i)).min).toArray
    val mxs = (0 until dim).map(i => corpus.map(_._2(i)).max).toArray
    def recon(v: Array[Double]) = v.indices.map { i =>
      if (mxs(i) == mns(i)) mns(i)
      else {
        val c = math.min(math.max(math.floor(
          (v(i) - mns(i)) / (mxs(i) - mns(i)) * 255.0 + 0.5), 0.0), 255.0)
        mns(i) + c / 255.0 * (mxs(i) - mns(i))
      }
    }.toArray
    val want = vecs.filter(_._1 < 5).map { case (qid, qv) =>
      val exact = corpus.map { case (nid, cv) => (nid, cos(qv, cv)) }
        .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
      val rq = recon(qv)
      val approx = corpus.map { case (nid, cv) => (nid, cos(rq, recon(cv))) }
        .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
      qid -> exact.intersect(approx).size.toLong
    }.toMap
    val got = SparkEntry.queries("ann_recall_sq8")(spark, dir)
      .select($"query_id", $"n_hits", $"recall")
      .as[(Long, Long, Double)].collect()
    assert(got.length == want.size)
    for ((q, h, r) <- got) {
      assert(h == want(q), s"$q hits $h vs ${want(q)}")
      assert(math.abs(r - h / 3.0) < 1e-6, s"$q recall")
    }
  }

  test("rel_tpch_q8: market share recomputed via plain maps") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount")
      .as[(Long, Long, Long, Double, Double)].collect()
    val promo = spark.read.parquet(s"$dir/part.parquet")
      .where($"p_type" === "PROMO").select($"p_partkey")
      .as[Long].collect().toSet
    val nat = spark.read.parquet(s"$dir/nation.parquet")
      .select($"n_nationkey".cast("long"), $"n_name",
        $"n_regionkey".cast("long"))
      .as[(Long, String, Long)].collect()
    val asiaKey = spark.read.parquet(s"$dir/region.parquet")
      .where($"r_name" === "ASIA").select($"r_regionkey".cast("long"))
      .as[Long].collect().head
    val asiaNations = nat.filter(_._3 == asiaKey).map(_._1).toSet
    val custAsia = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect()
      .filter(r => asiaNations(r._2)).map(_._1).toSet
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val supNation = spark.read.parquet(s"$dir/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect()
      .map(r => r._1 -> nat.find(_._1 == r._2).get._2).toMap
    val sel = li.filter(r => promo(r._2))
      .flatMap { case (ok, _, sk, price, disc) =>
        orders.get(ok).filter(o => custAsia(o._1)).map { o =>
          (o._2, supNation(sk), price * (1.0 - disc))
        }
      }
    assert(sel.nonEmpty)
    val want = sel.groupBy(_._1).map { case (yr, rs) =>
      yr -> (rs.filter(_._2 == "NATION_2").map(_._3).sum / rs.map(_._3).sum,
        rs.length.toLong)
    }
    val got = SparkEntry.queries("rel_tpch_q8")(spark, dir)
      .select($"o_year", $"mkt_share", $"n_items")
      .as[(Long, Double, Long)].collect()
    assert(got.length == want.size)
    for ((yr, ms, ni) <- got) {
      assert(ni == want(yr)._2, s"$yr n_items")
      assert(math.abs(ms - want(yr)._1) < 1e-4, s"$yr share $ms")
    }
  }

  test("stats_levene: Brown–Forsythe F on median-centered deviations") {
    val rets = seriesRows().map { case (k, p) => k -> retsOf(p) }
    // R-7 median, independently implemented
    def med(g: Array[Double]) = {
      val s = g.sorted; val h = (s.length - 1) * 0.5
      val lo = s(h.toInt)
      lo + (h - h.toInt) * (s(math.min(h.toInt + 1, s.length - 1)) - lo)
    }
    val zs = rets.map { case (k, g) => k -> g.map(x => math.abs(x - med(g))) }
    val k = zs.size
    val n = zs.values.map(_.length).sum
    val gm = zs.values.flatten.sum / n
    val ssb = zs.values
      .map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = zs.values.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val got = SparkEntry.queries("stats_levene")(spark, dir)
      .select($"k", $"n", $"f_stat", $"reject_95")
      .as[(Long, Long, Double, Long)].collect().head
    assert(got._1 == k && got._2 == n)
    assert(math.abs(got._3 - f) < 1e-4, s"f ${got._3} vs $f")
    assert(got._4 == (if (f > 2.3719) 1L else 0L))
  }

  test("eod_bootstrap_sharpe: md5-block resamples recomputed exactly") {
    val gotAll = SparkEntry.queries("eod_bootstrap_sharpe")(spark, dir)
      .select($"event_type", $"n_boot", $"sharpe_ann", $"ci_lo", $"ci_hi")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val mdi = java.security.MessageDigest.getInstance("MD5")
    def word(s: String): Long = {
      val hex = mdi.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    // Mirrors the op's exact-integer formulation: returns quantized
    // to the 1e-6 grid, block sums as exact longs (equal to the
    // engine's prefix-sum differences by integer identity).
    // qr in BigInt: sq² ~ 1e20 for the near-zero price crossing,
    // past Long range (the engine holds it in decimal(38,0)).
    def sharpeU(n: Int, sr: Long, qr: BigInt) = {
      val srd = sr.toDouble / 1e6; val qrd = qr.toDouble / 1e12
      (srd / n) / math.sqrt((qrd - srd * srd / n) / (n - 1.0)) *
        math.sqrt(252.0)
    }
    def q7(sorted: Array[Double], p: Double) = {
      val h = (sorted.length - 1) * p
      val lo = sorted(h.toInt)
      lo + (h - h.toInt) *
        (sorted(math.min(h.toInt + 1, sorted.length - 1)) - lo)
    }
    for ((k, p) <- seriesRows()) {
      val sq = retsOf(p).map(r => math.floor(r * 1e6 + 0.5).toLong)
      val m = sq.length
      val sharpes = (1 to 60).map { b =>
        val draws = (0 until math.ceil(m / 50.0).toInt).flatMap { j =>
          val start = word(s"$k|$b|$j") % m
          (0 until 50).filter(o => j * 50 + o < m)
            .map(o => sq(((start + o) % m).toInt))
        }
        assert(draws.length == m)
        sharpeU(m, draws.sum, draws.map(x => BigInt(x) * x).sum)
      }.sorted.toArray
      val (nb, sp, lo, hi) = gotAll(k)
      assert(nb == 60L)
      assert(math.abs(sp - sharpeU(m, sq.sum,
        sq.map(x => BigInt(x) * x).sum)) < 1e-5, s"$k point")
      assert(math.abs(lo - q7(sharpes, 0.05)) < 1e-5, s"$k lo")
      assert(math.abs(hi - q7(sharpes, 0.95)) < 1e-5, s"$k hi")
      assert(lo <= sp + 1.0 && hi >= sp - 1.0, s"$k CI sanity")
    }
  }

  test("rel_tpch_q7/q13/q22: recomputed via plain maps") {
    val n = spark.read.parquet(s"$dir/nation.parquet")
      .select($"n_nationkey".cast("long"), $"n_name",
        $"n_regionkey".cast("long"))
      .as[(Long, String, Long)].collect()
    val nName = n.map(r => r._1 -> r._2).toMap
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_nationkey".cast("long"), $"c_acctbal")
      .as[(Long, Long, Double)].collect()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_custkey",
        ($"o_orderdate" >= "2000-01-01").cast("boolean"))
      .as[(Long, Long, Boolean)].collect()
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect().map(r => r._1 -> nName(r._2)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount", year($"l_shipdate").cast("long"))
      .as[(Long, Long, Double, Double, Long)].collect()

    // Q7: bilateral NATION_1 <-> NATION_2 revenue by ship year
    val custNat = cust.map(r => r._1 -> nName(r._2)).toMap
    val orderCust = orders.map(r => r._1 -> r._2).toMap
    val two = Set("NATION_3", "NATION_8")
    val q7w = li.flatMap { case (ok, sk, price, disc, yr) =>
      val sn = sup(sk); val cn = custNat(orderCust(ok))
      if (two(sn) && two(cn) && sn != cn)
        Some(((sn, cn, yr), price * (1.0 - disc))) else None
    }.groupBy(_._1).map { case (k, rs) => k -> (rs.map(_._2).sum, rs.length) }
    val q7 = SparkEntry.queries("rel_tpch_q7")(spark, dir)
      .select($"supp_nation", $"cust_nation", $"l_year", $"revenue",
        $"n_items").as[(String, String, Long, Double, Long)].collect()
    assert(q7.length == q7w.size && q7.nonEmpty)
    for ((sn, cn, yr, rev, ni) <- q7) {
      val (wr, wn) = q7w((sn, cn, yr))
      assert(ni == wn && math.abs(rev - wr) < 0.02, s"q7 $sn $cn $yr")
    }

    // Q13: order-count histogram including zero-order customers
    val perCust = orders.groupBy(_._2).map { case (c, rs) => c -> rs.length }
    val q13w = cust.map(r => perCust.getOrElse(r._1, 0))
      .groupBy(identity).map { case (k, xs) => k.toLong -> xs.length.toLong }
    val q13 = SparkEntry.queries("rel_tpch_q13")(spark, dir)
      .select($"c_count", $"custdist").as[(Long, Long)].collect()
    assert(q13.toMap == q13w && q13.nonEmpty)
    // r14: the final presentation sort is gone (the driver's compare
    // canonicalizes rows), so the VALUE map equality above is the
    // whole contract — no emission-order pin.

    // Q22: above-positive-average balances with no orders, by nation
    val pos = cust.filter(_._3 > 0.0)
    val ab = pos.map(_._3).sum / pos.length
    val haveOrders = orders.filter(_._3).map(_._2).toSet // recent only
    val sel = cust.filter(r => r._3 > ab && !haveOrders(r._1))
    val q22w = sel.groupBy(r => nName(r._2))
      .map { case (k, rs) => k -> (rs.length.toLong, rs.map(_._3).sum) }
    val q22 = SparkEntry.queries("rel_tpch_q22")(spark, dir)
      .select($"n_name", $"numcust", $"totacctbal")
      .as[(String, Long, Double)].collect()
    assert(q22.length == q22w.size && q22.nonEmpty)
    for ((nm, nc, tb) <- q22) {
      val (wn, wt) = q22w(nm)
      assert(nc == wn && math.abs(tb - wt) < 0.02, s"q22 $nm")
    }
  }

  test("corpus_unimax: water-filling allocation sums to the budget") {
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy($"lang").count().as[(String, Long)].collect()
    val total = langs.map(_._2).sum
    val bdg = total * 0.6
    val sorted = langs.sortBy(t => (t._2, t._1))
    val n = sorted.length
    var p = 0.0; var theta = Double.NaN; var found = false
    for (((_, c), idx) <- sorted.zipWithIndex if !found) {
      val rem = n - idx // N − i + 1 with i = idx + 1
      if (p + c * rem >= bdg) { theta = (bdg - p) / rem; found = true }
      else p += c
    }
    val wantAlloc = langs.map { case (l, c) =>
      l -> (if (found) math.min(c.toDouble, theta) else c.toDouble)
    }.toMap
    val got = SparkEntry.queries("corpus_unimax")(spark, dir)
      .select($"lang", $"n_docs", $"alloc", $"epochs")
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == langs.length)
    var tot = 0.0
    for ((l, c, a, e) <- got) {
      assert(math.abs(a - wantAlloc(l)) < 1e-3, s"$l alloc $a")
      assert(math.abs(e - a / c) < 1e-5, s"$l epochs")
      assert(a <= c + 1e-9, s"$l alloc over count")
      tot += a
    }
    if (found)
      assert(math.abs(tot - bdg) < 1e-2, s"sum $tot vs budget $bdg")
  }
}
