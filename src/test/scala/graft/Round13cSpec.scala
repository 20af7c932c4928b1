package graft

import org.apache.spark.sql.functions._

/** Round-13 third wave: CUSUM changepoint locator, two-sample
  * Anderson–Darling, code detection, vol targeting, segmented A/B
  * lift. Independent JVM recomputations throughout; vol targeting is
  * cross-checked against the separately-validated op-106 query's own
  * output rather than a reimplementation of its kernel.
  */
class Round13cSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def events =
    graft.sources.Tables.load(spark, dir, "events")

  private def retsByType: Map[String, Array[Long]] = events
    .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
    .as[(String, Long, Long, Double)].collect()
    .groupBy(_._1).map { case (k, rs) =>
      val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
      k -> p.sliding(2).collect { case Array(x, y) =>
        math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
    }

  private def coin(userId: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab_$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2).toInt
  }

  test("stats_changepoint: argmax and stat match a JVM recount") {
    val got = SparkEntry.queries("stats_changepoint")(spark, dir)
      .select($"event_type", $"n", $"cp_rn", $"cusum_stat")
      .as[(String, Long, Long, Double)].collect()
    got.foreach { case (k, n, cpRn, stat) =>
      val q = retsByType(k)
      assert(n == q.length)
      val sn = q.map(BigInt(_)).sum
      var p = BigInt(0); var best = BigInt(-1); var bestRn = -1
      q.zipWithIndex.foreach { case (v, i) =>
        p += v
        val d = (p * q.length - sn * (i + 1)).abs
        if (d > best) { best = d; bestRn = i + 1 }
      }
      assert(cpRn == bestRn, s"$k cp_rn $cpRn vs $bestRn")
      val mean = sn.toDouble / n
      val sd = math.sqrt(q.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      val exp = best.toDouble / n / sd / math.sqrt(n.toDouble)
      assert(math.abs(stat - exp) < 1e-4, s"$k stat $stat vs $exp")
    }
  }

  test("stats_ad_2sample: matches a direct midrank A2akN recount") {
    val rets = retsByType
    val bench = rets("view")
    val got = SparkEntry.queries("stats_ad_2sample")(spark, dir)
      .select($"event_type", $"n_a", $"n_b", $"ad_stat")
      .as[(String, Long, Long, Double)].collect()
    got.foreach { case (k, na, nb, ad) =>
      val a = rets(k); val b = bench
      assert(na == a.length && nb == b.length)
      val nn = na + nb
      val values = (a ++ b).distinct.sorted
      // textbook midrank A²akN in HALF-integer quantities (the
      // operator works in doubled units; same statistic)
      var sa2 = 0.0; var sb2 = 0.0
      var ca = 0L; var cb = 0L
      values.foreach { v =>
        val ha = a.count(_ == v); val hb = b.count(_ == v)
        ca += ha; cb += hb
        val h = ha + hb
        val b2 = 2 * (ca + cb) - h
        val ma2 = 2 * ca - ha; val mb2 = 2 * cb - hb
        val den = b2.toDouble * (2 * nn - b2) - nn.toDouble * h
        if (h > 0 && den > 0) {
          sa2 += h.toDouble * math.pow(nn.toDouble * ma2 - na * b2, 2) /
            (nn.toDouble * den)
          sb2 += h.toDouble * math.pow(nn.toDouble * mb2 - nb * b2, 2) /
            (nn.toDouble * den)
        }
      }
      val exp2 = (nn - 1).toDouble / nn * (sa2 / na + sb2 / nb)
      assert(math.abs(ad - exp2) < 1e-4, s"$k ad $ad vs $exp2")
    }
  }

  test("text_code_detection: one doc's counts match a JVM recount") {
    val out = SparkEntry.queries("text_code_detection")(spark, dir)
      .select($"doc_id", $"n_chars", $"sym_ratio", $"kw_hits", $"is_code")
      .as[(Long, Long, Double, Long, Long)].collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.length == docs.size)
    val kws = Set("def", "class", "return", "import", "if", "else",
      "for", "while", "function", "var", "int", "void")
    out.take(20).foreach { case (id, nc, symR, kw, isCode) =>
      val t = docs(id)
      assert(nc == t.length)
      val sym = t.count(c => "{}();=<>[]#".contains(c))
      val expR = math.floor(sym.toDouble / t.length * 1e6 + 0.5) / 1e6
      assert(math.abs(symR - expR) < 1e-9, s"doc $id sym $symR vs $expR")
      val expKw = t.trim.split("\\s+").count(kws.contains)
      assert(kw == expKw, s"doc $id kw $kw vs $expKw")
      assert(isCode == (if (expR > 0.05 || expKw >= 3) 1L else 0L))
    }
  }

  test("eod_vol_targeting: consistent with the op-106 query's own vols") {
    val vols = SparkEntry.queries("eod_ewma_vol")(spark, dir)
      .select($"event_type", $"event_id", $"ewma_vol")
      .as[(String, Long, Double)].collect()
    val order = events
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.sortBy(r => (r._2, r._3)) }
    val volBy = vols.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(v => v._2 -> v._3).toMap
    }
    val got = SparkEntry.queries("eod_vol_targeting")(spark, dir)
      .select($"event_type", $"n", $"avg_weight")
      .as[(String, Long, Double)].collect()
    got.foreach { case (k, n, avgW) =>
      val rows = order(k)
      // returns start at the SECOND row; vol rows align with them
      val rets = rows.sliding(2).collect { case Array(x, y) =>
        (y._3, math.floor((y._4 / x._4 - 1) * 1e6 + 0.5).toLong)
      }.toArray
      val vseq = rets.map { case (eid, _) => volBy(k)(eid) }
      val wqs = vseq.dropRight(1).filter(_ > 0)
        .map(v => math.floor(math.min(2.0, 0.01 / v) * 1e6 + 0.5).toLong)
      // rows kept = those with a positive lagged vol
      val kept = vseq.dropRight(1).count(_ > 0)
      assert(n == kept, s"$k n $n vs $kept")
      val expAvg = math.floor(wqs.sum.toDouble / wqs.length + 0.5) / 1e6
      assert(math.abs(avgW - expAvg) < 1e-9, s"$k avgW $avgW vs $expAvg")
    }
  }

  test("events_lift_by_segment: one segment matches a JVM recount") {
    val rows = events
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type",
        $"value", $"props")
      .as[(Long, Long, Long, String, Double, String)].collect()
    val byUser = rows.groupBy(_._1)
    val seg = byUser.map { case (u, es) =>
      val first = es.minBy(e => (e._2, e._3))
      val k = "[0-9]+".r.findFirstIn(first._6).get.toInt
      u -> math.floor(k / 25.0).toLong
    }
    val conv = byUser.map { case (u, es) =>
      u -> es.exists(e => e._4 == "purchase" && e._5 >= 150.0)
    }
    val got = SparkEntry.queries("events_lift_by_segment")(spark, dir)
      .select($"segment", $"n_a", $"conv_a", $"n_b", $"conv_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => r._2 + r._4).sum == byUser.size)
    got.foreach { case (sg, na, ca, nb, cb) =>
      val users = seg.filter(_._2 == sg).keys.toSeq
      val a = users.filter(coin(_) == 0); val b = users.filter(coin(_) == 1)
      assert(na == a.size && nb == b.size, s"seg $sg sizes")
      assert(ca == a.count(conv) && cb == b.count(conv), s"seg $sg convs")
    }
  }
}
