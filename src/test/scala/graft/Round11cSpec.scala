package graft

import org.apache.spark.sql.functions._

/** Round-11 third-wave additions: Jarque–Bera, Cornish–Fisher mVaR,
  * Mann–Kendall trend, Yang–Zhang volatility, Flesch readability,
  * adjacent-pair cosine distribution, TPC-H Q14. Each query is checked
  * against an INDEPENDENT in-test recomputation (collected rows + plain
  * Scala math), not a restatement of the production expression.
  */
class Round11cSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** (event_type, day, ts-millis, event_id, value) rows; `day` comes
    * from Spark's to_date so the test groups on the same calendar the
    * query does, while every statistic below is recomputed in Scala.
    */
  private def dayRows(): Array[(String, String, Long, Long, Double)] =
    graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        unix_micros($"ts").as("tus"), $"event_id", $"value")
      .as[(String, String, Long, Long, Double)].collect()

  private def returnsBySeries(): Map[String, Array[Double]] =
    dayRows().groupBy(_._1).map { case (k, rs) =>
      val p = rs.sortBy(r => (r._3, r._4)).map(_._5)
      k -> p.sliding(2).map { case Array(a, b) => b / a - 1 }.toArray
    }

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  private def moments(rets: Array[Double]): (Int, Double, Double) = {
    val m = rets.sum / rets.length
    val d = rets.map(_ - m)
    def cm(k: Int) = d.map(x => math.pow(x, k)).sum / d.length
    (rets.length, cm(3) / math.pow(cm(2), 1.5), cm(4) / (cm(2) * cm(2)) - 3)
  }

  test("eod_jarque_bera: n/6(S² + K²/4) from quantized moments") {
    val got = SparkEntry.queries("eod_jarque_bera")(spark, dir)
      .select($"event_type", $"n", $"jb", $"reject")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((k, rets) <- returnsBySeries()) {
      val (n, sk0, ku0) = moments(rets)
      val (sk, ku) = (r6(sk0), r6(ku0))
      val jb = n / 6.0 * (sk * sk + ku * ku / 4.0)
      assert(got(k)._1 == n, s"$k n")
      assert(math.abs(got(k)._2 - jb) < 1e-4, s"$k jb ${got(k)._2} vs $jb")
      assert(got(k)._3 == (jb > 5.991464547107979), s"$k reject")
    }
  }

  test("eod_cornish_fisher: z_cf polynomial and mVaR = mu + z_cf*sd") {
    val got = SparkEntry.queries("eod_cornish_fisher")(spark, dir)
      .select($"event_type", $"z_cf", $"mvar_5")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val z = -1.6448536269514722
    for ((k, rets) <- returnsBySeries()) {
      val (_, sk, ku) = moments(rets)
      val mu = rets.sum / rets.length
      val sd = math.sqrt(rets.map(x => (x - mu) * (x - mu)).sum / (rets.length - 1))
      val zcf = z + (z * z - 1) * sk / 6 + (z * z * z - 3 * z) * ku / 24 -
        (2 * z * z * z - 5 * z) * sk * sk / 36
      assert(math.abs(got(k)._1 - zcf) < 2e-6, s"$k zcf")
      assert(math.abs(got(k)._2 - (mu + zcf * sd)) < 2e-6, s"$k mvar")
    }
  }

  test("eod_mann_kendall: pairwise S on daily closes, corrected Z") {
    val got = SparkEntry.queries("eod_mann_kendall")(spark, dir)
      .select($"event_type", $"n_days", $"s_stat", $"z_stat", $"trend")
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val bySeries = dayRows().groupBy(_._1)
    for ((k, rs) <- bySeries) {
      val closes = rs.groupBy(_._2).toArray.sortBy(_._1).map { case (_, day) =>
        day.maxBy(r => (r._3, r._4))._5 // close = value at max (ts, id)
      }
      val n = closes.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += java.lang.Math.signum(closes(j) - closes(i)).toLong
      val v = n * (n - 1.0) * (2.0 * n + 5.0) / 18.0
      val zv = if (s > 0) (s - 1.0) / math.sqrt(v)
        else if (s < 0) (s + 1.0) / math.sqrt(v) else 0.0
      val trend = if (zv > 1.959963984540054) "up"
        else if (zv < -1.959963984540054) "down" else "none"
      assert(got(k)._1 == n, s"$k n_days")
      assert(got(k)._2 == s, s"$k s_stat")
      assert(math.abs(got(k)._3 - zv) < 2e-6, s"$k z")
      assert(got(k)._4 == trend, s"$k trend")
    }
  }

  test("tick_yang_zhang: V_o + k·V_c + (1-k)·V_RS over daily OHLC") {
    val got = SparkEntry.queries("tick_yang_zhang")(spark, dir)
      .select($"event_type", $"n_days", $"yang_zhang_vol")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for ((k, rs) <- dayRows().groupBy(_._1)) {
      val bars = rs.groupBy(_._2).toArray.sortBy(_._1).map { case (_, d) =>
        val srt = d.sortBy(r => (r._3, r._4))
        (srt.head._5, d.map(_._5).max, d.map(_._5).min, srt.last._5)
      }.filter(_._3 > 0)
      val linked = bars.sliding(2).collect {
        case Array((_, _, _, pc), (o, h, l, c)) =>
          (math.log(o / pc), math.log(c / o),
            math.log(h / o) * math.log(h / c) + math.log(l / o) * math.log(l / c))
      }.toArray
      val n = linked.length
      def varS(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      }
      val kf = 0.34 / (1.34 + (n + 1.0) / (n - 1.0))
      val yz = math.sqrt(varS(linked.map(_._1)) + kf * varS(linked.map(_._2)) +
        (1 - kf) * linked.map(_._3).sum / n)
      assert(got(k)._1 == n, s"$k n_days")
      assert(math.abs(got(k)._2 - yz) < 2e-6, s"$k yz ${got(k)._2} vs $yz")
    }
  }

  test("text_readability: Flesch/FK from independent regex counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("text_readability")(spark, dir)
      .select($"doc_id", $"n_words", $"n_sents", $"n_sylls", $"flesch")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == docs.count(_._2.matches(".*[A-Za-z].*")))
    for ((id, w, sn, syl, fl) <- got.take(50)) {
      val t = docs(id)
      def cnt(p: String, s: String) =
        p.r.findAllIn(s).length
      val ew = cnt("[A-Za-z]+", t)
      val es = math.max(cnt("[.!?]+", t), 1)
      val ey = cnt("[aeiouy]+", t.toLowerCase)
      assert(w == ew && sn == es && syl == ey, s"doc $id counts")
      val efl = 206.835 - 1.015 * (ew.toDouble / es) - 84.6 * (ey.toDouble / ew)
      assert(math.abs(fl - efl) < 1e-3, s"doc $id flesch")
    }
  }

  test("embed_pair_sim: adjacent-id cosine histogram") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qs = vecs.sliding(2).collect {
      case Array((i, va), (j, vb)) if j == i + 1 &&
        dot(va, va) > 0 && dot(vb, vb) > 0 =>
        math.floor(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
          * 1e6 + 0.5).toLong
    }.toArray
    val want = qs.groupBy(q => math.floor(q.toDouble / 1e5).toLong)
      .map { case (b, g) => b -> (g.length.toLong, r6(g.sum.toDouble / 1e6 / g.length)) }
    val got = SparkEntry.queries("embed_pair_sim")(spark, dir)
      .select($"bin", $"n_pairs", $"avg_cos")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == want.keySet)
    for ((b, (n, a)) <- want) {
      assert(got(b)._1 == n, s"bin $b count")
      assert(math.abs(got(b)._2 - a) < 1e-6, s"bin $b avg")
    }
  }

  test("rel_tpch_q14: promo share from an independent row scan") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_partkey", $"l_extendedprice", $"l_discount",
        $"l_shipdate".cast("string"))
      .as[(Long, Double, Double, String)].collect()
      .filter(r => r._4 >= "1997-09-01" && r._4 < "1997-10-01")
    val promo = spark.read.parquet(s"$dir/part.parquet")
      .select($"p_partkey", $"p_type").as[(Long, String)].collect()
      .filter(_._2 == "PROMO").map(_._1).toSet
    val rev = li.map(r => BigDecimal(r._2 * (1.0 - r._3))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP))
    val promoRev = li.zip(rev).collect { case (r, v) if promo(r._1) => v }.sum
    val total = rev.sum
    val got = SparkEntry.queries("rel_tpch_q14")(spark, dir)
      .select($"promo_revenue_pct", $"total_revenue", $"n_items")
      .as[(Double, Double, Long)].collect().head
    assert(got._3 == li.length, "n_items")
    assert(math.abs(got._2 - total.toDouble) < 0.02, "total")
    assert(math.abs(got._1 - 100.0 * (promoRev / total).toDouble) < 1e-4,
      "promo pct")
  }
}
