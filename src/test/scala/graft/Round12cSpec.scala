package graft

import org.apache.spark.sql.functions._

/** Round-12 third wave: Friedman blocked rank test. Checked against an
  * independent in-test recomputation AND the textbook
  * perfect-concordance case (k=3, n=2 → Q = 4, the classic formula's
  * maximum).
  */
class Round12cSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stats_friedman: matches direct blocked-midrank recomputation") {
    // independent recomputation: complete rn blocks, midranks on the
    // 1e-6 grid, Q = (k-1)(ΣRj² − n²k(k+1)²/4)/(Σr² − nk(k+1)²/4)
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).map { case Array(a, b) =>
          math.floor((b / a - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val k = rows.size
    // complete blocks = rn positions where EVERY series has a return
    val nBlocks = rows.values.map(_.length).min
    var sumR2ByHand = 0.0
    val rj = Array.fill(k)(0.0)
    val names = rows.keys.toArray.sorted
    for (b <- 0 until nBlocks) {
      val vals = names.map(rows(_)(b))
      val ranks = vals.map(v =>
        vals.count(_ < v) + 1 + (vals.count(_ == v) - 1) / 2.0)
      for (j <- 0 until k) rj(j) += ranks(j)
      sumR2ByHand += ranks.map(r => r * r).sum
    }
    val n = nBlocks.toDouble
    val num = rj.map(r => r * r).sum - n * n * k * (k + 1) * (k + 1) / 4.0
    val den = sumR2ByHand - n * k * (k + 1) * (k + 1) / 4.0
    val expQ = (k - 1) * num / den
    val got = SparkEntry.queries("stats_friedman")(spark, dir)
      .select($"k", $"n", $"q_stat")
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == k && got._2 == nBlocks)
    assert(math.abs(got._3 - expQ) < 1e-5, s"q ${got._3} vs $expQ")
  }

  test("ann_triangles: matches a driver-side set recount of the same graph") {
    val und = graft.operators.Similarity
      .knnGraph(graft.sources.Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", 3, 64, planes = 4)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Set.empty[(Long, Long)].map(_._1))
    val triPerV = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for ((a, bs) <- adj; b <- bs; c <- adj(b) if und((a, c))) {
      triPerV(a) += 1; triPerV(b) += 1; triPerV(c) += 1
    }
    val deg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- und) { deg(a) += 1; deg(b) += 1 }
    val got = SparkEntry.queries("ann_triangles")(spark, dir)
      .select($"vec_id", $"degree", $"n_triangles")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    for ((v, d, t) <- got) {
      assert(d == deg(v), s"deg($v): $d vs ${deg(v)}")
      assert(t == triPerV(v), s"tri($v): $t vs ${triPerV(v)}")
    }
    // every triangle increments exactly 3 vertices
    assert(got.map(_._3).sum % 3 == 0)
  }

  test("tick_hawkes: matches a direct trailing-kernel recomputation") {
    val arrivals = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._3)).map(r => (r._2, r._3))
      }
    val exp = arrivals.flatMap { case (_, us) =>
      us.indices.map { i =>
        val lo = math.max(0, i - 60)
        val sumq = (lo until i).map { j =>
          math.floor(math.pow(0.995,
            math.floor((us(i)._1 - us(j)._1) / 1e6)) * 1e9 + 0.5).toLong
        }.sum
        us(i)._2 -> (math.rint((0.05 + 0.3 * (sumq / 1e9)) * 1e6) / 1e6)
      }
    }.toMap
    val got = SparkEntry.queries("tick_hawkes")(spark, dir)
      .select($"event_id", $"lambda").as[(Long, Double)].collect()
    assert(got.length == exp.size)
    for ((id, l) <- got)
      assert(math.abs(l - exp(id)) < 1e-9, s"λ($id): $l vs ${exp(id)}")
  }

  test("eod_holt: filter weights reproduce the actual Holt recursion") {
    // independent recomputation: run the REAL coupled recursion
    // (l₁=x₁, b₁=0; l_t = αx_t+(1−α)(l+b); b_t = β(l_t−l)+(1−β)b) over
    // each trailing 60-window — the query's linear-filter weights must
    // reproduce it to within the 1e-9 per-term quantization
    val series = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4))
      }
    val exp = series.flatMap { case (_, xs) =>
      (59 until xs.length).map { i =>
        val win = xs.slice(i - 59, i + 1).map(_._2)
        var l = win(0); var b = 0.0
        for (t <- 1 until 60) {
          val nl = 0.3 * win(t) + 0.7 * (l + b)
          b = 0.1 * (nl - l) + 0.9 * b
          l = nl
        }
        xs(i)._1 -> (l, b)
      }
    }.toMap
    val got = SparkEntry.queries("eod_holt")(spark, dir)
      .select($"event_id", $"level", $"trend", $"forecast_5")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == exp.size)
    for ((id, lv, tr, f5) <- got) {
      val (l, b) = exp(id)
      assert(math.abs(lv - l) < 1e-5, s"level($id): $lv vs $l")
      assert(math.abs(tr - b) < 1e-6, s"trend($id): $tr vs $b")
      assert(math.abs(f5 - (l + 5 * b)) < 1e-5, s"f5($id)")
    }
  }

  test("stats_cochran_q: matches the textbook Σ(Cj−N/k)² form directly") {
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).map { case Array(a, b) =>
          if (math.floor((b / a - 1) * 1e6 + 0.5) > 0) 1L else 0L
        }.toArray
      }
    val k = rows.size
    val nB = rows.values.map(_.length).min
    val names = rows.keys.toArray.sorted
    val cj = names.map(s => rows(s).take(nB).sum)
    val rb = (0 until nB).map(b => names.map(s => rows(s)(b)).sum)
    val nTot = cj.sum.toDouble
    // textbook form: Q = k(k−1)Σ(Cj − N/k)² / (kN − ΣRb²)
    val num = k * (k - 1) * cj.map(c => math.pow(c - nTot / k, 2)).sum
    val den = k * nTot - rb.map(r => r.toDouble * r).sum
    val expQ = num / den
    val got = SparkEntry.queries("stats_cochran_q")(spark, dir)
      .select($"k", $"n", $"q_stat").as[(Long, Long, Double)].collect().head
    assert(got._1 == k && got._2 == nB)
    assert(math.abs(got._3 - expQ) < 1e-5, s"q ${got._3} vs $expQ")
  }

  test("eod_holt_winters: filter weights reproduce the seasonal recursion") {
    val series = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4))
      }
    val exp = series.flatMap { case (_, xs) =>
      (59 until xs.length).map { i =>
        val win = xs.slice(i - 59, i + 1).map(_._2)
        var l = win(0); var b = 0.0
        val sea = Array.fill(5)(0.0)
        for (t <- 1 until 60) {
          val slot = t % 5
          val sOld = sea(slot)
          val nl = 0.3 * (win(t) - sOld) + 0.7 * (l + b)
          b = 0.1 * (nl - l) + 0.9 * b
          sea(slot) = 0.2 * (win(t) - nl) + 0.8 * sOld
          l = nl
        }
        xs(i)._1 -> (l, b, sea(59 % 5))
      }
    }.toMap
    val got = SparkEntry.queries("eod_holt_winters")(spark, dir)
      .select($"event_id", $"level", $"trend", $"seasonal", $"forecast_5")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(got.length == exp.size)
    for ((id, lv, tr, se, f5) <- got) {
      val (l, b, sn) = exp(id)
      assert(math.abs(lv - l) < 1e-5, s"level($id): $lv vs $l")
      assert(math.abs(tr - b) < 1e-6, s"trend($id): $tr vs $b")
      assert(math.abs(se - sn) < 1e-5, s"seasonal($id): $se vs $sn")
      assert(math.abs(f5 - (l + 5 * b + sn)) < 1e-5, s"f5($id)")
    }
  }

  test("QuantizedDot/HawkesKernelSum: native folds match direct arithmetic") {
    import graft.expressions.{HawkesKernelSum, QuantizedDot}
    val w = Array(0.5, -0.25, 2.0)
    val df = Seq(
      (1L, Seq(2.0, 4.0, 1.0)),
      (2L, Seq(2.0, 4.0)),          // wrong length → null
      (3L, Seq[Double]())           // wrong length → null
    ).toDF("id", "xs")
    val got = df.select($"id", QuantizedDot($"xs", w, 1e9).as("q"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val exp1 = Seq(2.0 * 0.5, 4.0 * -0.25, 1.0 * 2.0)
      .map(t => math.floor(t * 1e9 + 0.5).toLong).sum
    assert(got(1L).contains(exp1) && got(2L).isEmpty && got(3L).isEmpty)

    val hdf = Seq((Seq(1000000L, 3000000L), 4000000L),
        (Seq[Long](), 5000000L))
      .toDF("arr", "now")
    val hot = hdf.select(HawkesKernelSum($"arr", $"now", 0.995).as("s"))
      .as[Long].collect()
    def term(dUs: Long) = math.floor(math.pow(0.995,
      math.floor(dUs / 1e6)) * 1e9 + 0.5).toLong
    assert(hot(0) == term(3000000L) + term(1000000L))
    assert(hot(1) == 0L) // empty frame → λ = μ
  }

  test("stats_dunn: matches a direct global-midrank pairwise recomputation") {
    val rets = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).map { case Array(a, b) =>
          math.floor((b / a - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val all = rets.toSeq.flatMap { case (g, qs) => qs.map(g -> _) }
    val sorted = all.map(_._2).sorted
    val firstIdx = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val cnt = sorted.groupBy(identity).map { case (v, xs) => v -> xs.size }
    def midrank(v: Long) = firstIdx(v) + (cnt(v) - 1) / 2.0
    val rbar = rets.map { case (g, qs) =>
      g -> (qs.map(midrank).sum / qs.length, qs.length.toLong)
    }
    val nn = all.size.toDouble
    val t = cnt.values.map(c => c.toDouble * c * c - c).sum
    val s2 = nn * (nn + 1.0) / 12.0 - t / (12.0 * (nn - 1.0))
    val got = SparkEntry.queries("stats_dunn")(spark, dir)
      .select($"g1", $"g2", $"z_stat")
      .as[(String, String, Double)].collect()
    assert(got.length == rbar.size * (rbar.size - 1) / 2)
    for ((g1, g2, z) <- got) {
      val ((m1, n1), (m2, n2)) = (rbar(g1), rbar(g2))
      val expZ = (m1 - m2) / math.sqrt(s2 * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(z - expZ) < 1e-5, s"z($g1,$g2): $z vs $expZ")
    }
  }

  test("stats_page_trend: matches a direct blocked L recomputation") {
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).map { case Array(a, b) =>
          math.floor((b / a - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val k = rows.size
    val nB = rows.values.map(_.length).min
    val names = rows.keys.toArray.sorted
    var l = 0.0
    for (b <- 0 until nB) {
      val vals = names.map(rows(_)(b))
      val ranks = vals.map(v =>
        vals.count(_ < v) + 1 + (vals.count(_ == v) - 1) / 2.0)
      for (j <- 0 until k) l += (j + 1) * ranks(j)
    }
    val mu = nB.toDouble * k * (k + 1) * (k + 1) / 4.0
    val sig = math.sqrt(nB.toDouble * k * k * (k + 1) * (k + 1) * (k - 1)
      / 144.0)
    val expZ = (l - mu) / sig
    val got = SparkEntry.queries("stats_page_trend")(spark, dir)
      .select($"k", $"n", $"l_stat", $"z_stat")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == k && got._2 == nB)
    assert(math.abs(got._3 - l) < 0.51, s"L ${got._3} vs $l")
    assert(math.abs(got._4 - expZ) < 1e-5, s"z ${got._4} vs $expZ")
  }

  test("ann_knn_classifier: matches a driver-side majority-vote recount") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val labels = emb.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    val edges = graft.operators.Similarity
      .knnGraph(emb, "vec_id", "embedding", 3, 64, planes = 4)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
    val pred = edges.groupBy(_._1).map { case (q, es) =>
      val votes = es.map(e => labels(e._2))
        .groupBy(identity).map { case (l, xs) => l -> xs.size }
      q -> votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
    }
    val perClass = pred.toSeq
      .map { case (q, p) => labels(q) -> (p == labels(q)) }
      .groupBy(_._1)
      .map { case (c, xs) => c -> (xs.size.toLong, xs.count(_._2).toLong) }
    val got = SparkEntry.queries("ann_knn_classifier")(spark, dir)
      .select($"label", $"n", $"n_correct")
      .as[(Long, Long, Long)].collect()
    for ((c, n, nc) <- got) {
      val (en, enc) = perClass(c.toInt)
      assert(n == en && nc == enc, s"class $c: ($n,$nc) vs ($en,$enc)")
    }
  }

  test("eod_kalman: filter weights reproduce the Riccati recursion") {
    val series = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4))
      }
    def kalman(win: Array[Double], upto: Int): Double = {
      var l = win(0); var p = 1.0
      for (t <- 1 until upto) {
        val pPrior = p + 0.01
        val k = pPrior / (pPrior + 1.0)
        l = l + k * (win(t) - l)
        p = (1.0 - k) * pPrior
      }
      l
    }
    val exp = series.flatMap { case (_, xs) =>
      (59 until xs.length).map { i =>
        val win = xs.slice(i - 59, i + 1).map(_._2)
        xs(i)._1 -> (kalman(win, 60), win(59) - kalman(win, 59))
      }
    }.toMap
    val got = SparkEntry.queries("eod_kalman")(spark, dir)
      .select($"event_id", $"kalman_level", $"innovation")
      .as[(Long, Double, Double)].collect()
    assert(got.length == exp.size)
    for ((id, lv, in) <- got) {
      val (l, e) = exp(id)
      assert(math.abs(lv - l) < 1e-5, s"level($id): $lv vs $l")
      assert(math.abs(in - e) < 1e-5, s"innovation($id): $in vs $e")
    }
  }

  test("stats_jonckheere: matches a direct pairwise U recount") {
    val rows = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).map { case Array(a, b) =>
          math.floor((b / a - 1) * 1e6 + 0.5).toLong }.toArray
      }
    val names = rows.keys.toArray.sorted
    var j = 0.0
    for (i <- names.indices; jj <- (i + 1) until names.length;
         x <- rows(names(i)); y <- rows(names(jj))) {
      if (x < y) j += 1.0 else if (x == y) j += 0.5
    }
    val got = SparkEntry.queries("stats_jonckheere")(spark, dir)
      .select($"j_stat", $"n").as[(Double, Long)].collect().head
    assert(got._2 == rows.values.map(_.length).sum)
    assert(math.abs(got._1 - j) < 0.51, s"J ${got._1} vs $j")
  }

  test("embed_mmr_rerank: matches a direct integer greedy replay") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    def q9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val queries = emb.keys.filter(_ < 5)
    val expected = queries.flatMap { qid =>
      val top = emb.keys.filter(_ >= 5).toSeq
        .map(n => n -> cos(emb(qid), emb(n)))
        .sortBy { case (n, c) => (-c, n) }.take(10)
      val relq = top.map { case (n, c) => n -> q9(c) }.toMap
      val ids = top.map(_._1)
      def sim(a: Long, b: Long) = q9(cos(emb(a), emb(b)))
      val s1 = ids.maxBy(n => (relq(n), -n))
      val s2 = ids.filter(_ != s1)
        .maxBy(n => (7 * relq(n) - 3 * sim(n, s1), -n))
      val s3 = ids.filter(n => n != s1 && n != s2)
        .maxBy(n => (7 * relq(n) - 3 * math.max(sim(n, s1), sim(n, s2)), -n))
      Seq((qid, 1L, s1), (qid, 2L, s2), (qid, 3L, s3))
    }.toSet
    val got = SparkEntry.queries("embed_mmr_rerank")(spark, dir)
      .select($"query_id", $"pick", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
  }

  test("stats_friedman: perfect concordance gives the classic maximum Q") {
    // k=3 series, 2 complete return blocks, same order in every block
    // → classic Q = 12/(nk(k+1))ΣR² − 3n(k+1) = 4
    val tmp = java.nio.file.Files.createTempDirectory("graft-fr").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "A", 100.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), "A", 101.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), "A", 102.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "B", 100.0),
      (5L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), "B", 102.0),
      (6L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), "B", 104.0),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "C", 100.0),
      (8L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), "C", 103.0),
      (9L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), "C", 106.0)
    ).toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("stats_friedman")(spark, tmp)
      .select($"k", $"n", $"q_stat", $"reject_95")
      .as[(Long, Long, Double, Long)].collect().head
    assert(got._1 == 3L && got._2 == 2L)
    assert(got._3 == 4.0, s"q ${got._3}")
    assert(got._4 == 0L) // 4 < 9.4877 (and df here is 2 anyway)
  }
}
