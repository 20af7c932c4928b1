package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Eod, Tick}

/** Property-based invariants over generated price series — the
  * mathematical identities the operators must satisfy regardless of
  * input shape.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  /** Seeded random price series (10 cases per property). */
  private def forAll(f: List[Double] => Unit): Unit =
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919 + 13)
      val n = 5 + rnd.nextInt(36)
      val ps = List.fill(n)(math.rint((0.5 + rnd.nextDouble() * 499.5) * 100) / 100)
      f(ps)
    }

  test("price_index over returns reproduces rebase: 100 * p_t / p_0") {
    forAll { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => ("a", i, p) }.toDF("k", "t", "p")
      val both = df.withColumn("ret", Eod.toReturns($"p", w))
        .withColumn("pi", Eod.toPriceIndex($"ret", w))
        .withColumn("rb", Eod.rebase($"p", w))
        .select($"pi", $"rb").as[(Double, Double)].collect()
      both.foreach { case (pi, rb) =>
        assert(math.abs(pi - rb) < 1e-6 * math.max(1.0, math.abs(rb)),
          s"price_index $pi != rebase $rb")
      }
    }
  }

  test("drawdown is in [-1, 0] and hits 0 at each running maximum") {
    forAll { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => ("a", i, p) }.toDF("k", "t", "p")
      val dd = df.withColumn("dd", Eod.toDrawdownSeries($"p", w))
        .orderBy($"t").select($"p", $"dd").as[(Double, Double)].collect()
      var runMax = Double.MinValue
      dd.foreach { case (p, d) =>
        runMax = math.max(runMax, p)
        assert(d <= 1e-12 && d >= -1.0)
        if (p == runMax) assert(math.abs(d) < 1e-12)
      }
    }
  }

  test("tick rule is in {-1,0,1} and |signed volume| <= volume") {
    forAll { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => ("a", i, p, (i % 7 + 1).toDouble) }
        .toDF("k", "t", "p", "v")
      val rows = df.select(Tick.tickRule($"p", w).as("d"),
          Tick.signVolumeByTickRule($"v", $"p", w).as("sv"), $"v")
        .as[(Int, Double, Double)].collect()
      rows.foreach { case (d, sv, v) =>
        assert(Set(-1, 0, 1).contains(d))
        assert(math.abs(sv) <= v + 1e-12)
      }
    }
  }

  test("total return composes: (1+tr) = prod(1+ret)") {
    forAll { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => ("a", i, p) }.toDF("k", "t", "p")
      val tr = df.groupBy($"k").agg(Eod.totalReturn($"p", $"t").as("tr"))
        .select($"tr").as[Double].head()
      val rets = ps.sliding(2).map { case List(a, b) => b / a }.product
      assert(math.abs((1 + tr) - rets) < 1e-9 * math.max(1.0, rets))
    }
  }

  // ---- dedup kernel invariants: the order-independence that partial
  // aggregation across executors relies on at scale.

  private val docSet = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "one two three four five six seven"),
    (4L, "completely different text body here now"))

  test("simhash is invariant to token order and corpus row order") {
    import graft.operators.Dedup
    def fp(rows: Seq[(Long, String)]) =
      Dedup.simhash(rows.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long)].collect().toMap
    val base = fp(docSet)
    assert(base(1L) == base(2L))
    assert(base(1L) != base(3L))
    // multiset of tokens preserved → identical sign sums
    val permuted = fp(docSet.map { case (id, t) =>
      (id, t.split(" ").reverse.mkString(" ")) })
    assert(permuted == base)
    assert(fp(docSet.reverse) == base)
  }

  test("minhash signatures are stable under corpus row order") {
    import graft.operators.Dedup
    def sigs(rows: Seq[(Long, String)]) =
      Dedup.minhashSignatures(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(docSet) == sigs(docSet.reverse))
  }

  test("jaccard pairs: values in (0,1], identical docs score 1") {
    import graft.operators.Dedup
    val pairs = Dedup.ngramJaccardPairs(docSet.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.0)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, j) =>
      assert(a < b && j > 0.0 && j <= 1.0)
    }
    assert(pairs.collectFirst { case (1L, 2L, j) => j }.contains(1.0))
  }

  test("ShingleMinHash equals min(md5) over the declarative shingle chain") {
    // the native kernel must be indistinguishable from the formulation
    // it replaced, on adversarial whitespace included
    val texts = Seq("a b c d e f", "  padded   text  here ", "one",
      "x y", "repeat repeat repeat repeat repeat repeat",
      "tab\tand space", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = df.select($"doc_id",
        graft.expressions.ShingleMinHash($"text", 5).as("native"),
        array_min(transform(
          graft.expressions.WordShingles($"text", 5, distinct = false),
          s => md5(s))).as("declarative"))
      .as[(Long, String, String)].collect()
    both.foreach { case (id, n, d) =>
      assert(n == d, s"doc $id: native $n != declarative $d")
    }
  }

  test("stratified samples nest: raising the rate only adds rows") {
    import graft.operators.Corpus
    val df = (0L until 500L).map(i => (i, "s")).toDF("doc_id", "k")
    def kept(rate: Double): Set[Long] =
      Corpus.stratifiedSample(df, "doc_id", $"k", Map.empty, rate)
        .select($"doc_id").as[Long].collect().toSet
    val k2 = kept(0.2); val k5 = kept(0.5); val k8 = kept(0.8)
    assert(k2.subsetOf(k5) && k5.subsetOf(k8),
      "md5-coin samples must be nested across rates")
    assert(k5.size > k2.size && k8.size > k5.size)
  }

  test("windowDedup equals a driver-side reference on random corpora") {
    // Tiny vocabulary + random lengths force real cross-doc window
    // collisions, truncated short-doc windows, and broken runs.
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed * 4801 + 17)
      val width = 8
      val docs = (0L until (10 + rnd.nextInt(30)).toLong).map { id =>
        val n = 1 + rnd.nextInt(30)
        (id, List.fill(n)("w" + rnd.nextInt(4)).mkString(" "))
      }
      def windows(text: String): Seq[String] = {
        val toks = text.trim.split("\\s+").toSeq
        if (toks.length <= width) Seq(toks.mkString(" "))
        else toks.sliding(width).map(_.mkString(" ")).toSeq
      }
      val counts = docs.flatMap(d => windows(d._2))
        .groupBy(identity).map { case (g, o) => g -> o.size }
      val expected = docs.map { case (id, text) =>
        val dup = windows(text).map(counts(_) >= 2)
        val runs = dup.foldLeft(List.empty[Int]) {
          case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
          case (acc, true) => 1 :: acc
          case (acc, false) => 0 :: acc
        }
        (id, dup.size.toLong, dup.count(identity).toLong,
          (0 :: runs).max.toLong)
      }.sortBy(_._1)
      val got = graft.operators.Corpus
        .windowDedup(docs.toDF("doc_id", "text"), "doc_id", "text", width)
        .orderBy($"id").as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"seed $seed: windowDedup disagreed\n" +
        s"got:      ${got.take(5)}\nexpected: ${expected.take(5)}")
    }
  }

  test("clusters equals driver-side union-find on random graphs") {
    // The distributed min-label propagation must reach the same fixed
    // point as a classical union-find, on any edge set — including
    // chains longer than one round's reach and disconnected islands.
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed * 6151 + 29)
      val nNodes = 10 + rnd.nextInt(60)
      val nEdges = rnd.nextInt(nNodes * 2)
      val edges = List.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side oracle: union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val members = edges.flatMap { case (a, b) => List(a, b) }.distinct
        val expected = members.map(id => id -> find(id)).toMap
        val got = graft.operators.Dedup
          .clusters(edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(got == expected,
          s"seed $seed: clusters disagreed with union-find\n" +
            s"only-in-spark: ${(got.toSet -- expected.toSet).take(5)}\n" +
            s"only-in-oracle: ${(expected.toSet -- got.toSet).take(5)}")
      }
    }
  }

  test("normalize is idempotent and never longer than its input") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "ab c\t\n  z."
    val cases = (0 until 50).map(_ =>
      List.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString) :+ "" :+ "   " :+ "\t\t"
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val out = df.select($"text",
        graft.functions.Text.normalize($"text").as("c1"),
        graft.functions.Text.normalize(
          graft.functions.Text.normalize($"text")).as("c2"))
      .as[(String, String, String)].collect()
    out.foreach { case (raw, c1, c2) =>
      assert(c1 == c2, s"not idempotent on ${raw.map(_.toInt)}")
      assert(c1.length <= raw.length)
      assert(!c1.exists(_.isControl) && !c1.contains("  ") && c1 == c1.trim,
        s"residual mess in '${c1.map(_.toInt)}'")
    }
  }

  test("tokenChunks tiles every token and respects the window bound") {
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed * 31 + 7)
      val n = 1 + rnd.nextInt(200)
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val (window, stride) = (8, 1 + rnd.nextInt(8))
      val chunks = graft.operators.Corpus.tokenChunks(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          window, stride)
        .orderBy($"chunk_idx")
        .select($"chunk_idx", $"n_tokens").as[(Long, Long)].collect()
      // every chunk within the window bound, none empty
      chunks.foreach { case (_, nt) =>
        assert(nt >= 1 && nt <= window, s"seed $seed: bad chunk size $nt")
      }
      // tiling: consecutive starts are stride apart; coverage reaches
      // the last token exactly (last start + last size == n)
      val lastStart = chunks.last._1 * stride
      assert(lastStart + chunks.last._2 == n,
        s"seed $seed: tail not covered (n=$n window=$window stride=$stride)")
      // no chunk fully contained in the next (starts strictly increase)
      assert(chunks.map(_._1).distinct.length == chunks.length)
    }
  }
}
