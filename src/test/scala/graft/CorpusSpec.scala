package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats flags repeated 2-grams") {
    val df = Seq((1L, "a b a b a b"), (2L, "w x y z q r")).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Double, Double)].collect()
    // doc1 2-grams: (a b)x3, (b a)x2 → top 3/5, distinct 2/5
    assert(out(0) == ((1L, 0.6, 0.4)))
    // doc2 all distinct → top 1/5, distinct 5/5
    assert(out(1) == ((2L, 0.2, 1.0)))
  }

  test("stratifiedSample: deterministic md5 coin, rates ordered by stratum") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "hi" else "lo"))
      .toDF("doc_id", "s")
    def run() = Corpus.stratifiedSample(df, "doc_id", $"s",
      Map("hi" -> 0.9, "lo" -> 0.1), defaultRate = 0.5)
    val counts = run().groupBy($"s").count().as[(String, Long)].collect().toMap
    assert(counts("hi") > 400 && counts("hi") <= 500, counts.toString) // ~0.9 of 500
    assert(counts("lo") < 100, counts.toString)                        // ~0.1 of 500
    // same corpus → byte-identical sample, regardless of partitioning
    assert(run().select($"doc_id").as[Long].collect().sorted.sameElements(
      run().repartition(7).select($"doc_id").as[Long].collect().sorted))
  }

  test("contamination counts shared 8-grams with the benchmark set") {
    val bench = Seq((100L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),  // identical → both 8-grams hit
      (2L, "zz t2 t3 t4 t5 t6 t7 t8 t9"),  // shares the t2..t9 gram only
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))  // clean → absent from output
      .toDF("doc_id", "text")
    val out = Corpus.contamination(train, bench, "doc_id", "text", width = 8)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }

  test("native expressions callable from SQL after Graft.register") {
    graft.functions.Graft.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "word_shingles('a b c d', 3) AS ws, " +
        "shingle_min_hash('a b c d', 3) AS mh, t_cdf(0.0, 5.0) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getString(2).length == 32)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
  }

  test("chunkDedup flags corpus-duplicated chunks and rebuilds clean text") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")   // one full chunk
    val u1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val u2 = (1 to 10).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared $u1"),        // chunk0 shared with doc2 → dropped
      (2L, s"$shared $u2"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"), // all unique, 2 chunks
      (4L, s"$shared $shared"))    // within-doc dup → both chunks dropped
      .toDF("doc_id", "text")
    val out = Corpus.chunkDedup(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, u1),
      (2L, 2L, 1L, u2),
      (3L, 2L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
      (4L, 2L, 2L, "")))
  }

  test("chunkDedup: short doc is one chunk; unique doc text round-trips") {
    val df = Seq((1L, "  only   three  tokens "), (2L, "lone")).toDF("doc_id", "text")
    val out = Corpus.chunkDedup(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 1L, 0L, "only three tokens"), (2L, 1L, 0L, "lone")))
  }

  test("tfIdfTopTerms ranks distinctive terms above ubiquitous ones") {
    // "the" appears in every doc → idf = ln(1) = 0 → tfidf 0; each
    // doc's unique term must outrank it despite lower tf.
    val df = Seq(
      (1L, "the the the apple"), (2L, "the banana banana"),
      (3L, "the cherry"))
      .toDF("doc_id", "text")
    val out = Corpus.tfIdfTopTerms(df, "doc_id", "text", topK = 2)
      .orderBy($"id", $"rnk")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(
      (1L, 1L, "apple"), (1L, 2L, "the"),
      (2L, 1L, "banana"), (2L, 2L, "the"),
      (3L, 1L, "cherry"), (3L, 2L, "the")))
    // idf(the) = ln(3/3) = 0; idf(banana) = ln 3, tf 2
    assert(out.filter(_._3 == "the").forall(_._4 == 0.0))
    val banana = out.find(_._3 == "banana").get._4
    assert(math.abs(banana - 2 * math.log(3.0)) < 2e-6)
  }

  test("dsirWeight scores target-like docs above off-target docs") {
    val target = Seq((1L, "alpha beta gamma alpha beta"),
      (2L, "alpha gamma beta gamma")).toDF("doc_id", "text")
    val raw = target.unionAll(
      Seq((3L, "zog quux blarp zog"), (4L, "quux blarp")).toDF("doc_id", "text"))
    val out = Corpus.dsirWeight(raw, target, raw, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.size == 4)
    assert(out(1L) > out(3L) && out(2L) > out(4L),
      s"target-like docs must outscore off-target: $out")
  }

  test("bloomContamination never misses an exact contamination hit") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val train = Seq(
      (1L, s"$shared tail1 tail2"), // contaminated
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"), // clean
      (3L, s"lead1 $shared")) // contaminated
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$shared b1 b2")).toDF("doc_id", "text")
    val exact = Corpus.contamination(train, bench, "doc_id", "text")
      .select($"id").as[Long].collect().toSet
    val bloom = Corpus.bloomContamination(train, bench, "doc_id", "text")
      .orderBy($"id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(bloom.map(_._1) == Seq(1L, 2L, 3L))
    val flagged = bloom.filter(_._4).map(_._1).toSet
    assert(exact.subsetOf(flagged), s"bloom missed $exact vs $flagged")
    assert(exact == Set(1L, 3L))
    // every doc reports its distinct 8-gram count even when clean
    assert(bloom.find(_._1 == 2L).get._2 == 2L) // 9 tokens → 2 grams
  }

  test("bloomContamination with an empty bench flags nothing") {
    val train = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Corpus.bloomContamination(train, bench, "doc_id", "text")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, 0L, false)))
  }

  test("stratifiedSampleN takes exactly n per stratum, nested across n") {
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small")))
      .toDF("doc_id", "src")
    def take(n: Int): Map[String, Set[Long]] =
      Corpus.stratifiedSampleN(df, "doc_id", $"src", n)
        .select($"stratum", $"doc_id").as[(String, Long)]
        .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val five = take(5)
    assert(five("big").size == 5)
    assert(five("small") == Set(100L, 101L, 102L)) // whole small stratum
    val three = take(3)
    assert(three("big").subsetOf(five("big")), "top-n by coin must nest")
    // deterministic under repartitioning
    val again = Corpus.stratifiedSampleN(df.repartition(13), "doc_id", $"src", 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == five.values.flatten.toSet)
  }

  test("mixtureWeights: alpha<1 upsamples the tail, weights sum to ~1") {
    val ten = Seq.fill(10)("w").mkString(" ")
    val df = ((0 until 90).map(i => (s"d$i", "big", ten)) ++
      (0 until 10).map(i => (s"s$i", "small", ten)))
      .toDF("doc_id", "src", "text")
    val out = Corpus.mixtureWeights(df, $"src", "text", alpha = 0.5)
      .select($"stratum", $"share", $"weight")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (bs, bw) = out("big"); val (ss, sw) = out("small")
    assert(math.abs(bs - 0.9) < 1e-6 && math.abs(ss - 0.1) < 1e-6)
    assert(sw / ss > 1.5 && bw / bs < 1.0,
      s"alpha=0.5 must upweight the tail: $out")
    assert(math.abs(bw + sw - 1.0) < 1e-5)
  }

  test("klDivergence: identical strata have KL 0; skew shows up as KL > 0") {
    // Two strata with the SAME token distribution → each equals the
    // pooled corpus → KL = 0; entropy = ln 2 for a uniform 2-vocab.
    val bal = Seq(("a", "x y"), ("b", "x y")).toDF("src", "text")
    val out0 = Corpus.klDivergence(bal, $"src", "text")
      .select($"stratum", $"entropy", $"kl_from_corpus")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out0.values.forall { case (h, kl) =>
      math.abs(h - math.log(2)) < 1e-5 && math.abs(kl) < 1e-5 })
    // A degenerate stratum (one repeated token) against a mixed one:
    // zero entropy, positive divergence from the pooled distribution.
    val skew = Seq(("t", "x x x x"), ("m", "x y z w")).toDF("src", "text")
    val outS = Corpus.klDivergence(skew, $"src", "text")
      .select($"stratum", $"entropy", $"kl_from_corpus")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (ht, klt) = outS("t")
    assert(ht == 0.0 && klt > 0.1,
      s"templated stratum must show zero entropy, positive KL: $outS")
  }

  test("mixtureWeightsFromCounts equals mixtureWeights on the same corpus") {
    val ten = Seq.fill(10)("w").mkString(" ")
    val df = ((0 until 90).map(i => (s"d$i", "big", ten)) ++
      (0 until 10).map(i => (s"s$i", "small", ten)))
      .toDF("doc_id", "src", "text")
    val direct = Corpus.mixtureWeights(df, $"src", "text", alpha = 0.5)
    val counts = df.groupBy($"src".as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.Text.tokenCount($"text").cast("long"))
          .as("n_tokens"))
    val viaCounts = Corpus.mixtureWeightsFromCounts(counts, alpha = 0.5)
    assert(direct.exceptAll(viaCounts).isEmpty &&
      viaCounts.exceptAll(direct).isEmpty,
      "the streaming monitor's counts path must match the batch op exactly")
  }

  test("tokenBudgetPlan: rates cap at 1 and realize the budget") {
    val ten = Seq.fill(10)("w").mkString(" ")
    val df = ((0 until 90).map(i => (s"d$i", "big", ten)) ++
      (0 until 10).map(i => (s"s$i", "small", ten)))
      .toDF("doc_id", "src", "text")
    val out = Corpus.tokenBudgetPlan(df, $"src", "text",
        budgetTokens = 500L, alpha = 0.5)
      .select($"stratum", $"n_tokens", $"target_tokens", $"rate",
        $"expected_tokens")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, bn, bt, br, be) = out("big")
    val (_, sn, st, sr, se) = out("small")
    // alpha=0.5: weights = 3/4, 1/4 of 500 → big 375 of 900 (rate<1),
    // small 125 > its 100 tokens → rate saturates at 1, keeps all.
    assert(bt == 375L && st == 125L)
    assert(sr == 1.0 && se == sn, "under-budget stratum keeps everything")
    assert(br < 1.0 && math.abs(be - bt) <= 1,
      s"rate must realize the target: $out")
  }

  test("windowDedup finds the longest duplicated run across docs") {
    val span = (1 to 10).map(i => s"s$i").mkString(" ") // 10 shared tokens
    val df = Seq(
      (1L, s"$span x1 x2"),  // 12 toks → 5 windows; dup at pos 0..2
      (2L, s"y1 $span"),     // 11 toks → 4 windows; dup at pos 1..3
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")) // unique → no dups
      .toDF("doc_id", "text")
    val out = Corpus.windowDedup(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L, 3L, 3L), (2L, 4L, 3L, 3L), (3L, 2L, 0L, 0L)))
  }

  test("windowDedup: separated duplicate windows give run length 1") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$a u1 $b"),  // 17 toks → 10 windows; dup at pos 0 and 9
      (2L, s"$a u2 $b"))
      .toDF("doc_id", "text")
    val out = Corpus.windowDedup(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 2L, 1L), (2L, 10L, 2L, 1L)))
  }

  test("packSequences bins by cumulative token count per stratum") {
    val ten = Seq.fill(10)("w").mkString(" ")
    val df = (1 to 10).map(i => (i.toLong, ten, "s")).toDF("doc_id", "text", "k")
    val bins = Corpus.packSequences(df, "doc_id", "text", $"k",
        targetTokens = 25, ordCol = "doc_id")
      .orderBy($"doc_id").select($"bin").as[Long].collect().toSeq
    // tokens-before: 0,10,..,90 → floor(/25): 0,0,0,1,1,2,2,2,3,3
    assert(bins == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
  }

  test("bpePairStats counts within-word adjacent char pairs, ranked") {
    val df = Seq((1L, "abab ab x"), (2L, "bab")).toDF("doc_id", "text")
    // pairs: abab → ab,ba,ab ; ab → ab ; bab → ba,ab  (x: too short)
    val out = Corpus.bpePairStats(df, "doc_id", "text", topK = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("ab", 4L), ("ba", 2L)))
  }

  test("adaptiveLengthFilter trims outside the per-stratum quantile band") {
    val rows = (1 to 100).map(i => (i.toLong, "a", i.toLong)) ++
      Seq((200L, "b", 5L), (201L, "b", 6L), (202L, "b", 1000L))
    val df = rows.toDF("doc_id", "src", "len")
    val kept = Corpus.adaptiveLengthFilter(df, "src", "len")
      .select($"doc_id").as[Long].collect().toSet
    // stratum a: p05 = 5.95, p95 = 95.05 → keeps 6..95
    assert(!kept.contains(1L) && !kept.contains(100L))
    assert(kept.contains(50L) && kept.contains(6L) && kept.contains(95L))
    // stratum b's own band: p05 of {5,6,1000} = 5.1 → 5 trimmed,
    // p95 = 900.6 → 1000 trimmed, 6 kept — per-stratum, not global
    assert(kept.contains(201L) && !kept.contains(200L) && !kept.contains(202L))
  }

  test("gopherQualityRules: each rule fires on its own violation") {
    val fifty = (1 to 50).map(i => s"the of word$i").mkString(" ")  // 150 words, stopwords, alpha
    val df = Seq(
      (1L, fifty),                                   // passes everything
      (2L, "the of tiny"),                           // too few words
      (3L, (1 to 60).map(_ => "11 22").mkString(" ") + " the of"), // alpha_frac low
      (4L, (1 to 60).map(i => s"w$i x$i").mkString(" "))           // no stopwords
    ).toDF("doc_id", "text")
    val out = Corpus.gopherQualityRules(df, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"keep", $"n_words", $"n_stop", $"alpha_frac")
      .as[(Long, Boolean, Long, Long, Double)].collect()
    assert(out(0)._2, out(0).toString)                    // doc1 keeps
    assert(!out(1)._2 && out(1)._3 < 50)                  // doc2: word count
    assert(!out(2)._2 && out(2)._5 < 0.8, out(2).toString) // doc3: alpha frac
    assert(!out(3)._2 && out(3)._4 < 2)                   // doc4: stopwords
  }

  test("tokenChunks: overlapping windows, short tail, one-chunk short doc") {
    val words = (0 until 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, words), (2L, "a b c")).toDF("doc_id", "text")
    val out = Corpus.tokenChunks(df, "doc_id", "text", window = 64, stride = 32)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"n_tokens")
      .as[(Long, Long, Long)].collect()
    // 100 tokens: chunks at 0 (64), 32 (64), 64 (36)
    assert(out.toSeq == Seq((1L, 0L, 64L), (1L, 1L, 64L), (1L, 2L, 36L),
      (2L, 0L, 3L)))
    // chunk hash = md5 of the exact token slice
    val h = Corpus.tokenChunks(df, "doc_id", "text", 64, 32)
      .where($"doc_id" === 1 && $"chunk_idx" === 2)
      .select($"chunk_hash").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((64 until 100).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == expect)
  }
}
