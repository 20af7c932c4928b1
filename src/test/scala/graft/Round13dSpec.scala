package graft

import org.apache.spark.sql.functions._

/** Round-13 fourth wave: streaming A/B gate, active share, layout
  * bucket balance, token-length histogram. JVM recounts throughout.
  */
class Round13dSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def coin(userId: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab_$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2).toInt
  }

  test("streaming_ab_gate: event-grain counts match a JVM md5 recount") {
    val users = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id").as[Long].collect()
    val na = users.count(coin(_) == 0).toDouble
    val nb = users.length - na
    val got = SparkEntry.queries("streaming_ab_gate")(spark, dir)
      .select($"n_a", $"n_b", $"chi2").as[(Long, Long, Double)]
      .collect().head
    assert(got._1 == na.toLong && got._2 == nb.toLong)
    assert(got._1 + got._2 == users.length)
    val exp = (na - nb) * (na - nb) / (na + nb)
    assert(math.abs(got._3 - exp) < 1e-6)
  }

  test("eod_active_share: one block matches a JVM moment recount") {
    val rets = graft.sources.Tables.load(spark, dir, "events")
      .select($"event_type", unix_micros($"ts"), $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val p = rs.sortBy(r => (r._2, r._3)).map(_._4)
        k -> p.sliding(2).collect { case Array(x, y) =>
          math.floor((y / x - 1) * 1e6 + 0.5).toLong }.toArray
      }
    // recount block 0 weights for all 5 series
    val iqs = rets.toSeq.sortBy(_._1).flatMap { case (_, q) =>
      if (q.length < 21) None
      else {
        val blk = q.take(21)
        val n = 21.0
        val sq = blk.sum.toDouble / 1e6
        val sq2 = blk.map(v => BigInt(v) * BigInt(v)).sum.toDouble / 1e12
        val vol = math.sqrt((sq2 - sq * sq / n) / (n - 1))
        if (vol > 0) Some(math.floor(1.0 / vol * 1e9 + 0.5).toLong) else None
      }
    }
    assume(iqs.size == 5)
    val siq = iqs.sum
    val expAs = math.floor(
      iqs.map(iq => (5 * iq - siq).abs).sum.toDouble / (10.0 * siq) * 1e6
        + 0.5) / 1e6
    val got = SparkEntry.queries("eod_active_share")(spark, dir)
      .where($"block" === 0)
      .select($"n_assets", $"active_share", $"max_weight")
      .as[(Long, Double, Double)].collect().head
    assert(got._1 == 5)
    assert(math.abs(got._2 - expAs) < 1e-9, s"as ${got._2} vs $expAs")
    assert(math.abs(got._3 -
      math.floor(iqs.max.toDouble / siq * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("layout_bucket_balance: skew matches a JVM recount") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val by = docs.groupBy(_._1 % 32)
    val rows = by.values.map(_.size.toLong)
    val expSkew = math.floor(
      rows.max.toDouble * by.size / docs.length * 1e6 + 0.5) / 1e6
    val got = SparkEntry.queries("layout_bucket_balance")(spark, dir)
      .select($"n_buckets", $"total_docs", $"max_docs", $"row_skew")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == by.size && got._2 == docs.length && got._3 == rows.max)
    assert(math.abs(got._4 - expSkew) < 1e-9)
  }

  test("corpus_token_histogram: one language matches a JVM recount") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
    val lang = docs.head._1
    val hist = docs.filter(_._1 == lang)
      .flatMap(_._2.trim.split("\\s+"))
      .map(t => math.min(t.length, 30).toLong)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("corpus_token_histogram")(spark, dir)
      .where($"lang" === lang)
      .select($"tok_len", $"n").as[(Long, Long)].collect().toMap
    assert(got == hist, s"hist mismatch: got ${got.toSeq.sorted} vs ${hist.toSeq.sorted}")
  }
}
