package graft

import org.apache.spark.sql.functions._

import graft.operators.Embed

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Long, dim: Int) =
    (0L until n).map { i =>
      (i, (0 until dim).map(d => ((i * 31 + d * 7) % 100).toDouble / 10.0))
    }.toDF("vec_id", "embedding")

  test("sq8 reconstruction error is bounded by half a code step") {
    // Per-dim range here is <= 9.9, so a code step is <= 9.9/255 and
    // the worst rounding error is half that (+1e-6 quantization slack).
    val out = Embed.scalarQuantizeInt8(corpus(50, 8), "vec_id", "embedding")
      .select($"id", $"max_abs_err", $"mean_abs_err")
      .as[(Long, Double, Double)].collect().toSeq
    assert(out.size == 50)
    val bound = 9.9 / 255 / 2 + 1e-6
    out.foreach { case (id, mx, mean) =>
      assert(mx <= bound, s"vec $id max err $mx > $bound")
      assert(mean <= mx + 1e-9, s"vec $id mean err above max")
    }
  }

  test("sq8 codes an identical corpus exactly (zero error, one digest)") {
    val df = (0L until 10L).map(i => (i, Seq(1.5, -2.25, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Embed.scalarQuantizeInt8(df, "vec_id", "embedding")
      .select($"code_digest", $"max_abs_err").distinct().collect()
    assert(out.length == 1)
    assert(out(0).getDouble(1) == 0.0)
  }

  test("sq8 digests are deterministic under repartitioning") {
    val df = corpus(40, 6)
    val a = Embed.scalarQuantizeInt8(df, "vec_id", "embedding")
      .select($"id", $"code_digest").as[(Long, String)].collect().sorted.toSeq
    val b = Embed.scalarQuantizeInt8(df.repartition(13), "vec_id", "embedding")
      .select($"id", $"code_digest").as[(Long, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("binarize packs sign bits 32 per word; zero is a 0 bit") {
    val df = Seq(
      (0L, Seq(1.0, -1.0, 0.0, 0.5)),  // bits 1,0,0,1 → word 9
      (1L, (0 until 33).map(i => if (i == 32) 1.0 else -1.0)))
      .toDF("vec_id", "embedding")
    val out = Embed.binarize(df, "vec_id", "embedding")
      .orderBy($"id", $"w").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 9L), (1L, 0L, 0L), (1L, 1L, 1L)))
  }

  test("hammingTopK ranks by bit distance, ties to lowest id") {
    val corpus = Seq(
      (10L, Seq(1.0, 1.0, 1.0, 1.0)), (11L, Seq(1.0, 1.0, 1.0, -1.0)),
      (12L, Seq(-1.0, -1.0, -1.0, -1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Embed.hammingTopK(queries, corpus, "vec_id", "embedding", 3)
      .orderBy($"rank").as[(Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1, 10L, 0L), (0L, 2, 11L, 1L), (0L, 3, 12L, 4L)))
  }

  test("randomProject emits outDim rows per vector and is linear") {
    // Inputs are exact 1e-6 multiples, so rp(2x) = 2*rp(x) exactly
    // (the per-term quantization is exact and the sum is linear).
    val x = (0 until 8).map(d => d / 4.0)
    val df = Seq((0L, x), (1L, x.map(_ * 2))).toDF("vec_id", "embedding")
    val out = Embed.randomProject(df, "vec_id", "embedding",
        outDim = 4, dim = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.size == 8)
    assert(out.map(_._2).toSet == (0L until 4L).toSet)
    val y0 = out.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    val y1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    y0.zip(y1).foreach { case (a, b) =>
      assert(math.abs(b - 2 * a) < 2e-6, s"rp not linear: $a vs $b")
    }
  }

  test("randomProject is deterministic under repartitioning and seed-sensitive") {
    val df = corpus(30, 8)
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Embed.randomProject(d, "vec_id", "embedding", outDim = 4, dim = 8,
          seed = seed)
        .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(run(df, "jl") == run(df.repartition(11), "jl"))
    assert(run(df, "jl") != run(df, "jl2"))
  }

  test("randomProject rejects vectors wider than dim instead of truncating") {
    // the sign spine covers 0..dim-1; a 10-wide vector against dim=8
    // would silently sketch a prefix — must fail loudly instead
    val df = Seq((0L, (0 until 10).map(_ / 4.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Embed.randomProject(df, "vec_id", "embedding", outDim = 4, dim = 8)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("vector width")), e.toString)
  }
}
