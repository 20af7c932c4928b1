package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.syntax._
import graft.util.Guardrails

/** Fluent namespace API: auto-aliasing + reference-shaped names. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")

  test("auto-alias appends the op suffix to the source column name") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 110.0)).toDF("k", "t", "price")
    val out = df.select($"price".toReturns(w))
    assert(out.columns.toSeq == Seq("price_returns"))
    val agg = df.groupBy($"k").agg($"price".calcTotalReturn($"t"))
    assert(agg.columns.toSeq == Seq("k", "price_total_return"))
  }

  test("prob_mom via native t_cdf: identical series → 0.5-ish NaN-free") {
    val df = Seq(("a", 0.01, 0.02), ("a", 0.03, 0.01), ("a", -0.01, 0.00),
        ("a", 0.02, 0.02), ("a", 0.00, -0.01))
      .toDF("k", "ra", "rb")
    val p = df.groupBy($"k").agg($"ra".calcProbMom($"rb"))
      .select($"ra_prob_mom").as[Double].head()
    assert(p > 0.0 && p < 1.0)
  }

  test("guardrails reject wrong dtypes like the reference guard_expr") {
    val df = Seq(("a", 1)).toDF("k", "v")
    Guardrails.requireDouble(df.withColumn("d", $"v".cast("double")), "d")
    intercept[IllegalArgumentException] {
      Guardrails.requireDouble(df, "v")
    }
  }

  test("guard modes: WARN and SILENT proceed on mismatch, STRICT restores") {
    // reference guardrails.py:13-30 — WARN warns and continues, SILENT
    // says nothing, and the mode switch is global with lexical override
    val df = Seq(("a", 1)).toDF("k", "v")
    Guardrails.withMode(Guardrails.Warn) {
      Guardrails.requireDouble(df, "v") // logs, must NOT throw
      assert(Guardrails.currentMode == Guardrails.Warn)
    }
    Guardrails.withMode(Guardrails.Silent) {
      Guardrails.requireDouble(df, "v")
    }
    // withMode restored the global STRICT default
    assert(Guardrails.currentMode == Guardrails.Strict)
    intercept[IllegalArgumentException] {
      Guardrails.requireDouble(df, "v")
    }
    // and the global switch itself works
    Guardrails.setMode(Guardrails.Warn)
    try Guardrails.requireDouble(df, "v")
    finally Guardrails.setMode(Guardrails.Strict)
  }

  test("SQL surface via GraftExtensions-style registration") {
    functions.Graft.register(spark)
    val p = spark.sql("SELECT t_cdf(0.0, 10.0) AS p").as[Double].head()
    assert(math.abs(p - 0.5) < 1e-12)
  }
}
