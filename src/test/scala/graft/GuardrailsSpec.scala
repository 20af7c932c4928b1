package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Guardrails
import graft.util.Guardrails.{Silent, Strict, Warn}

/** Parity spec for the reference guard_expr contract surface
  * (ffn_polars/utils/guardrails.py): dtype checks, the
  * required_substring name contract, null contracts, and the
  * WARN/STRICT/SILENT mode switch.
  */
class GuardrailsSpec extends SparkSpec {
  import spark.implicits._

  test("dtype guard: strict throws, silent passes, withMode restores") {
    val df = Seq(1.0, 2.0).toDF("price")
    Guardrails.requireDouble(df, "price") // ok in default strict
    intercept[IllegalArgumentException] {
      Guardrails.require(df, "price", LongType)
    }
    Guardrails.withMode(Silent) {
      Guardrails.require(df, "price", LongType) // swallowed
      assert(Guardrails.currentMode == Silent)
    }
    assert(Guardrails.currentMode == Strict)
    Guardrails.withMode(Warn) {
      Guardrails.require(df, "price", LongType) // logged, no throw
    }
  }

  test("timestamp guard accepts both parquet timestamp flavors") {
    val tz = Seq(1L).toDF("us").select(timestamp_micros($"us").as("ts"))
    Guardrails.requireTimestamp(tz, "ts")
    val ntz = tz.select($"ts".cast(TimestampNTZType).as("ts"))
    Guardrails.requireTimestamp(ntz, "ts")
    intercept[IllegalArgumentException] {
      Guardrails.requireTimestamp(tz.select($"ts".cast("long").as("ts")), "ts")
    }
  }

  test("name contract mirrors guard_expr required_substring") {
    Guardrails.requireNameContains("daily_returns", "returns")
    intercept[IllegalArgumentException] {
      Guardrails.requireNameContains("close_price", "returns")
    }
  }

  test("null contracts: schema-level and data-level") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    Guardrails.requireNoNulls(clean, "id", "v")
    val dirty = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Guardrails.requireNoNulls(dirty, "id", "v")
    }
    assert(e.getMessage.contains("'v' (1 nulls)") &&
      !e.getMessage.contains("'id'"), e.getMessage)
    // schema-level: Option-typed column is declared nullable
    intercept[IllegalArgumentException] {
      Guardrails.requireNonNullable(dirty, "v")
    }
    Guardrails.requireNonNullable(dirty, "id")
  }

  test("epochUs: both timestamp flavors value-exact, raw Long still fails loudly") {
    val tz = Seq(1712928600000000L).toDF("us")
      .select(timestamp_micros($"us").as("ts"))
    assert(tz.select(graft.functions.Tick.epochUs($"ts")).as[Long].head()
      == 1712928600000000L)
    val ntz = tz.select($"ts".cast(TimestampNTZType).as("ts"))
    assert(ntz.select(graft.functions.Tick.epochUs($"ts")).as[Long].head()
      == 1712928600000000L)
    // a legacy Long-ns column must NOT silently cast (Long→Timestamp
    // reads SECONDS — ~1e9× off); analysis has to reject it like
    // unix_micros always did
    val longs = Seq(1712928600000000000L).toDF("ts")
    intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(graft.functions.Tick.epochUs($"ts")).collect()
    }
  }

  test("silent mode skips the requireNoNulls scan entirely") {
    // a frame whose evaluation THROWS: if Silent still ran the job,
    // this would explode instead of returning quietly
    val bomb = spark.range(1).selectExpr(
      "assert_true(id > 100, 'guard job ran under Silent') AS v")
    Guardrails.withMode(graft.util.Guardrails.Silent) {
      Guardrails.requireNoNulls(bomb, "v")
    }
  }

  test("data-level null guard is one aggregate job with pruned scan") {
    val df = Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "v", "s")
    val aggs = Seq("id", "v").map(c => count(when(col(c).isNull, lit(1))).as(c))
    val plan = df.agg(aggs.head, aggs.tail: _*)
      .queryExecution.optimizedPlan.toString
    // the untouched column must be pruned out of the aggregate's input
    assert(!plan.contains("s#"), plan)
  }
}
