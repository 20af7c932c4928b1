package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(ps: (Long, String)*) = ps.toDF("p", "pid")
  private def intervals(is: (Long, Long, String)*) = is.toDF("lo", "hi", "iid")

  test("binned range join matches the BETWEEN semantics exactly once per pair") {
    // bins of width 10; interval B spans three bins, C is contained in
    // one, D ends exactly on a bin edge. Points sit on boundaries, in
    // gaps, and inside multi-bin intervals.
    val ps = points((0L, "a"), (10L, "b"), (25L, "c"), (30L, "d"), (31L, "e"))
    val is = intervals((0L, 30L, "B"), (24L, 26L, "C"), (5L, 20L, "D"))
    val got = RangeJoin.binned(ps, "p", is, "lo", "hi", binWidth = 10L)
      .select($"pid", $"iid").as[(String, String)].collect().toSeq
    val want = for {
      (p, pid) <- Seq((0L, "a"), (10L, "b"), (25L, "c"), (30L, "d"), (31L, "e"))
      (lo, hi, iid) <- Seq((0L, 30L, "B"), (24L, 26L, "C"), (5L, 20L, "D"))
      if p >= lo && p <= hi
    } yield (pid, iid)
    // multiset equality: each matching pair appears EXACTLY once (a
    // point owns one bin, so the exploded interval meets it at most once)
    assert(got.sorted == want.sorted,
      s"got=${got.sorted} want=${want.sorted}")
  }

  test("degenerate, NULL, and negative-domain rows follow SQL BETWEEN") {
    val ps = Seq((Some(-15L), "a"), (None, "n")).toDF("p", "pid")
    val is = Seq((Some(-20L), Some(-10L), "I"),  // negative domain works
                 (Some(5L), Some(1L), "rev"),    // lo > hi matches nothing
                 (None, Some(9L), "nl")          // NULL bound matches nothing
      ).toDF("lo", "hi", "iid")
    val got = RangeJoin.binned(ps, "p", is, "lo", "hi", binWidth = 10L)
      .select($"pid", $"iid").as[(String, String)].collect().toSeq
    assert(got == Seq(("a", "I")), got.toString)
  }

  test("overlapping column names are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.binned(points((1L, "x")), "p",
        Seq((0L, 2L, "y")).toDF("lo", "hi", "pid"), "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("pid"))
  }

  test("the bin equi-key keeps the plan off nested-loop joins") {
    val df = SparkEntry.queries("range_join_agg")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }
}
