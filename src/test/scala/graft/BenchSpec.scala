package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's record hygiene: an all-reps-failed query must be OMITTED
  * from the timings map — never recorded as 0.0, which would deflate
  * total_sec in the archived BENCH json (VERDICT r10 item 3/8). */
class BenchSpec extends AnyFunSuite {
  test("collapse keeps the min of surviving reps") {
    val out = Bench.collapse(Map("q1" -> Seq(2.0, 1.5, 3.0)))
    assert(out == Map("q1" -> 1.5))
  }

  test("every query has a DuckDB oracle and every oracle has a query") {
    // the driver's hash gate only runs where BOTH exist — a missing
    // oracle silently downgrades a query to rows-only, a dangling
    // oracle is dead text; neither should survive a refactor
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
  }

  test("collapse omits a query whose every rep failed") {
    val out = Bench.collapse(Map("ok" -> Seq(0.7), "dead" -> Seq.empty))
    assert(out == Map("ok" -> 0.7))
    assert(!out.contains("dead"))
    // and the total over the record can't be deflated by a phantom 0.0
    assert(out.values.sum == 0.7)
  }
}
