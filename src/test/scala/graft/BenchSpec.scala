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

  test("parseQueries reads only the queries object, not nested splits") {
    val line = """{"metric":"total","value":9.0,"harness_sec":1.2,""" +
      """"streaming":{"s1":{"setup":0.4,"exec":0.2}},""" +
      """"setup_split":{"b1":{"setup":2.1,"main":0.9}},""" +
      """"queries":{"q1":1.25,"q2":0.5},"errors":{},"total_sec":9.0}"""
    assert(Bench.parseQueries(line) == Map("q1" -> 1.25, "q2" -> 0.5))
    // the nested setup/exec numbers must NOT leak in as phantom queries
    assert(!Bench.parseQueries(line).contains("setup"))
    assert(Bench.parseQueries("no queries here") == Map.empty)
  }

  test("parseBenchOne reads min3 isolation controls") {
    val line = """{"round":"r13","reps":3,"n":2,"queries":""" +
      """{"q_slow":{"min3":9.217,"suite":5.663},""" +
      """"q_fast":{"min3":0.8,"suite":2.4}}}"""
    assert(Bench.parseBenchOne(line) ==
      Map("q_slow" -> 9.217, "q_fast" -> 0.8))
    // the suite numbers must NOT leak in as the reference
    assert(Bench.parseBenchOne(line)("q_fast") == 0.8)
    assert(Bench.parseBenchOne("{}") == Map.empty)
  }

  test("collapse omits a query whose every rep failed") {
    val out = Bench.collapse(Map("ok" -> Seq(0.7), "dead" -> Seq.empty))
    assert(out == Map("ok" -> 0.7))
    assert(!out.contains("dead"))
    // and the total over the record can't be deflated by a phantom 0.0
    assert(out.values.sum == 0.7)
  }
}
