package graft

import graft.util.Guardrails

/** Suite-wide plan-shape gate: no query may contain an un-partitioned
  * Window operator (Spark's WindowExec moves ALL rows to a single
  * partition to evaluate one — a 100×-scale serialization point).
  * Round 8 shipped exactly one (the rolling beta/corr pair on a global
  * rn ordering); this spec pins the invariant so the next one can't
  * land.
  */
class WindowGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("no SparkEntry query plan contains an un-partitioned Window") {
    // streaming_* queries run a full replay harness (staged stream to a
    // parquet sink) and the DataFrame they return is the trivial
    // post-replay batch read — minutes of wall-clock with no Window to
    // inspect. Their streaming transforms are guarded where they're
    // built; scan only the batch queries here.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("streaming_"))
      .flatMap { case (name, fn) =>
        try {
          Guardrails.requirePartitionedWindows(fn(spark, dir))
          None
        } catch {
          case e: IllegalArgumentException => Some(s"$name: ${e.getMessage}")
        }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
