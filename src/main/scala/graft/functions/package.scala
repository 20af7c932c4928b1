package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.when

package object functions {
  /** ANSI-safe ratio: null instead of DIVIDE_BY_ZERO. CaseWhen branches
    * evaluate lazily, so the division never executes on a zero
    * denominator — one degenerate group (constant series, single tick)
    * must not fail a 1000-executor job.
    */
  private[graft] def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0, num / den)
}
