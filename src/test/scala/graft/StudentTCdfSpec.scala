package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.StudentTCdf.cdf

/** Student-t CDF vs published t-table quantiles (the reference's native
  * kernel, src/lib.rs:8, computes the same CDF via statrs). */
class StudentTCdfSpec extends AnyFunSuite {
  test("symmetry and midpoint") {
    assert(math.abs(cdf(0.0, 5) - 0.5) < 1e-12)
    assert(math.abs(cdf(2.0, 7) + cdf(-2.0, 7) - 1.0) < 1e-12)
  }
  test("df=1 is Cauchy: F(1)=0.75") {
    assert(math.abs(cdf(1.0, 1) - 0.75) < 1e-10)
  }
  test("t-table quantiles") {
    assert(math.abs(cdf(1.8124611, 10) - 0.95) < 1e-6)   // t_{0.95,10}
    assert(math.abs(cdf(2.2281389, 10) - 0.975) < 1e-6)  // t_{0.975,10}
    assert(math.abs(cdf(1.6448536, 1e9) - 0.95) < 1e-4)  // → normal limit
  }
  test("edge cases") {
    assert(cdf(Double.PositiveInfinity, 5) == 1.0)
    assert(cdf(Double.NegativeInfinity, 5) == 0.0)
    assert(cdf(1.0, 0.0).isNaN)
  }
}
