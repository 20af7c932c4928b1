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

  test("pinned (t, df) grid across the published t-table") {
    // (t quantile, df, CDF level) from standard published Student-t
    // tables — the same values the reference's statrs-backed kernel
    // (src/lib.rs:8) reproduces. Quantiles are 6dp-rounded, which
    // perturbs the CDF by < density×5e-7, hence the 2e-6 tolerance.
    val grid = Seq(
      (6.313752, 1.0, 0.95), (12.706205, 1.0, 0.975),
      (31.820516, 1.0, 0.99), (63.656741, 1.0, 0.995),
      (2.919986, 2.0, 0.95), (4.302653, 2.0, 0.975),
      (2.015048, 5.0, 0.95), (2.570582, 5.0, 0.975), (3.364930, 5.0, 0.99),
      (1.812461, 10.0, 0.95), (2.228139, 10.0, 0.975), (3.169273, 10.0, 0.995),
      (1.697261, 30.0, 0.95), (2.042272, 30.0, 0.975),
      (1.657651, 120.0, 0.95), (1.979930, 120.0, 0.975),
      (1.646379, 1000.0, 0.95), (1.962339, 1000.0, 0.975))
    grid.foreach { case (t, df, level) =>
      assert(math.abs(cdf(t, df) - level) < 2e-6,
        s"cdf($t, df=$df) = ${cdf(t, df)} != $level")
      // and the left tail by symmetry
      assert(math.abs(cdf(-t, df) - (1.0 - level)) < 2e-6,
        s"cdf(-$t, df=$df) != ${1.0 - level}")
    }
  }
  test("edge cases") {
    assert(cdf(Double.PositiveInfinity, 5) == 1.0)
    assert(cdf(Double.NegativeInfinity, 5) == 0.0)
    assert(cdf(1.0, 0.0).isNaN)
  }
}
