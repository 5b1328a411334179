package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard: every declared query must execute at sf0.001 (the
  * driver's smoke scale) without throwing, and every oracle key must
  * reference a declared query. Value correctness is the DuckDB oracle's
  * job (driver + tools/check_oracle.py); this catches wiring/analysis
  * breakage fast.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
