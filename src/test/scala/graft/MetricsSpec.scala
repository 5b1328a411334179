package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Metrics

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("listener records per-action wall time and plan metrics") {
    val l = Metrics.install(spark)
    try {
      val df = SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      df.collect()
      // listener callbacks drain asynchronously; poll briefly
      var tries = 0
      while (l.snapshot().isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val ms = l.snapshot()
      assert(ms.nonEmpty, "no metrics recorded")
      val m = ms.last
      assert(!m.failed && m.durationNs > 0)
      assert(m.outputRows >= 6, s"expected q1's groups counted somewhere, got $m")
    } finally Metrics.uninstall(spark, l)
  }
}
