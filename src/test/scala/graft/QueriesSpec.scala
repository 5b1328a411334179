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

  test("query names are globally unique across modules (no silent shadowing)") {
    // SparkEntry unions the module maps with ++, where a duplicate key
    // SILENTLY drops the earlier module's query — a collision once cost
    // a verified query without any test noticing. Names must be unique.
    val modules: Seq[(String, Iterable[String])] = Seq(
      "CdcQueries" -> pipeline.CdcQueries.queries.keys,
      "Relational" -> operators.Relational.queries.keys,
      "RelationalExt" -> operators.RelationalExt.queries.keys,
      "RelationalExt2" -> operators.RelationalExt2.queries.keys,
      "TpchRest" -> operators.TpchRest.queries.keys,
      "Mining" -> operators.Mining.queries.keys,
      "Stats" -> operators.Stats.queries.keys,
      "Profiling" -> operators.Profiling.queries.keys,
      "SqlSurface" -> operators.SqlSurface.queries.keys,
      "Dedup" -> operators.Dedup.queries.keys,
      "Similarity" -> operators.Similarity.queries.keys,
      "Graph" -> operators.Graph.queries.keys,
      "Layout" -> operators.Layout.queries.keys,
      "TextAnalysis" -> operators.TextAnalysis.queries.keys,
      "Curation" -> operators.Curation.queries.keys,
      "Multimodal" -> multimodal.Multimodal.queries.keys)
    val dupes = modules
      .flatMap { case (m, ks) => ks.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
    assert(dupes.isEmpty, s"shadowed query names: $dupes")
    // and the union must therefore be exactly the sum of the parts
    assert(SparkEntry.queries.size === modules.map(_._2.size).sum)
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
