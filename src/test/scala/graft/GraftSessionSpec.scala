package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("attach exposes tables and native functions to raw SQL") {
    GraftSession.attach(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").head().getLong(0)
    assert(n > 1000)
    val sims = spark.sql(
      """SELECT a.vec_id, cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                            CAST(b.embedding AS ARRAY<DOUBLE>)) AS c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 3""".stripMargin).collect()
    assert(sims.length === 3)
    val self = sims.find(_.getLong(0) == 0L).get.getDouble(1)
    assert(math.abs(self - 1.0) < 1e-12, "self-similarity must be 1")
  }

  test("catalog lists every query; unknown names fail with the catalog") {
    assert(GraftSession.catalog.size === SparkEntry.queries.size)
    assert(GraftSession.catalog.contains("cdc_latest_state"))
    assert(GraftSession.catalog === GraftSession.catalog.sorted)
    val e = intercept[IllegalArgumentException] {
      GraftSession.query(spark, "/root/testdata/sf0.001", "no_such_query")
    }
    assert(e.getMessage.contains("no_such_query") &&
      e.getMessage.contains("cdc_latest_state"))
  }

  test("release() drops the library's shared cache entries") {
    // build a query family that persists shared intermediates
    GraftSession.query(spark, "/root/testdata/sf0.001", "dedup_minhash_lsh").count()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "dedup pipeline should have registered cache entries")
    GraftSession.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() must unpersist every CachePool registration")
  }

  test("named queries run through the facade") {
    val df = GraftSession.query(spark, "/root/testdata/sf0.001", "q1_pricing_summary")
    assert(df.count() > 0)
  }
}
