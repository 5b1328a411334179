package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Envelope, Publication}

class PublicationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("ensure is idempotent and registers queryable views") {
    val spec = Publication.Spec("pub_t", Seq("public.users", "public.orders"))
    Publication.ensure(spark, sfDir, spec)
    Publication.ensure(spark, sfDir, spec) // second run must be a no-op
    assert(spark.catalog.tableExists("pub_t__users"))
    assert(spark.catalog.tableExists("pub_t__orders"))
    assert(spark.sql("SELECT count(*) FROM pub_t__orders").head().getLong(0) > 0)
    // the users role name resolves to the events table (with its nanos
    // timestamp handling intact — a raw parquet read would throw here)
    assert(spark.sql("SELECT count(*) FROM pub_t__users").head().getLong(0) > 0)
  }

  test("unknown table in a publication fails fast, like the reference DDL") {
    val e = intercept[IllegalArgumentException] {
      Publication.ensure(spark, sfDir,
        Publication.Spec("pub_bad", Seq("public.no_such_table")))
    }
    assert(e.getMessage.contains("no_such_table"))
  }

  test("feed delivers only the published tables' changes") {
    import spark.implicits._
    val env = Envelope.toCdcEvents(sources.Tables.events(spark, sfDir)).toDF()
      .withColumn("tableName",
        when(col("op").isin("insert", "delete"), "users").otherwise("activity"))
    val fed = Publication.feed(env,
      Publication.Spec("pub_users", Seq("public.users")))
    val tables = fed.select("tableName").distinct().as[String].collect().toSet
    assert(tables === Set("users"))
    assert(fed.count() > 0)
    // subscribing to everything delivers everything
    val all = Publication.feed(env,
      Publication.Spec("pub_all", Seq("public.users", "public.activity")))
    assert(all.count() === env.count())
  }
}
