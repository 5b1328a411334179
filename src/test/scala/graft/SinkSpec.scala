package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D12 index-routing analog: the reference routes documents to
  * per-table ES indices (`cdc_public_users`); ours partitions the sink
  * by the routing column. The payoff at scale is PARTITION PRUNING — a
  * reader filtering on the routing column must touch only its
  * directory, which this spec asserts from the physical plan.
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("partitioned sink: routing-column filter prunes at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val events = sources.Tables.events(spark, "/root/testdata/sf0.001")
    pipeline.ChangeLog.latestState(events, Seq("user_id"), "event_id")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString

    // the filter must be a partition filter (directory-level pruning),
    // NOT a data filter evaluated per row
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"), scan)

    // and only the one partition's rows come back
    val expected = pipeline.ChangeLog
      .latestState(events, Seq("user_id"), "event_id")
      .filter(col("event_type") === "click").count()
    assert(back.count() === expected && expected > 0)
  }

  test("routeToTables: one directory per routed table, pruned reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString + "/t"
    val env = pipeline.Envelope.toCdcEventsStreaming(
      sources.Tables.events(spark, "/root/testdata/sf0.001")).toDF()
      .withColumn("tableName",
        when(col("op").isin("insert", "delete"), "users").otherwise("activity"))
    streaming.ChangeLogStream.routeToTables(env, dir)
    // physical layout: cdc_<schema>_<table> as directories
    val sub = new java.io.File(s"$dir/schemaName=public").list().sorted
    assert(sub.toSeq === Seq("tableName=activity", "tableName=users"))
    // per-index reader prunes the other table at the directory level
    val users = streaming.ChangeLogStream.readTable(spark, dir, "public", "users")
    val scan = users.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("tableName"), scan)
    assert(users.select("op").distinct().collect().map(_.getString(0)).toSet ===
      Set("insert", "delete"))
    // append of a second batch never rewrites the first
    val before = users.count()
    streaming.ChangeLogStream.routeToTables(env.limit(0), dir) // empty append ok
    streaming.ChangeLogStream.routeToTables(
      env.filter(col("tableName") === "users").limit(5), dir)
    assert(streaming.ChangeLogStream.readTable(spark, dir, "public", "users")
      .count() === before + 5)
  }
}
