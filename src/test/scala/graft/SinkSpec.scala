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
}
