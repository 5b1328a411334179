package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partitioned co-located joins — the cluster-scale
  * answer to repeated fact-fact joins on the same key. Writing both
  * sides bucketed by the join key lets SortMergeJoin run with ZERO
  * exchanges; this spec asserts that on the physical plan.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans without Exchange") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    events.select("event_id", "user_id", "value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("b_left")
    events.select("event_id", "user_id", "event_type")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("b_right")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left")
        .join(spark.table("b_right"), "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, but plan has Exchange:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
