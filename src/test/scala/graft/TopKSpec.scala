package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    .select("user_id", "event_id", "value")
    .repartition(7) // force multi-partition partial phase

  test("custom TopKPerKey matches the window row_number formulation") {
    val native = TopK.perKey(events, Seq("user_id"),
      Seq(("value", false), ("event_id", true)), 4)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val reference = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(native === reference)
    assert(native.nonEmpty)
  }

  test("plan uses the two-phase custom exec, not Window") {
    val df = TopK.perKey(events, Seq("user_id"), Seq(("value", false), ("event_id", true)), 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("PartialTopK"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("unknown column names fail fast with the available columns listed") {
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(events, Seq("no_such_col"), Seq(("value", false)), 3)
    }
    assert(e.getMessage.contains("no_such_col"))
    assert(e.getMessage.contains("user_id"))
  }

  test("k larger than group size returns whole groups") {
    val tiny = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 9.0))
      .toDF("user_id", "event_id", "value")
    val out = TopK.perKey(tiny, Seq("user_id"),
      Seq(("value", false), ("event_id", true)), 10)
      .collect().map(_.toSeq).toSet
    assert(out.size === 3)
  }
}
