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

  test("float/double KEY columns are rejected (binary grouping splits 0.0/-0.0)") {
    // ordering on a double is fine (comparison, not grouping); keying on
    // one is not — the partial map and final group detection compare raw
    // key bytes, so 0.0 vs -0.0 and NaN bit variants would split groups
    // that groupBy/window semantics merge.
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(events, Seq("value"), Seq(("event_id", true)), 3)
    }
    assert(e.getMessage.contains("value"))
    assert(e.getMessage.toLowerCase.contains("float"))
  }

  test("property: TopK.perKey == window formulation on random logs") {
    // the operator now carries latest-state + dedup-by-id, so its
    // equivalence to the window form is checked over random shapes:
    // random key cardinality, duplicates, negative values, random k
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 6).foreach { trial =>
      val n = 50 + rnd.nextInt(400)
      val keyCard = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(5)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(keyCard).toLong, i.toLong, rnd.nextInt(100) - 50.0)
      }
      val df = rows.toDF("key", "id", "v").repartition(5)
      val native = TopK.perKey(df, Seq("key"), Seq(("v", false), ("id", true)), k)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
      val ref = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(native === ref, s"trial $trial (n=$n keys=$keyCard k=$k) diverged")
    }
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
