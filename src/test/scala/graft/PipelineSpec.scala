package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ChangeLog

object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def changelog = Seq(
    // (lsn, key, op, payload)
    (1L, "u1", "insert", "a"),
    (2L, "u1", "update", "b"),
    (3L, "u2", "insert", "c"),
    (4L, "u1", "update", "d"),
    (5L, "u2", "delete", ""),
    (6L, "u3", "insert", "e")
  ).toDF("lsn", "key", "op", "payload")

  test("latestState keeps exactly the max-lsn row per key") {
    val out = ChangeLog.latestState(changelog, Seq("key"), "lsn")
      .select("key", "lsn", "payload").as[(String, Long, String)]
      .collect().toSet
    assert(out === Set(("u1", 4L, "d"), ("u2", 5L, ""), ("u3", 6L, "e")))
  }

  test("latestStateWithTombstones drops keys whose latest op is delete") {
    val out = ChangeLog.latestStateWithTombstones(
      changelog, Seq("key"), "lsn", col("op") === "delete")
      .select("key").as[String].collect().toSet
    assert(out === Set("u1", "u3"))
  }

  test("tombstoned key reappears if re-inserted later") {
    val withReinsert = changelog.union(
      Seq((7L, "u2", "insert", "z")).toDF("lsn", "key", "op", "payload"))
    val out = ChangeLog.latestStateWithTombstones(
      withReinsert, Seq("key"), "lsn", col("op") === "delete")
      .select("key", "payload").as[(String, String)].collect().toSet
    assert(out === Set(("u1", "d"), ("u3", "e"), ("u2", "z")))
  }

  test("replay is idempotent: duplicated log yields identical latest state") {
    val doubled = changelog.union(changelog)
    val once = ChangeLog.latestState(
      ChangeLog.replayDedup(changelog, "lsn"), Seq("key"), "lsn").collect().toSet
    val twice = ChangeLog.latestState(
      ChangeLog.replayDedup(doubled, "lsn"), Seq("key"), "lsn").collect().toSet
    assert(once === twice)
  }

  test("latest state is invariant under input permutation") {
    val shuffled = changelog.orderBy(rand(seed = 7))
    val a = ChangeLog.latestState(changelog, Seq("key"), "lsn").collect().toSet
    val b = ChangeLog.latestState(shuffled, Seq("key"), "lsn").collect().toSet
    assert(a === b)
  }

  test("fenceUnion dedups the snapshot/stream overlap window") {
    val snapshot = changelog.filter($"lsn" <= 4)
    val stream = changelog.filter($"lsn" >= 3) // overlap at 3,4
    val merged = ChangeLog.fenceUnion(snapshot, stream, "lsn")
    assert(merged.count() === 6)
    val latest = ChangeLog.latestState(merged, Seq("key"), "lsn").collect().toSet
    val direct = ChangeLog.latestState(changelog, Seq("key"), "lsn").collect().toSet
    assert(latest === direct)
  }
}
