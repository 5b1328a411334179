package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ChangeLog, Envelope}

class EnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def eventsDf = Seq(
    // (event_id, ts, user_id, event_type, value, props)
    (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "signup", 1.0, """{"k": 5}"""),
    (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "click", 2.0, """{"k": 6}"""),
    (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "error", 0.0, """{"k": 7}"""),
    (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 7L, "click", 4.0, """{"k": 8}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("envelope: op mapping, key, before-image lag, delete clears after") {
    val evs = Envelope.toCdcEvents(eventsDf).collect().sortBy(_.lsn)
    assert(evs.map(_.op).toSeq === Seq("insert", "update", "delete", "update"))
    assert(evs.forall(_.key == "public.users:7"))
    assert(evs(0).before === Map.empty && evs(0).after("value") === "1.0")
    assert(evs(1).before("value") === "1.0" && evs(1).after("value") === "2.0")
    assert(evs(2).before("value") === "2.0" && evs(2).after === Map.empty)
    // update directly after a delete: the key's state no longer existed,
    // so the before-image is EMPTY, not the deleted event's payload
    assert(evs(3).before === Map.empty && evs(3).after("value") === "4.0")
  }

  test("json round trip is the identity on scalar envelope fields") {
    val src = Envelope.toCdcEvents(eventsDf)
    val rt = Envelope.jsonRoundTrip(src)
    val a = src.select($"lsn", $"op", $"key", $"txnId").collect().toSet
    val b = rt.select($"lsn", $"op", $"key", $"txnId").collect().toSet
    assert(a === b)
  }

  test("corrupt wire records become nulls, not silently-committed skips") {
    // reference behavior D10: bad JSON is committed+skipped silently
    // (es_consumer/main.go:66-71); ours surfaces it as a null row that a
    // dead-letter filter can route.
    import graft.model.CdcEvent
    val wire = Seq(
      """{"op":"insert","schemaName":"public","tableName":"users","lsn":1,"ts":"2024-01-01T00:00:00Z","key":"public.users:1","before":{},"after":{"v":"1"},"txnId":0}""",
      """NOT JSON AT ALL""").toDF("wire")
    val parsed = wire.select(from_json($"wire", CdcEvent.envelopeSchema).as("ev"))
    assert(parsed.count() === 2)
    val good = parsed.filter($"ev".isNotNull && $"ev.lsn".isNotNull)
    assert(good.count() === 1)
    assert(good.select($"ev.key").as[String].head() === "public.users:1")
  }

  test("property: latest-state invariant under permutation + duplication") {
    val genLog = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(1L, 5L)
        op <- Gen.oneOf("insert", "update", "delete")
        v <- Gen.choose(0, 1000)
      } yield (key, op, v))
      seed <- Gen.choose(1L, 1000L)
    } yield (rows.zipWithIndex.map { case ((k, o, v), i) => (i.toLong, k, o, v) }, seed)

    (1 to 8).foreach { i =>
      val (rows, seed) = genLog(
        Gen.Parameters.default, rng.Seed(i.toLong * 7919)).get
      assert(rows.nonEmpty)
      val df = rows.toDF("lsn", "key", "op", "v")
      val shuffled = df.orderBy(rand(seed)).union(df.orderBy(rand(seed + 1)))
      val base = ChangeLog.latestState(
        ChangeLog.replayDedup(df, "lsn"), Seq("key"), "lsn")
        .collect().map(_.toSeq).toSet
      val perturbed = ChangeLog.latestState(
        ChangeLog.replayDedup(shuffled, "lsn"), Seq("key"), "lsn")
        .collect().map(_.toSeq).toSet
      assert(base === perturbed, s"sample $i diverged")
    }
  }
}
