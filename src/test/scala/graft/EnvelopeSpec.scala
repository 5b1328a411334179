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

  test("snapshot events carry the column catalog; stream events carry null") {
    import graft.model.{CdcEvent, ColumnMeta}
    val snaps = Envelope.snapshotEvents(eventsDf, fenceLsn = 2L)
      .collect().sortBy(_.lsn)
    assert(snaps.length === 2)
    assert(snaps.forall(_.op == "snapshot"))
    // the catalog the reference captures from FieldDescriptions
    // (replicator.go:114-126): names + PostgreSQL type OIDs + mod + format
    snaps.foreach { e =>
      assert(e.columns === CdcEvent.usersCatalog)
      assert(e.columns.map(_.name) === Seq("user_id", "value", "k"))
      assert(e.columns.find(_.name == "value").get ===
        ColumnMeta("value", 701, -1, 0)) // float8
    }
    // snapshot payload rides in `after` like any insert — ONE envelope
    // shape (the reference's values/data asymmetry is the bug we fixed)
    assert(snaps(0).after("value") === "1.0" && snaps(0).before === Map.empty)
    // stream events have no catalog (pgoutput identifies columns via the
    // relation registry, not per-message descriptors)
    val stream = Envelope.toCdcEvents(eventsDf).collect()
    assert(stream.forall(_.columns == null))
    // ...and the catalog survives the JSON wire round trip
    val rt = Envelope.jsonRoundTrip(Envelope.snapshotEvents(eventsDf, 2L))
    val rtCols = rt.select($"columns").collect()
    assert(rtCols.length === 2)
    assert(rtCols.forall(r => r.getSeq[org.apache.spark.sql.Row](0).length == 3))
  }

  test("Kafka message shape: binary key/value, consume == direct pipeline") {
    val env = Envelope.toCdcEvents(eventsDf)
    val wire = Envelope.toKafkaMessages(env)
    // exactly the two-column relation a Kafka batch read delivers
    assert(wire.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("key", "binary"), ("value", "binary")))
    val keys = wire.select($"key".cast("string")).as[String].collect()
    assert(keys.forall(_ == "public.users:7")) // producer.go:374-379 key shape
    // produce → consume is the identity on the envelope
    val back = Envelope.fromKafkaMessages(wire)
    assert(back.select($"lsn", $"op", $"key", $"txnId").collect().toSet ===
      env.select($"lsn", $"op", $"key", $"txnId").collect().toSet)
    // ...and on the derived latest-state semantics
    val direct = ChangeLog.latestState(env.toDF(), Seq("key"), "lsn")
      .select($"lsn", $"op").collect().toSet
    val viaWire = ChangeLog.latestState(back.toDF(), Seq("key"), "lsn")
      .select($"lsn", $"op").collect().toSet
    assert(direct === viaWire && direct.nonEmpty)
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

  test("property: Kafka wire round trip is the identity on random envelopes") {
    // produce→consume must be lossless for arbitrary envelope content:
    // unicode payloads, empty vs populated maps, extreme LSNs, every op
    import graft.model.{CdcEvent, ColumnMeta}
    val rnd = new scala.util.Random(0xBEEF)
    val payloadPool = Seq("plain", "uni→©ode", "with \"quotes\"",
      "line\nbreak", "tab\tchar", "null")
    val events = (1 to 60).map { i =>
      val op = CdcEvent.ops(rnd.nextInt(CdcEvent.ops.size))
      def m() = if (rnd.nextBoolean()) Map.empty[String, String]
        else Map("v" -> payloadPool(rnd.nextInt(payloadPool.size)),
          s"k$i" -> rnd.nextLong().toString)
      CdcEvent(op, "public", s"t$i", rnd.nextLong().abs.max(1L),
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1 << 30)),
        s"public.t$i:${rnd.nextInt(100)}", m(), m(), rnd.nextLong(),
        if (op == "snapshot") Seq(ColumnMeta("v", 25, -1, 0)) else null,
        // TOAST markers must survive the wire byte-for-byte too
        if (op == "update" && rnd.nextBoolean()) Seq("v", s"k$i") else null)
    }
    val src = spark.createDataset(events)
    val back = Envelope.fromKafkaMessages(Envelope.toKafkaMessages(src))
      .collect().sortBy(_.lsn)
    val orig = events.sortBy(_.lsn)
    assert(back.length === orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.op === o.op && b.key === o.key && b.lsn === o.lsn &&
        b.txnId === o.txnId && b.ts === o.ts, s"scalar drift: $b vs $o")
      assert(b.before === o.before && b.after === o.after, s"map drift: $b vs $o")
      assert((b.columns == null) === (o.columns == null))
      if (o.columns != null) assert(b.columns === o.columns)
      assert((b.unchangedCols == null) === (o.unchangedCols == null))
      if (o.unchangedCols != null) assert(b.unchangedCols === o.unchangedCols)
    }
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
