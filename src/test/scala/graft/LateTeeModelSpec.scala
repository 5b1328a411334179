package graft

import org.scalatest.funsuite.AnyFunSuite

/** Model-based property test of the late-data tee
  * (streaming/ChangeLogStream.lateDataSplit). The scenario test in
  * StreamingSpec checks one history; this spec checks the CONTRACT over
  * random event-time sequences, random delays, and random batchings:
  *
  *   1. partition law — every batch row lands in exactly one of
  *      (onTime, late);
  *   2. the split uses the PREDECESSOR batch's recorded high-water mark
  *      minus the delay (batch 0, with no predecessor, admits all);
  *   3. recorded marks are monotone non-decreasing and equal
  *      max(previous mark, batch max event time);
  *   4. replaying ANY earlier batch AFTER the live mark has advanced
  *      reproduces its original split exactly, and leaves every
  *      recorded mark unchanged — the crash-replay determinism the
  *      per-batch mark files exist to provide.
  */
class LateTeeModelSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tsOf(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")
  private def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L

  test("property: random batchings obey the recorded-watermark split model") {
    import spark.implicits._
    val histories = 60
    for (h <- 0 until histories) {
      val rnd = new scala.util.Random(0x1A7E + h)
      val delayUs = (1 + rnd.nextInt(30)).toLong * 60L * 1000000L
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_latemodel_$h").toString
      val wmDir = s"$base/wm"
      val n = 5 + rnd.nextInt(20)
      val evs = (1 to n).map { i =>
        streaming.RawEvent(i.toLong, tsOf(rnd.nextInt(600)),
          (i % 5).toLong, "click", 1.0, "{}")
      }
      val batches = evs.grouped(1 + rnd.nextInt(6)).toSeq
      var mark = -1L // model of the recorded high-water mark chain
      val splits =
        scala.collection.mutable.Map[Long, (Set[Long], Set[Long])]()
      batches.zipWithIndex.foreach { case (b, idInt) =>
        val id = idInt.toLong
        val df = spark.createDataset(b).toDF()
        val (onTime, late) =
          streaming.ChangeLogStream.lateDataSplit(wmDir, delayUs)(df, id)
        val lateIds = late.select($"event_id").as[Long].collect().toSet
        val onIds = onTime.select($"event_id").as[Long].collect().toSet
        // 1. partition law
        assert((lateIds & onIds).isEmpty, s"h=$h b=$id: overlap")
        assert(lateIds ++ onIds === b.map(_.event_id).toSet,
          s"h=$h b=$id: rows lost")
        // 2. predecessor-mark split
        val expLate =
          if (mark < 0) Set.empty[Long]
          else b.filter(e => micros(e.ts) < mark - delayUs)
            .map(_.event_id).toSet
        assert(lateIds === expLate, s"h=$h b=$id: split drifted from model")
        // 3. monotone recorded mark
        val bmax = b.map(e => micros(e.ts)).max
        mark = math.max(mark, bmax)
        assert(pipeline.LsnCheckpoint.read(spark, s"$wmDir/wm-$id") === mark,
          s"h=$h b=$id: recorded mark drifted from model")
        splits(id) = (onIds, lateIds)
      }
      // 4. replay determinism: any earlier batch re-splits identically
      // and moves no recorded mark
      val rb = rnd.nextInt(batches.length)
      val df = spark.createDataset(batches(rb)).toDF()
      val (onT, lt) = streaming.ChangeLogStream
        .lateDataSplit(wmDir, delayUs)(df, rb.toLong)
      assert((onT.select($"event_id").as[Long].collect().toSet,
        lt.select($"event_id").as[Long].collect().toSet) === splits(rb.toLong),
        s"h=$h: replay of batch $rb diverged")
      assert(pipeline.LsnCheckpoint.read(spark,
        s"$wmDir/wm-${batches.length - 1}") === mark,
        s"h=$h: replay moved the live mark")
    }
  }
}
