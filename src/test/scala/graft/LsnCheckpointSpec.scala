package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.LsnCheckpoint

class LsnCheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/lastLSN"

  test("read of a missing checkpoint is -1; write/read round-trips") {
    val ckpt = tmp("graft_ckpt1")
    assert(LsnCheckpoint.read(spark, ckpt) === -1L)
    LsnCheckpoint.write(spark, ckpt, 42L)
    assert(LsnCheckpoint.read(spark, ckpt) === 42L)
    LsnCheckpoint.write(spark, ckpt, 99L) // single-key upsert overwrites
    assert(LsnCheckpoint.read(spark, ckpt) === 99L)
  }

  test("write is an atomic replace: no reader ever observes a missing checkpoint") {
    // the round-3/4 defect: delete-then-rename had a window where the
    // checkpoint did not exist and read() returned -1 (→ full history
    // reprocess). Hammer writes on one thread while reading on another:
    // with an atomic replace the reader sees monotone values, never -1.
    val ckpt = tmp("graft_ckpt_atomic")
    LsnCheckpoint.write(spark, ckpt, 0L)
    @volatile var done = false
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val reader = new Thread(() => while (!done) seen.add(LsnCheckpoint.read(spark, ckpt)))
    reader.start()
    (1L to 200L).foreach(LsnCheckpoint.write(spark, ckpt, _))
    done = true
    reader.join()
    import scala.jdk.CollectionConverters._
    val vals = seen.asScala.toSeq.map(_.longValue)
    assert(vals.nonEmpty && !vals.contains(-1L),
      s"reader observed a missing checkpoint: ${vals.filter(_ < 0)}")
    assert(vals === vals.sorted, "reader observed a rollback")
    assert(LsnCheckpoint.read(spark, ckpt) === 200L)
  }

  test("a stale .tmp from a crashed writer is harmless and overwritten") {
    val ckpt = tmp("graft_ckpt_tmp")
    LsnCheckpoint.write(spark, ckpt, 7L)
    // simulate a writer that died after staging but before publishing
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ckpt + ".tmp"), "garbage")
    assert(LsnCheckpoint.read(spark, ckpt) === 7L) // committed value intact
    LsnCheckpoint.write(spark, ckpt, 8L)           // next writer just re-stages
    assert(LsnCheckpoint.read(spark, ckpt) === 8L)
  }

  test("consumeIncrement processes each event exactly once across runs") {
    val ckpt = tmp("graft_ckpt2")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(upTo: Long): Long =
      LsnCheckpoint.consumeIncrement(
        (1L to upTo).toDF("lsn"), "lsn", ckpt) { inc =>
        seen ++= inc.collect().map(_.getLong(0))
      }
    assert(run(5) === 5L)                 // first run: everything
    assert(run(5) === 0L)                 // no new events → no work, no write
    assert(run(8) === 3L)                 // only the new suffix
    assert(seen.sorted.toSeq === (1L to 8L))
    assert(LsnCheckpoint.read(spark, ckpt) === 8L)
  }

  test("a failing run does not advance the checkpoint (retry-able)") {
    val ckpt = tmp("graft_ckpt3")
    LsnCheckpoint.write(spark, ckpt, 3L)
    intercept[RuntimeException] {
      LsnCheckpoint.consumeIncrement((1L to 6L).toDF("lsn"), "lsn", ckpt) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    // checkpoint untouched → the same increment replays next run
    assert(LsnCheckpoint.read(spark, ckpt) === 3L)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    LsnCheckpoint.consumeIncrement((1L to 6L).toDF("lsn"), "lsn", ckpt) { inc =>
      seen ++= inc.collect().map(_.getLong(0))
    }
    assert(seen.sorted.toSeq === Seq(4L, 5L, 6L))
  }
}
