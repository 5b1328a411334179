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
