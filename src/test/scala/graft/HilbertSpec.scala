package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two properties that make [[graft.operators.Layout.withHilbert]]
  * a HILBERT index and not merely some hash:
  *   1. bijection — every cell of the 256×256 grid gets a distinct
  *      index in [0, 65536);
  *   2. unit-step continuity — consecutive indices are always grid
  *      NEIGHBORS (|Δx| + |Δy| = 1). Morton order fails this (quadrant
  *      jumps); continuity is exactly why equal-index-range buckets
  *      stay tight rectangles and layout_hilbert_gain measures fewer
  *      buckets read than z-order under the same box.
  */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("hilbert index is a bijection with unit-step continuity on the full grid") {
    import spark.implicits._
    val n = 256
    val grid = spark.range(n.toLong * n).select(
      (col("id") / n).cast("long").as("cp"),
      (col("id") % n).cast("long").as("cs"))
    val cells = graft.operators.Layout.withHilbert(grid)
      .select($"cp", $"cs", $"hd").as[(Long, Long, Long)].collect()
    assert(cells.length === n * n)
    val ds = cells.map(_._3)
    assert(ds.min === 0L && ds.max === n.toLong * n - 1)
    assert(ds.distinct.length === n * n, "index must be a bijection")
    val byD = cells.sortBy(_._3)
    byD.sliding(2).zipWithIndex.foreach { case (Array(a, b), i) =>
      val step = math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
      assert(step === 1L,
        s"at d=$i: (${a._1},${a._2}) -> (${b._1},${b._2}) is not a unit step")
    }
  }
}
