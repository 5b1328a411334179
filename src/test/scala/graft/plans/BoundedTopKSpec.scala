package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit test of the partial-phase chunked flush: with a tiny
  * flush threshold the map is drained many times mid-partition, and the
  * re-reduced result must equal the single-map result (top-k idempotence
  * is what makes bounded-memory partials correct).
  */
class BoundedTopKSpec extends AnyFunSuite {

  private val key = AttributeReference("k", LongType)()
  private val v = AttributeReference("v", LongType)()
  private val output = Seq(key, v)
  private val ord = Seq(SortOrder(v, Descending))

  private def rows = {
    val proj = UnsafeProjection.create(
      Array[org.apache.spark.sql.types.DataType](LongType, LongType))
    // interleave keys so each tiny chunk sees several keys repeatedly
    (1L to 500L).map { i =>
      proj(new GenericInternalRow(Array[Any](i % 13, (i * 7919) % 501))).copy()
    }
  }

  private def collect(it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =
    it.map(r => (r.getLong(0), r.getLong(1))).toVector

  test("chunked partial + final reduce == unchunked top-k per key") {
    val k = 3
    val chunkedPartial = BoundedTopK.perKey(
      rows.iterator, Seq(key), ord, k, output, flushKeys = 2)
    val rechunked = BoundedTopK.perKey(
      chunkedPartial, Seq(key), ord, k, output) // final reduce, one map
    val direct = BoundedTopK.perKey(rows.iterator, Seq(key), ord, k, output)
    assert(collect(rechunked).groupBy(_._1).view.mapValues(_.toSet).toMap ===
      collect(direct).groupBy(_._1).view.mapValues(_.toSet).toMap)
  }

  test("dedup-by-id (k=1, order==key) plans the sort-free DistinctByKey final") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (1L, "a2"), (3L, "c"), (2L, "b2"))
      .toDF("id", "payload").repartition(3)
    val deduped = TopK.perKey(df, Seq("id"), Seq(("id", false)), 1)
    val plan = deduped.queryExecution.executedPlan.toString
    assert(plan.contains("DistinctByKey"), plan)
    assert(!plan.contains("FinalTopK"), plan)
    assert(!plan.contains("Sort"),
      s"unique-id dedup must not sort anything:\n$plan")
    val ids = deduped.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L)) // exactly one survivor per id
    // ...and the general k>1 path is untouched
    val general = TopK.perKey(df, Seq("id"), Seq(("payload", true)), 1)
    assert(general.queryExecution.executedPlan.toString.contains("FinalTopK"))
  }

  test("tiny flush threshold emits bounded chunks, not the whole input") {
    // clustered key arrival (the common case after a scan of key-sorted
    // data): each chunk fully reduces its flushKeys keys before a new
    // key forces the flush, so output ≈ keys · k even with a tiny cap
    val clustered = rows.sortBy(_.getLong(0))
    val partial = collect(BoundedTopK.perKey(
      clustered.iterator, Seq(key), ord, 1, output, flushKeys = 2))
    assert(partial.size === 13) // 13 keys, k=1, no key spans a chunk edge
  }
}
