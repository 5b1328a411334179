package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Mining}
import graft.sources.Tables

/** Semantic assertions for the sequence/affinity-mining operators and
  * the prefix-filter set-similarity join — each checked against an
  * independent formulation of the same relation (brute force, the
  * algebraic identity, or an invariant of the definition), not against
  * the implementation's own plan.
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("dedup_jaccard_prefix equals the brute-force all-pairs join (recall 1.0 by construction)") {
    // Brute force: every doc pair, exact jaccard on the same distinct
    // 3-gram shingles the operator uses. 500 docs at sf0.001 → 125k
    // pairs, fine for a test, impossible at corpus scale — which is
    // exactly the gap prefix filtering closes WITHOUT losing pairs.
    val sh = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(split(col("text"), " ")) - lit(3)),
          i => concat_ws(" ", split(col("text"), " ")(i),
            split(col("text"), " ")(i + 1), split(col("text"), " ")(i + 2))))
          .as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = Dedup.queries("dedup_jaccard_prefix")(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === brute)
    assert(prefix.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }

  test("transition matrix: per-from probabilities sum to 1 and transitions = events - users") {
    val m = Mining.queries("events_transition_matrix")(spark, sfDir)
      .transform(graft.CachePool.persist)
    val sums = m.groupBy("from_event").agg(sum("prob").as("p")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"${r.getString(0)} prob mass ${r.getDouble(1)}"))
    // Every user's n-event sequence yields n−1 transitions.
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val total = m.agg(sum("n_transitions")).head().getLong(0)
    assert(total === expected)
  }

  test("basket pairs: array expansion equals the item self-join identity") {
    val viaArrays = Mining.queries("basket_part_pairs")(spark, sfDir)
      .collect().map(_.toSeq).toList
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val viaJoin = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(25)
      .collect().map(_.toSeq).toList
    assert(viaArrays === viaJoin) // ordered compare: the top-k tie order is part of the contract
    assert(viaArrays.size === 25)
  }

  test("asof tolerance: matches are in-window clicks; stale matches are NULL, not the unbounded match") {
    val tol = Mining.queries("asof_tolerance")(spark, sfDir)
      .transform(graft.CachePool.persist)
    // Window containment: every non-null match lies in [pid − 200, pid).
    val bad = tol.filter(col("last_click").isNotNull &&
      !(col("last_click") >= col("purchase_id") - 200 &&
        col("last_click") < col("purchase_id"))).count()
    assert(bad === 0L)
    // Cross-check against the unbounded as-of: equal when the unbounded
    // match is within tolerance, NULL when it is older.
    val unbounded = graft.operators.RelationalExt
      .queries("asof_click_purchase")(spark, sfDir)
      .withColumnRenamed("last_click", "last_click_any")
    val joined = tol.join(unbounded, Seq("purchase_id", "user_id"))
      .transform(graft.CachePool.persist)
    val mismatchNear = joined.filter(
      col("last_click_any") >= col("purchase_id") - 200 &&
        !(col("last_click") === col("last_click_any"))).count()
    val mismatchStale = joined.filter(
      col("last_click_any") < col("purchase_id") - 200 &&
        col("last_click").isNotNull).count()
    assert(mismatchNear === 0L)
    assert(mismatchStale === 0L)
    // The tolerance must actually bite somewhere at this SF, or the
    // query is indistinguishable from the unbounded one.
    val stale = joined.filter(col("last_click").isNull &&
      col("last_click_any").isNotNull).count()
    assert(stale > 0L, "expected at least one stale click beyond tolerance")
  }

  test("bpe pairs: exactly 30 rows in (n desc, pair) order with positive counts") {
    val rows = graft.operators.TextAnalysis.queries("text_bpe_pairs")(spark, sfDir)
      .collect()
    assert(rows.length === 30)
    val ns = rows.map(_.getLong(2))
    assert(ns.forall(_ > 0))
    assert(ns.sameElements(ns.sortBy(-_)), "rows must be sorted by n desc")
  }
}
