package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The remaining TPC-H shapes (TpchRest): semantic invariants the DuckDB
  * oracle can't state directly, plus the plan properties that make each
  * shape survive 100 TB (pushdown, broadcast-vs-shuffle choices, stage
  * reuse for the double-rollup).
  */
class TpchRestSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  /** formatted explain — toString truncates long PushedFilters lists. */
  private def formatted(name: String): String =
    run(name).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6: every predicate reaches the cache scan; read pruned to 4 columns") {
    // r18: q6 reads the family-window shared lineitem persist; the
    // predicates must reach the InMemoryTableScan (batch-stat pruning)
    // and the cache read must carry only the 4 consumed columns.
    val p = formatted("q6_forecast_revenue")
    val scanArgs = p.linesIterator
      .filter(_.startsWith("Arguments: ["))
      .find(_.contains("l_shipdate")).getOrElse("")
    assert(scanArgs.contains("l_shipdate") && scanArgs.contains("1996-01-01"),
      s"shipdate bound must reach the cache scan:\n$p")
    assert(scanArgs.contains("l_discount") && scanArgs.contains("0.02"), scanArgs)
    assert(scanArgs.contains("l_quantity") && scanArgs.contains("24"), scanArgs)
    val out = p.linesIterator.find(l => l.startsWith("Output [4]") &&
      l.contains("l_shipdate")).getOrElse("")
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .forall(out.contains), s"cache read must prune to 4 columns:\n$p")
    assert(!p.contains("Join"), s"q6 must be a pure scan+agg:\n$p")
  }

  test("q2: each surviving row carries its part's minimum cost (ties preserved)") {
    val rows = run("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getLong(0))
    byPart.values.foreach { g =>
      val costs = g.map(_.getDouble(2)).distinct
      assert(costs.length === 1, s"mixed costs within a part: ${g.mkString(",")}")
    }
  }

  test("q2: fact joins broadcast the filtered part and EUROPE supplier dims") {
    val p = formatted("q2_min_cost_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("EqualTo(p_type,PROMO)"), p)
  }

  test("q13: LEFT OUTER preserves every customer (histogram sums to customer count)") {
    val hist = run("q13_order_distribution").collect()
    val nCust = graft.sources.Tables.customer(spark, sfDir).count()
    assert(hist.map(_.getLong(1)).sum === nCust)
  }

  test("q15: all emitted suppliers tie at the window maximum") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length === 1)
  }

  test("q18: HAVING bound holds and top-k is bounded") {
    val rows = run("q18_large_volume").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getDouble(5) > 250.0))
    val p = run("q18_large_volume").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
  }

  test("q21: one fact pass, one fact exchange (window rollup, r18)") {
    // r18 shape: per-order stats are a WINDOW over the per-(order,
    // supplier) rollup, partitioned by the key the rollup was
    // repartitioned on — so the fact relation appears ONCE and crosses
    // ONE l_orderkey exchange; no (l_orderkey, l_suppkey) shuffle and
    // no second rollup joined back may ever reappear.
    val df = run("q21_sole_fault_supplier")
    df.collect() // materialize so AQE finalizes stages
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert(finalPlan.contains("Window"), finalPlan)
    assert(!"hashpartitioning\\(l_orderkey#\\d+L, l_suppkey".r
      .findFirstIn(finalPlan).isDefined,
      s"rollup must reuse the l_orderkey partitioning, not reshuffle on the pair:\n$finalPlan")
    val factReads = "InMemoryTableScan \\[l_orderkey".r.findAllIn(finalPlan).length
    assert(factReads == 1,
      s"expected ONE lineitem pass in the final plan, got $factReads:\n$finalPlan")
  }

  test("q21: sole-fault semantics — every counted supplier is the only R in a multi-supplier order") {
    // recompute the invariant independently of the query's own rollup
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val perSupp = li.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
    val stats = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("has_r").as("nr"))
    val expected = perSupp.join(stats, "l_orderkey")
      .filter(col("has_r") === 1 && col("ns") >= 2 && col("nr") === 1)
      .count()
    val total = run("q21_sole_fault_supplier")
      .agg(sum("numwait")).collect()(0).getLong(0)
    // top-20 cut can only drop rows, never add
    assert(total <= expected && total > 0, s"total=$total expected<=$expected")
  }

  test("q12: high + low line counts partition the joined window exactly") {
    val rows = run("q12_priority_class").collect()
    val sumBoth = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(sumBoth === expected)
  }

  test("q22: threshold is the positive-balance average; anti-join drops urgent customers") {
    val rows = run("q22_idle_balances").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum > 0)
    val p = run("q22_idle_balances").queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"urgent exclusion must be an anti join:\n$p")
  }

  test("q17: correlated-avg decorrelation leaves the threshold join co-keyed or broadcast") {
    val rows = run("q17_small_qty_revenue").collect()
    assert(rows.length === 1 && rows(0).getDouble(0) > 0)
    // the decorrelated threshold join must be an equi hash/merge join —
    // never a nested loop (the shape a correlated rewrite can degrade to)
    val p = formatted("q17_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q20: nested semi-join chain plans LEFT SEMI, never a full join of supplier") {
    val df = run("q20_excess_suppliers")
    assert(df.count() > 0)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"expected semi joins:\n$p")
  }

  test("q16: anti-joined low-balance suppliers never appear in any class count") {
    // enforce the exclusion, not just non-emptiness: the total distinct
    // supplier count across classes WITH the anti join must be strictly
    // below the same rollup WITHOUT it (deleting the left_anti from the
    // query makes these equal and fails here), and the exclusion must be
    // non-vacuous on pairs that actually reach a surviving part class.
    val bad = graft.sources.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 1000).select("s_suppkey")
    val pt = graft.sources.Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size") <= 25).select("p_partkey")
    val pairs = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(pt, col("l_partkey") === col("p_partkey"), "left_semi")
    val excludedPairs = pairs
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    assert(excludedPairs > 0, "exclusion must be non-vacuous at this SF")
    val withExclusion = run("q16_supplier_diversity")
      .agg(sum("supplier_cnt")).collect()(0).getLong(0)
    val withoutExclusion = pairs
      .join(graft.sources.Tables.part(spark, sfDir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size") <= 25).select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(withExclusion < withoutExclusion,
      s"anti join must remove suppliers: $withExclusion !< $withoutExclusion")
  }
}
