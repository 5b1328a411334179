package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the iterative-graph and layout operators —
  * properties the DuckDB oracle's value-equality cannot express:
  * conservation laws, monotonicity, and the structural guarantees the
  * scaladocs claim.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("pagerank conserves rank mass up to floor losses") {
    val rank = q("graph_pagerank")
    val n = rank.count()
    val total = rank.agg(sum("rank_units")).head.getLong(0)
    val exact = n * 1000000000000L
    assert(total <= exact, "integer floors can only LOSE mass")
    // each contribution floor loses < deg units per node per round, each
    // damping floor < 100; 3 rounds over this graph lose ≪ 0.1%
    assert(total > (exact * 999L) / 1000L,
      s"mass leak too large: $total of $exact")
  }

  test("pagerank keeps every node and assigns positive rank") {
    val rank = q("graph_pagerank")
    val degrees = q("graph_degrees")
    val nodes = degrees.agg(sum("n_nodes")).head.getLong(0)
    assert(rank.count() === nodes, "iteration dropped or invented nodes")
    assert(rank.filter(col("rank_units") <= 0).count() === 0)
  }

  test("bfs frontier: one seed at dist 0, neighbors of the seed at 1") {
    val hops = q("graph_bfs_hops").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops(0L) === 1L, "exactly the seed at distance 0")
    assert(hops.getOrElse(1L, 0L) > 0, "seed has at least one neighbor")
    // bipartite: odd distances are suppliers, even are customers — the
    // seed's 1-hop count can never exceed the supplier population
    val rank = q("graph_degrees").filter(col("node_type") === "s")
      .agg(sum("n_nodes")).head.getLong(0)
    assert(hops(1L) <= rank)
  }

  test("kcore peel reaches its fixpoint: every surviving node keeps degree >= k") {
    // the scaladoc's self-evidencing check: min within-core degree >= 3
    // iff the fixed-round peel converged at this SF (a non-converged
    // unroll would leave a node below k in the final survivor set)
    val rows = q("graph_kcore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nNodes, nCore) = (r.getLong(1), r.getLong(2))
      assert(nCore <= nNodes)
      if (nCore > 0)
        assert(r.getLong(3) >= 3L,
          s"type ${r.getString(0)}: core min degree ${r.getLong(3)} < k")
    }
  }

  test("zorder buckets are range-tight on BOTH dimensions") {
    val b = q("layout_zorder").collect()
    val (maxPk, maxSk) = (b.map(_.getLong(3)).max, b.map(_.getLong(5)).max)
    // 64 buckets = 8×8 grid: each bucket must span ≤ ~1/8 of each key
    // range (+1 cell slack for the integer normalization boundary)
    b.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= maxPk / 8 + maxPk / 256 + 1,
        s"bucket ${r.getLong(0)} spans too much of partkey")
      assert(r.getLong(5) - r.getLong(4) <= maxSk / 8 + maxSk / 256 + 1,
        s"bucket ${r.getLong(0)} spans too much of suppkey")
    }
  }

  test("range splits tile the key space: disjoint, contiguous, exactly counted") {
    val t = q("layout_range_split").orderBy("split_id").collect()
    // sampled boundaries: split COUNT is data-dependent (≤ SPLITS) but
    // the tiling itself is exact — disjoint ranges, no key lost
    assert(t.length >= 5 && t.length <= 32, s"got ${t.length} splits")
    t.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1), "tiles must not overlap")
      case _ => ()
    }
    t.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "lo must not exceed hi")
      assert(r.getLong(3) >= 1L, "every emitted split holds at least one key")
    }
    val distinctKeys = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    assert(t.map(_.getLong(3)).sum === distinctKeys,
      "split counts must partition the distinct key space exactly")
  }

  test("pagerank iterations read the persisted edges, not the base tables") {
    val plan = q("graph_pagerank").queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "edge relation must come from the cache on every iteration")
  }

  test("chunk windows cover every token and agree with text_tokens") {
    val chunks = q("text_chunk_windows")
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_start").as("last_start"),
        sum("n_chunk_tokens").as("covered"))
    val toks = q("text_tokens").select(col("doc_id"), col("n_tokens_ws"))
    val joined = perDoc.join(toks, "doc_id")
    // starts are 0,48,…,≤n-1 ⇒ n_chunks = floor((n-1)/48)+1; the final
    // chunk reaches the end ⇒ coverage (with overlap) ≥ n
    assert(joined.filter(
      col("n_chunks") =!= expr("((n_tokens_ws - 1) div 48) + 1") ||
      col("covered") < col("n_tokens_ws")).count() === 0)
  }

  test("fuzzy blocking finds every distance-1 pair and nothing farther") {
    val out = q("join_fuzzy_block").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // names are dense sequential ids: Customer#…000 and Customer#…001
    // differ in one digit — the canonical distance-1 pair must be found
    assert(out.contains("Customer#000000000"), "distance-1 neighbor missed")
    // and every reported nearest really is at distance ≤ 1 of its name
    out.foreach { case (a, b) =>
      val d = a.zip(b).count { case (x, y) => x != y }
      assert(a.length == b.length && d <= 1, s"$a -> $b is distance $d")
    }
  }

  test("fuzzy blocking at radius 2 equals the brute-force pair set") {
    // the pigeonhole claim in the query comment, checked literally:
    // UNTAGGED depth-1/-2 deletion keys must surface EVERY pair at
    // levenshtein ≤ 2 — including the shift pairs (one insert + one
    // delete at different positions) that the position-tagged
    // distance-1 scheme structurally cannot see
    val names = sources.Tables.customer(spark, sfDir)
      .select("c_name").collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    // reconstruct the blocked query's accepted pair set from its report
    val out = q("join_fuzzy_block2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val bruteCounts = brute.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(out === bruteCounts,
      "per-name near counts must equal brute force exactly (recall 1.0)")
    // and the shift class really occurs in the corpus (the test has
    // teeth): some brute pair is NOT within Hamming distance 2
    assert(brute.exists { case (a, b) =>
      a.zip(b).count { case (x, y) => x != y } > 2
    }, "corpus must contain an insert+delete (shift) pair at radius 2")
  }

  test("spine resample emits explicit zero rows for gap days") {
    val sp = q("events_resample_daily")
    // every user's span is dense: (hi - lo).days + 1 rows, no holes
    val spans = sp.groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        min("day").as("lo"), max("day").as("hi"),
        sum(when(col("n_events") === 0, 1).otherwise(0)).as("n_gap_days"))
      .withColumn("expected", expr("datediff(hi, lo) + 1"))
    assert(spans.filter(col("n_rows") =!= col("expected")).count() === 0,
      "spine must be dense over each user's active span")
    // gap rows carry exactly zero activity
    assert(sp.filter(col("n_events") === 0 && col("total_value") =!= 0.0)
      .count() === 0)
  }

  test("retention matrix: offset-0 cell equals each cohort's size") {
    val m = q("events_retention")
    val zero = m.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("at0"))
    val ev = sources.Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
    val cohortSize = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("n"))
    assert(zero.join(cohortSize, "cohort_week")
      .filter(col("at0") =!= col("n")).count() === 0,
      "every user is active in their own cohort week by definition")
  }

  test("assortativity is a valid correlation and matches the builtin corr over edge degree pairs") {
    val r = graft.operators.Graph
      .queries("graph_assortativity")(spark, sfDir).collect()(0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"assortativity $a")
    // independent formulation: Spark's builtin corr over the same
    // directed edge degree pairs (tolerance — different update order)
    val pairs = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c_node"),
        concat(lit("s"), col("l_suppkey")).as("s_node"))
      .distinct()
    val e = pairs.select(col("c_node").as("src"), col("s_node").as("dst"))
      .union(pairs.select(col("s_node").as("src"), col("c_node").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val both = e.join(deg, "src").withColumnRenamed("d", "dx")
      .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("d", "dy"),
        "dst")
    val want = both.agg(corr(col("dx").cast("double"),
      col("dy").cast("double"))).collect()(0).getDouble(0)
    assert(math.abs(a - want) < 1e-9, s"power-sum $a vs builtin $want")
    assert(r.getAs[Long]("n_edges") === both.count())
  }
}
