package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph dataflow over the customer↔supplier bipartite graph
  * (an edge = "this customer ordered from this supplier", i.e. a distinct
  * `(o_custkey, l_suppkey)` pair through orders ⋈ lineitem).
  *
  * Two classic at-scale iterative algorithms plus the degree profile:
  *
  *  - `graph_pagerank` — damped PageRank, the canonical "repeat a join
  *    until it converges" workload.
  *  - `graph_bfs_hops`  — BFS frontier expansion from a seed node
  *    (supply-chain distance), the other canonical shape: a monotone
  *    min-aggregation fixpoint.
  *  - `graph_degrees`   — degree histogram per node class.
  *
  * Scale design (the Pregel layout, re-expressed declaratively):
  *  - The edge relation is built ONCE, hash-partitioned by `src`, and
  *    persisted; every iteration joins the per-node state against the
  *    stationary edges. Verified on the executed (adaptive) plan: AQE
  *    plans each iteration as a broadcast of the rank state into the
  *    cached edge partitions — the edges never move, and the only
  *    per-iteration shuffle is the message aggregation by `dst`. With a
  *    node state too large to broadcast the join degrades to a shuffle
  *    join co-keyed on `src` (the state side moves, the cached layout
  *    still bounds the edge side). At 100 TB the edge build is one
  *    orders⋈lineitem shuffle (both sides keyed by orderkey) + a
  *    distinct; iterations touch no base table again.
  *  - All rank/distance arithmetic is 64-bit INTEGER (rank mass in units
  *    of 1e-12, floor division for contribution splits and damping).
  *    Integer sums are associative-commutative — the result is
  *    bit-identical no matter the partitioning, task order, or engine —
  *    so the DuckDB oracle runs the IDENTICAL algorithm (`//` and Spark's
  *    `div` agree: both truncate, and every operand here is positive).
  *    Float PageRank would diverge between engines in the last ulp;
  *    integer PageRank cannot.
  *  - Overflow bound: total rank mass is conserved at nodes·R0 minus
  *    floor losses, so a node's incoming sum < nodes·R0 ≈ 1.6e16 at
  *    sf0.1; 85·that ≈ 1.4e18 < 2^63. Rescale R0 if node counts pass
  *    ~1e6 per rank unit budget.
  */
object Graph {

  private val R0 = 1000000000000L // initial rank mass per node (1e12)
  private val JUMP = 15L * R0 / 100 // damping teleport share (exact)
  private val ITERS = 3
  private val BFS_ROUNDS = 4
  private val KCORE_K = 3
  private val KCORE_ROUNDS = 6
  private val SEED = "c1" // customer key 1 exists at every SF

  /** Butterfly counting degeneracy guard: customers with more than this
    * many distinct suppliers are excluded from the pair expansion. A
    * single degree-D hub contributes C(D,2) wedges — quadratic — so
    * every practical bipartite motif counter caps or samples hub
    * vertices; the cap makes the bound explicit and DETERMINISTIC (the
    * oracle applies the identical HAVING filter), instead of an
    * OOM-at-scale surprise. At TPC-H shape the customer→supplier degree
    * is ~40, so the cap bites only the hub tail.
    */
  private val WEDGE_CAP = 64

  /** Edge relation with out-degree attached: (src, dst, d) — both
    * directions of each customer↔supplier pair, so the random walk is
    * symmetric and every node has in-edges (no dangling-mass special
    * case). Partitioned by `src` once and persisted: the iteration joins
    * probe this stationary relation.
    */
  private def edgesWithDeg(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.ordersShared(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitemShared(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c_node"),
        concat(lit("s"), col("l_suppkey")).as("s_node"))
      .distinct()
    val e = pairs.select(col("c_node").as("src"), col("s_node").as("dst"))
      .union(pairs.select(col("s_node").as("src"), col("c_node").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    e.join(deg, "src")
      .repartition(s.sparkContext.defaultParallelism, col("src"))
      .transform(graft.CachePool.persist)
  }

  /** Common-customer count per supplier pair over the degree-capped
    * bipartite graph — the wedge relation every bipartite motif /
    * co-occurrence analysis is built from. Pairs are generated from
    * per-customer SORTED supplier arrays (one groupBy on the natural
    * key, per-row expansion bounded by C(WEDGE_CAP,2)), not an
    * edge×edge self-join — so the candidate relation is O(customers ·
    * cap²) with no join-key skew, and the only shuffles are the two
    * hash aggregations. Persisted via CachePool: `graph_butterflies`
    * and `graph_supplier_overlap` run back-to-back in Bench/Verify and
    * share one evaluation (identical analyzed plans hit the
    * CacheManager).
    */
  private def keptCustSup(s: SparkSession, d: String): DataFrame = {
    val cs = Tables.ordersShared(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitemShared(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("sup"))
      .distinct()
    // Degree pre-filter BEFORE collect_set: a window count over the same
    // hash partitioning the groupBy needs (one shuffle total, reused by
    // EnsureRequirements) drops hub customers before any array is
    // materialized — so the aggregation buffer is bounded by WEDGE_CAP,
    // not by the hub's true degree. (A post-collect size filter bounded
    // the pair EXPANSION but still built the full hub array per row.)
    import org.apache.spark.sql.expressions.Window
    cs.withColumn("deg", count(lit(1)).over(Window.partitionBy("cust")))
      .filter(col("deg").between(2, WEDGE_CAP))
      .select("cust", "sup")
      .transform(graft.CachePool.persist)
  }

  private def supplierPairCounts(s: SparkSession, d: String): DataFrame = {
    keptCustSup(s, d)
      .groupBy("cust")
      .agg(sort_array(collect_set(col("sup"))).as("sups"))
      .select(explode(flatten(transform(col("sups"), (x, i) =>
        transform(slice(col("sups"), i + lit(2), size(col("sups"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("sup_a"), col("p.b").as("sup_b"))
      .agg(count(lit(1)).as("n_common"))
      .transform(graft.CachePool.persist)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Damped PageRank, ITERS unrolled rounds. Each round: contribution
    // split rank/degree per edge (integer floor), message sum per dst,
    // damping as (JUMP + 85·sum div 100). The undirected construction
    // guarantees every node receives messages each round, so the state
    // relation never shrinks or grows.
    "graph_pagerank" -> ((s, d) => {
      val ed = edgesWithDeg(s, d)
      var rank = ed.select(col("src").as("node")).distinct()
        .withColumn("rank_units", lit(R0))
      for (_ <- 1 to ITERS) {
        rank = ed.join(rank, ed("src") === rank("node"))
          .select(col("dst"), expr("rank_units div d").as("contrib"))
          .groupBy("dst")
          .agg(sum("contrib").as("m"))
          .select(col("dst").as("node"),
            (lit(JUMP) + expr("(85 * m) div 100")).as("rank_units"))
      }
      rank
    }),

    // k-CORE decomposition (k = 3) by synchronized peeling: each round
    // recomputes within-live degrees and drops nodes below k; the
    // fixed KCORE_ROUNDS unroll is the oracle-able form of the
    // loop-until-fixpoint a production run uses (the pagerank ITERS /
    // BFS_ROUNDS convention — identical rounds on both engines, so
    // convergence is not assumed anywhere; the min_core_degree output
    // column is the self-evidencing check: ≥ k iff the peel reached
    // its fixpoint, and GraphSpec asserts it at the test SFs). Per
    // round: two hash joins against the persisted edge relation + one
    // aggregation; each round's survivor set is persisted because the
    // next round references it twice (src probe + dst probe) — the
    // BFS doubling argument. The report is O(node types) rows.
    "graph_kcore" -> ((s, d) => {
      val e = edgesWithDeg(s, d).select("src", "dst")
      var live = graft.CachePool.persist(
        e.select(col("src").as("node")).distinct())
      val total = live.groupBy(substring(col("node"), 1, 1).as("node_type"))
        .agg(count(lit(1)).as("n_nodes"))
      // early exit ON COUNT STABILITY is exactly oracle-equal: the
      // peel only ever REMOVES nodes, so equal counts ⇒ equal sets ⇒
      // every remaining unrolled round is the identity. The count is
      // one action per round against the already-persisted survivor
      // set — at sf0.1 this converges in 2 rounds, not 6.
      var prevCount = -1L
      var round = 0
      while (round < KCORE_ROUNDS && live.count() != prevCount) {
        prevCount = live.count() // cached: the persisted set, no recompute
        val dg = e
          .join(live.select(col("node").as("src")), "src")
          .join(live.select(col("node").as("dst")), "dst")
          .groupBy("src").agg(count(lit(1)).as("dg"))
        live = graft.CachePool.persist(
          dg.filter(col("dg") >= KCORE_K).select(col("src").as("node")))
        round += 1
      }
      val coreDeg = e
        .join(live.select(col("node").as("src")), "src")
        .join(live.select(col("node").as("dst")), "dst")
        .groupBy("src").agg(count(lit(1)).as("dg"))
      val coreStats = coreDeg
        .groupBy(substring(col("src"), 1, 1).as("node_type"))
        .agg(count(lit(1)).as("n_in_core"),
          min("dg").as("min_core_degree"))
      total.join(coreStats, Seq("node_type"), "left")
        .select(col("node_type"), col("n_nodes"),
          coalesce(col("n_in_core"), lit(0L)).as("n_in_core"),
          col("min_core_degree"))
    }),

    // BFS frontier expansion from SEED: dist = min over (current dist,
    // neighbor dist + 1), BFS_ROUNDS rounds — nodes discovered in round
    // k keep distance k forever (min is monotone), so the unrolled form
    // equals true BFS up to depth BFS_ROUNDS. Output: nodes per distance.
    // Each round's state is persisted: the round-k plan references
    // round k-1 TWICE (union branch + join probe), so an unpersisted
    // chain doubles per round — 2^BFS_ROUNDS evaluations of the base
    // (measured 6.8 s vs 1 s at sf0.1). The cache makes each round
    // compute once; entries are O(nodes) rows and released with the
    // family's CachePool batch.
    "graph_bfs_hops" -> ((s, d) => {
      import s.implicits._
      val ed = edgesWithDeg(s, d)
      var dist = Seq((SEED, 0L)).toDF("node", "dist")
      for (_ <- 1 to BFS_ROUNDS) {
        dist = graft.CachePool.persist(
          dist.union(
              dist.join(ed, dist("node") === ed("src"))
                .select(col("dst").as("node"), (col("dist") + 1L).as("dist")))
            .groupBy("node").agg(min("dist").as("dist")))
      }
      dist.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
    }),

    // Degree histogram per node class ('c' customers / 's' suppliers):
    // the standard first look at any graph's skew (a power-law tail here
    // means the pagerank message aggregation needs salting at scale).
    // Degree assortativity: the Pearson correlation of endpoint degrees
    // across edges — does the hub-customer shop from hub-suppliers
    // (r > 0) or from the long tail (r < 0)? The mixing-pattern summary
    // that predicts how the graph fragments under node loss. One join
    // of the cached edge relation against the O(nodes) degree table on
    // the destination endpoint, then a single global aggregation of
    // integer power sums (the agg_corr_stats construction; DuckDB side
    // converts via the exact decimal string) — no iteration, and the
    // edge relation is the one edgesWithDeg already pinned.
    "graph_assortativity" -> ((s, d) => {
      val e = edgesWithDeg(s, d)
      val deg = e.select(col("src"), col("d")).distinct()
      val both = e.select(col("dst"), col("d").as("dx"))
        .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("d", "dy"),
          "dst")
      def pd(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,0)")).cast("double")
      both
        .agg(count(lit(1)).cast("double").as("n"),
          pd(col("dx")).as("sx"), pd(col("dy")).as("sy"),
          pd(col("dx") * col("dy")).as("sxy"),
          pd(col("dx") * col("dx")).as("sxx"),
          pd(col("dy") * col("dy")).as("syy"))
        .select(col("n").cast("long").as("n_edges"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("assortativity"))
    }),

    "graph_degrees" -> ((s, d) => {
      edgesWithDeg(s, d)
        .select(col("src"), col("d")).distinct()
        .groupBy(substring(col("src"), 1, 1).as("node_type"),
          col("d").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
    }),

    // Bipartite clustering census. A bipartite graph has NO triangles
    // (odd cycles are impossible), so its clustering primitive is the
    // BUTTERFLY — the 4-cycle (c1,s1,c2,s2) — counted as Σ C(w,2) over
    // supplier pairs with w common customers. One row: pairs with ≥1
    // shared customer, wedges (Σw), butterflies. All integer — engine-
    // exact; w·(w−1) is even so `div 2` loses nothing. Overflow: w ≤
    // customers, so C(w,2) < 2^63 needs w < 4.3e9 — never binding.
    "graph_butterflies" -> ((s, d) => {
      supplierPairCounts(s, d).agg(
        count(lit(1)).as("n_pairs"),
        sum("n_common").as("n_wedges"),
        sum(expr("n_common * (n_common - 1) div 2")).as("n_butterflies"))
    }),

    // Co-purchase similarity: the 15 supplier pairs sharing the most
    // customers — the one-mode projection ranking behind "suppliers like
    // this one". Fully ordered ties; reuses the persisted wedge relation.
    "graph_supplier_overlap" -> ((s, d) => {
      supplierPairCounts(s, d)
        .orderBy(col("n_common").desc, col("sup_a"), col("sup_b"))
        .limit(15)
    }),

    // Link prediction by Jaccard coefficient over the one-mode supplier
    // projection: score(a,b) = |cust(a) ∩ cust(b)| / |cust(a) ∪ cust(b)|
    // — the classic unsupervised "which co-purchase edges are missing"
    // ranking. Candidates = the wedge relation (pairs already sharing a
    // customer; pairs with zero overlap score 0 and cannot rank), so
    // the search space is Σ C(deg,2) from the capped expansion — never
    // a supplier×supplier cross. Degrees come from ONE extra hash agg
    // on the persisted kept relation and broadcast into the pair rows
    // (O(suppliers) each side). All counts integer; the single double
    // division is one IEEE op mirrored verbatim in the oracle, and the
    // (jaccard, sup_a, sup_b) ordering is total so top-20 is engine-
    // deterministic. Reuses the same cached wedge + kept relations the
    // butterfly/overlap queries pin — zero extra base-table scans when
    // the family runs together.
    "graph_link_prediction" -> ((s, d) => {
      val deg = keptCustSup(s, d).groupBy("sup").agg(count(lit(1)).as("dg"))
      supplierPairCounts(s, d)
        .join(broadcast(deg.select(col("sup").as("sup_a"), col("dg").as("deg_a"))), "sup_a")
        .join(broadcast(deg.select(col("sup").as("sup_b"), col("dg").as("deg_b"))), "sup_b")
        .select(col("sup_a"), col("sup_b"), col("n_common"),
          col("deg_a"), col("deg_b"),
          (col("n_common").cast("double") /
            (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("sup_a"), col("sup_b"))
        .limit(20)
    })
  )

  /** Shared oracle prefix: the identical edge construction. */
  private val edgesSql =
    """pairs AS (SELECT DISTINCT 'c' || o_custkey AS c_node, 's' || l_suppkey AS s_node
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (SELECT c_node AS src, s_node AS dst FROM pairs
      |  UNION ALL SELECT s_node, c_node FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
      |ed AS (SELECT e.src, e.dst, dg.d FROM edges e JOIN deg dg USING (src))""".stripMargin

  private lazy val pagerankSql: String = {
    val sb = new StringBuilder(
      s"""WITH $edgesSql,
         |r0 AS (SELECT src AS node, CAST($R0 AS BIGINT) AS rank_units FROM deg)""".stripMargin)
    for (i <- 1 to ITERS) {
      sb.append(s""",
         |r$i AS (SELECT ed.dst AS node,
         |    CAST($JUMP + (85 * SUM(r.rank_units // ed.d)) // 100 AS BIGINT) AS rank_units
         |  FROM ed JOIN r${i - 1} r ON ed.src = r.node GROUP BY ed.dst)""".stripMargin)
    }
    sb.append(s"\nSELECT node, rank_units FROM r$ITERS")
    sb.toString
  }

  private lazy val bfsSql: String = {
    val sb = new StringBuilder(
      s"""WITH $edgesSql,
         |d0 AS (SELECT '$SEED' AS node, CAST(0 AS BIGINT) AS dist)""".stripMargin)
    for (i <- 1 to BFS_ROUNDS) {
      sb.append(s""",
         |d$i AS (SELECT node, MIN(dist) AS dist FROM (
         |  SELECT node, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT ed.dst, p.dist + 1 FROM d${i - 1} p JOIN ed ON p.node = ed.src) t
         |  GROUP BY node)""".stripMargin)
    }
    sb.append(s"\nSELECT dist, COUNT(*) AS n_nodes FROM d$BFS_ROUNDS GROUP BY dist")
    sb.toString
  }

  /** Shared oracle CTE: the identical capped wedge relation, in the
    * equivalent self-join formulation (same algebraic identity as
    * Mining.basket_part_pairs' oracle).
    */
  private val wedgeSql =
    s"""cs AS (SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |kept AS (SELECT cust, sup FROM cs
       |  WHERE cust IN (SELECT cust FROM cs GROUP BY cust
       |                 HAVING COUNT(*) BETWEEN 2 AND $WEDGE_CAP)),
       |pc AS (SELECT a.sup AS sup_a, b.sup AS sup_b, COUNT(*) AS n_common
       |  FROM kept a JOIN kept b ON a.cust = b.cust AND a.sup < b.sup
       |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "graph_bfs_hops" -> bfsSql,
    "graph_kcore" -> {
      val rounds = (0 until KCORE_ROUNDS).map { i =>
        s"""dg${i + 1} AS (SELECT e.src AS node, COUNT(*) AS dg FROM edges e
           |  JOIN live$i a ON e.src = a.node
           |  JOIN live$i b ON e.dst = b.node GROUP BY 1),
           |live${i + 1} AS (SELECT node FROM dg${i + 1} WHERE dg >= $KCORE_K)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $edgesSql,
         |live0 AS (SELECT DISTINCT src AS node FROM edges),
         |$rounds,
         |tot AS (SELECT substr(node, 1, 1) AS node_type, COUNT(*) AS n_nodes
         |  FROM live0 GROUP BY 1),
         |cd AS (SELECT e.src AS node, COUNT(*) AS dg FROM edges e
         |  JOIN live$KCORE_ROUNDS a ON e.src = a.node
         |  JOIN live$KCORE_ROUNDS b ON e.dst = b.node GROUP BY 1),
         |cs AS (SELECT substr(node, 1, 1) AS node_type,
         |    COUNT(*) AS n_in_core, MIN(dg) AS min_core_degree
         |  FROM cd GROUP BY 1)
         |SELECT t.node_type, n_nodes,
         |  COALESCE(n_in_core, 0) AS n_in_core, min_core_degree
         |FROM tot t LEFT JOIN cs USING (node_type)""".stripMargin
    },
    "graph_butterflies" ->
      s"""WITH $wedgeSql
         |SELECT COUNT(*) AS n_pairs,
         |  CAST(SUM(n_common) AS BIGINT) AS n_wedges,
         |  CAST(SUM(n_common * (n_common - 1) // 2) AS BIGINT) AS n_butterflies
         |FROM pc""".stripMargin,
    "graph_supplier_overlap" ->
      s"""WITH $wedgeSql
         |SELECT sup_a, sup_b, n_common FROM pc
         |ORDER BY n_common DESC, sup_a, sup_b LIMIT 15""".stripMargin,
    "graph_link_prediction" ->
      s"""WITH $wedgeSql,
         |sd AS (SELECT sup, COUNT(*) AS dg FROM kept GROUP BY sup)
         |SELECT sup_a, sup_b, n_common, da.dg AS deg_a, db.dg AS deg_b,
         |  CAST(n_common AS DOUBLE) /
         |    CAST(da.dg + db.dg - n_common AS DOUBLE) AS jaccard
         |FROM pc JOIN sd da ON pc.sup_a = da.sup
         |        JOIN sd db ON pc.sup_b = db.sup
         |ORDER BY jaccard DESC, sup_a, sup_b LIMIT 20""".stripMargin,
    "graph_assortativity" ->
      s"""WITH $edgesSql,
         |b AS (SELECT ed.d AS dx, dg2.d AS dy
         |  FROM ed JOIN deg dg2 ON ed.dst = dg2.src),
         |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(CAST(SUM(dx) AS VARCHAR) AS DOUBLE) AS sx,
         |    CAST(CAST(SUM(dy) AS VARCHAR) AS DOUBLE) AS sy,
         |    CAST(CAST(SUM(dx * dy) AS VARCHAR) AS DOUBLE) AS sxy,
         |    CAST(CAST(SUM(dx * dx) AS VARCHAR) AS DOUBLE) AS sxx,
         |    CAST(CAST(SUM(dy * dy) AS VARCHAR) AS DOUBLE) AS syy
         |  FROM b)
         |SELECT CAST(n AS BIGINT) AS n_edges,
         |  (n * sxy - sx * sy) /
         |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         |    AS assortativity
         |FROM s""".stripMargin,
    "graph_degrees" ->
      s"""WITH $edgesSql
         |SELECT substr(src, 1, 1) AS node_type, d AS degree, COUNT(*) AS n_nodes
         |FROM (SELECT DISTINCT src, d FROM ed) t GROUP BY 1, 2""".stripMargin
  )
}
