package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second relational wave: as-of join, point-in-time state, grouping
  * sets, pivot, ranking-window family, array/null scalar ops, lateral
  * explode, and approximate distinct.
  *
  * The as-of join uses the union-window pattern — tag both sides, one
  * shuffle+sort per key, carry the last left-side id forward — which is
  * THE scalable form (a single exchange; no per-row range probe, no
  * broadcast of either side needed at 100 TB).
  */
object RelationalExt {

  /** Per-step conversion window of the sequential funnel: 48 h in
    * exact microseconds, shared with the oracle SQL.
    */
  private val FUNNEL_WINDOW_US = 48L * 3600L * 1000000L

  /** Mergeable quantile sketch (DataSketches KLL) as a typed Aggregator:
    * the quantile analog of the HLL rollup — per-group sketches are
    * FIXED BYTES that re-aggregate by merging, so a second-level
    * percentile touches O(groups) sketches instead of rescanning rows
    * (Spark's built-in approx_percentile yields final numbers, which
    * cannot be re-merged). The buffer stays a live heap sketch object
    * (kryo only on spill/exchange); update/merge are the sketch's own
    * O(1)-amortized ops. k=400 ⇒ one-sided normalized rank error well
    * under 1%, so the ±2.5% exact-rank bracket asserted by the query is
    * a many-sigma contract, robust to KLL's internal (unseeded) random
    * compaction bits — which is also why the ESTIMATE never appears in
    * the output, only the bound verdict (the CMS/HLL convention).
    */
  private[graft] class KllAgg extends org.apache.spark.sql.expressions.Aggregator[
      Double, org.apache.datasketches.kll.KllDoublesSketch, Array[Byte]] {
    import org.apache.datasketches.kll.KllDoublesSketch
    def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(400)
    def reduce(b: KllDoublesSketch, x: Double): KllDoublesSketch = {
      b.update(x); b
    }
    def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[KllDoublesSketch]
    def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  /** Merge-only second level: unions serialized group sketches. */
  private[graft] class KllMergeAgg extends org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], org.apache.datasketches.kll.KllDoublesSketch, Array[Byte]] {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(400)
    def reduce(b: KllDoublesSketch, x: Array[Byte]): KllDoublesSketch = {
      b.merge(KllDoublesSketch.heapify(Memory.wrap(x))); b
    }
    def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[KllDoublesSketch]
    def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  private lazy val kllP50 = udf((b: Array[Byte]) =>
    org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(b))
      .getQuantile(0.5))

  /** Theta sketch nominal entries: k=256 puts every test SF except the
    * smallest into ESTIMATION mode (13k-key sets vs k=256 retained), so
    * the asserted bound exercises the sketch theorem, not exact-mode
    * trivia. RSE ≈ 1/√k = 6.25%; the asserted tolerance is 25% of the
    * exact union (4σ) — deterministic given the library's fixed default
    * seed, so bound_ok is a stable engine-checkable verdict.
    */
  private[graft] val THETA_NOM = 256

  /** Mergeable distinct-count SET ALGEBRA (DataSketches theta): unlike
    * HLL (union-only), theta sketches support intersection and
    * difference — at 100 TB, |A∩B| of two billion-key sets costs two
    * sketch scans plus O(k) driver math, replacing a distinct
    * shuffle-join. The buffer is a live heap Union (kryo only on
    * spill/exchange), the finished group sketch is fixed bytes.
    */
  private[graft] class ThetaAgg extends org.apache.spark.sql.expressions.Aggregator[
      Long, org.apache.datasketches.theta.Union, Array[Byte]] {
    import org.apache.datasketches.theta.{SetOperation, Union}
    def zero: Union =
      SetOperation.builder().setNominalEntries(THETA_NOM).buildUnion()
    def reduce(b: Union, x: Long): Union = { b.update(x); b }
    def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
    def finish(b: Union): Array[Byte] = b.getResult.toByteArray
    def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[org.apache.datasketches.theta.Union]
    def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Mergeable-quantile rollup: per-returnflag KLL sketches of
    // extendedprice, re-aggregated by UNION into the global median —
    // second level touches O(groups) sketches, not O(rows). The oracle
    // checks the contract (estimate's exact rank within 0.5 ± 0.025,
    // i.e. bracketed by the exact p47.5/p52.5) plus the exact medians;
    // the sketch estimate itself is excluded from the output because
    // KLL compaction is internally randomized.
    "agg_kll_quantile_rollup" -> ((s, d) => {
      val kll = udaf(new KllAgg, org.apache.spark.sql.Encoders.scalaDouble)
      val kllMerge = udaf(new KllMergeAgg,
        org.apache.spark.sql.Encoders.BINARY)
      val li = Tables.lineitemShared(s, d)
      // ONE array-percentile buffer per group, not three scalar ones —
      // percentile() materializes every group value in its aggregation
      // buffer, so asking for the three ranks separately tripled the
      // dominant memory/sort cost of the query (measured 2.7 s → ~1 s
      // at sf0.1)
      val perFlag = li.groupBy("l_returnflag")
        .agg(kll(col("l_extendedprice")).as("sk"),
          expr("percentile(l_extendedprice, array(0.475D, 0.5D, 0.525D))")
            .as("ps"))
        .select(col("l_returnflag"), col("sk"),
          col("ps").getItem(1).as("exact_p50"),
          col("ps").getItem(0).as("lo"), col("ps").getItem(2).as("hi"))
        .transform(graft.CachePool.persist)
      val groups = perFlag.select(col("l_returnflag"), col("exact_p50"),
        (kllP50(col("sk")) >= col("lo") &&
          kllP50(col("sk")) <= col("hi")).as("bound_ok"))
      val globalExact = li
        .agg(expr("percentile(l_extendedprice, array(0.475D, 0.5D, 0.525D))")
          .as("ps"))
        .select(col("ps").getItem(1).as("exact_p50"),
          col("ps").getItem(0).as("lo"), col("ps").getItem(2).as("hi"))
      val union = perFlag.agg(kllMerge(col("sk")).as("sk"))
        .crossJoin(broadcast(globalExact))
        .select(lit("ALL").as("l_returnflag"), col("exact_p50"),
          (kllP50(col("sk")) >= col("lo") &&
            kllP50(col("sk")) <= col("hi")).as("bound_ok"))
      groups.unionByName(union)
    }),

    // Theta-sketch set algebra over two customer cohorts (URGENT vs
    // HIGH priority orderers): estimate |A∪B|, |A∩B|, |A\B| from two
    // fixed-size sketches — the set operations HLL cannot do. The
    // oracle-checked contract is the bound verdict (estimate within
    // 4σ = 25% of the exact union), not the estimate (CMS/HLL/KLL
    // convention). Exact counts come from ONE per-key flag aggregation
    // (no distinct self-joins); the two sketches are built in one
    // grouped pass over the same scan, and the set algebra itself is
    // O(k) on two collected ~2KB blobs — the whole point: at 10⁹ keys
    // per cohort the exact flag pass is the expensive thing this
    // replaces, and the sketches stay mergeable for rollups across
    // partitions/days.
    "agg_theta_set_ops" -> ((s, d) => {
      import org.apache.datasketches.theta.{SetOperation, Sketches}
      import org.apache.datasketches.memory.Memory
      val theta = udaf(new ThetaAgg, org.apache.spark.sql.Encoders.scalaLong)
      val o = Tables.ordersShared(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey"),
          (col("o_orderpriority") === "1-URGENT").as("is_a"))
        .transform(graft.CachePool.persist) // sketch pass + exact pass
      val sk = o.groupBy("is_a").agg(theta(col("o_custkey")).as("sk"))
        .collect().map(r => r.getBoolean(0) ->
          (Sketches.wrapSketch(Memory.wrap(r.getAs[Array[Byte]](1)))
            : org.apache.datasketches.theta.Sketch)).toMap
      val bld = SetOperation.builder().setNominalEntries(THETA_NOM)
      // an absent cohort (empty/truncated input) is an EMPTY set, not
      // an error — the same zero an empty sketch estimates
      def skOf(flag: Boolean) = sk.getOrElse(flag, bld.buildUnion().getResult)
      val (a, b) = (skOf(true), skOf(false))
      val u = bld.buildUnion()
      u.union(a); u.union(b)
      val estU = u.getResult.getEstimate
      val ix = bld.buildIntersection()
      ix.intersect(a); ix.intersect(b)
      val estI = ix.getResult.getEstimate
      val estD = bld.buildANotB().aNotB(a, b).getEstimate
      val exact = o.groupBy("o_custkey")
        .agg(max(when(col("is_a"), 1L).otherwise(0L)).as("fa"),
          max(when(!col("is_a"), 1L).otherwise(0L)).as("fb"))
        .agg(count(lit(1)).as("n_union"),
          sum(when(col("fa") === 1L && col("fb") === 1L, 1L).otherwise(0L))
            .as("n_intersect"),
          sum(when(col("fa") === 1L && col("fb") === 0L, 1L).otherwise(0L))
            .as("n_a_not_b"))
      exact.select(col("n_union").as("tol_base"), expr(
          "stack(3, 'union', n_union, 'intersect', n_intersect, " +
            "'a_not_b', n_a_not_b) as (set_op, n_exact)"))
        .withColumn("est",
          when(col("set_op") === "union", lit(estU))
            .when(col("set_op") === "intersect", lit(estI))
            .otherwise(lit(estD)))
        .select(col("set_op"), col("n_exact"),
          (abs(col("est") - col("n_exact").cast("double")) <=
            lit(0.25) * col("tol_base").cast("double")).as("bound_ok"))
    }),

    // AS-OF JOIN: for each purchase, the latest strictly-earlier click
    // of the same user. event_id is the total order (LSN analog), so
    // max(click_id) over the preceding frame IS the as-of match.
    "asof_click_purchase" -> ((s, d) => {
      val ec = Tables.eventsShared(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          when(col("event_type") === "click", col("event_id")).as("click_id"))
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ec.withColumn("last_click", max(col("click_id")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_click"))
    }),

    // NEAREST as-of join — the bidirectional tier pandas' merge_asof
    // (direction='nearest') ships and plain backward as-of cannot
    // express: per purchase, the click nearest in EVENT TIME in EITHER
    // direction, within a ±1 h tolerance, ties to the earlier side.
    // Same single user-partitioned window shuffle as the backward
    // variant — one preceding-frame max and one following-frame min
    // share it — then the pick is pure integer arithmetic on exact
    // microsecond gaps. No join at all, which is the 100 TB point: the
    // naive band-join candidate set is |purchases|×|clicks-in-band|,
    // this is one pass.
    "asof_nearest_click" -> ((s, d) => {
      val tolUs = 3600L * 1000000L
      val ec = Tables.eventsShared(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          when(col("event_type") === "click", unix_micros(col("ts")))
            .as("click_us"))
      val wb = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      ec.withColumn("prev_us", max(col("click_us")).over(wb))
        .withColumn("next_us", min(col("click_us")).over(wf))
        .filter(col("event_type") === "purchase")
        .withColumn("nearest_us",
          when(col("prev_us").isNotNull &&
            (col("next_us").isNull ||
              col("us") - col("prev_us") <= col("next_us") - col("us")),
            col("prev_us")).otherwise(col("next_us")))
        .withColumn("nearest_click_us",
          when(abs(col("nearest_us") - col("us")) <= tolUs, col("nearest_us")))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("purchase_us"), col("nearest_click_us"),
          (col("nearest_click_us") - col("us")).as("gap_us"))
    }),

    // Point-in-time (time travel): latest state per key as of LSN 5000.
    "cdc_state_asof" -> ((s, d) => {
      graft.pipeline.ChangeLog.latestState(
        Tables.eventsShared(s, d).filter(col("event_id") <= 5000),
        Seq("user_id"), "event_id")
        .select("user_id", "event_id", "event_type", "value")
    }),

    // Event funnel: per user, first occurrence of each stage and whether
    // the stages happened in order — conditional-min aggregation, one
    // shuffle regardless of funnel depth (no joins or self-unions).
    "events_funnel" -> ((s, d) => {
      def firstOf(t: String) =
        min(when(col("event_type") === t, col("event_id")))
      Tables.eventsShared(s, d)
        .groupBy("user_id")
        .agg(firstOf("signup").as("first_signup"),
          firstOf("click").as("first_click"),
          firstOf("purchase").as("first_purchase"))
        .withColumn("completed_funnel",
          coalesce(col("first_signup").isNotNull &&
            col("first_click") > col("first_signup") &&
            col("first_purchase") > col("first_click"), lit(false)))
    }),

    // Strict SEQUENTIAL funnel with a per-step conversion window — the
    // ordered-funnel semantics analytics platforms actually sell, which
    // events_funnel's loose first-of-each comparison only approximates
    // (a user whose first click predates their first signup still
    // converts if a LATER click follows the signup — the loose form
    // drops them; conversely a click years after signup shouldn't
    // count — the loose form keeps it). Anchoring is greedy and
    // documented: step 1 anchors at the FIRST signup; step 2 at the
    // first click strictly after it within [[FUNNEL_WINDOW_US]];
    // step 3 at the first purchase strictly after THAT click within
    // the same window. Event-TIME ordering (µs), ties excluded by the
    // strict > (deterministic). Expressed without self-joins: two
    // stacked cumulative conditional minima over ONE per-user
    // time-sorted window (the anchor visible at any row is exactly the
    // global anchor whenever one precedes it), then one conditional-
    // min hash agg on the same partitioning — one exchange total at
    // any funnel depth, the events_funnel scale story with the honest
    // semantics.
    "events_funnel_sequential" -> ((s, d) => {
      val T = FUNNEL_WINDOW_US
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val ev = Tables.eventsShared(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val clickQ = (c: Column) => col("event_type") === "click" &&
        c.isNotNull && col("us") > c && col("us") <= c + T
      val purchQ = (c: Column) => col("event_type") === "purchase" &&
        c.isNotNull && col("us") > c && col("us") <= c + T
      val p1 = ev.withColumn("ss",
        min(when(col("event_type") === "signup", col("us"))).over(w))
      val p2 = p1.withColumn("cq",
        min(when(clickQ(col("ss")), col("us"))).over(w))
      p2.groupBy("user_id").agg(
          min(when(col("event_type") === "signup", col("us")))
            .as("signup_us"),
          min(when(clickQ(col("ss")), col("us"))).as("click_us"),
          min(when(purchQ(col("cq")), col("us"))).as("purchase_us"))
        .withColumn("reached_step",
          (when(col("signup_us").isNotNull, 1).otherwise(0) +
            when(col("click_us").isNotNull, 1).otherwise(0) +
            when(col("purchase_us").isNotNull, 1).otherwise(0)).cast("int"))
    }),

    // Cohort retention: users grouped by first-activity week, counted
    // per week-offset of later activity — the activity-analytics matrix
    // behind every "wk N retention" dashboard. Two hash aggregations
    // (first-seen per user, then matrix cells) + one broadcast-sized
    // join back; week arithmetic is integer day math (datediff div 7),
    // exact on both engines.
    "events_retention" -> ((s, d) => {
      val ev = Tables.eventsShared(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(wk, cohort_week) div 7").as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
    }),

    // Join-key skew profile: the diagnostic that decides whether a join
    // needs salting BEFORE it runs — per-key row counts for the heaviest
    // keys, each with its share of the table and its multiple of the
    // mean key load. One hash aggregation over the fact + a 1-row
    // global-stats broadcast; the top-10 is a bounded TakeOrdered. A
    // key at x_avg ≫ 1 is the one that stalls a reducer at 100 TB.
    "join_skew_profile" -> ((s, d) => {
      val freq = Tables.lineitemShared(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_rows"))
      val tot = freq.agg(sum("n_rows").as("total_rows"),
        count(lit(1)).as("n_keys"))
      freq.crossJoin(broadcast(tot))
        .select(col("l_suppkey"), col("n_rows"),
          (col("n_rows").cast("double") / col("total_rows")).as("share"),
          // cast BEFORE the multiply: n_rows · n_keys as 64-bit ints
          // wraps around 2^63 (n_rows ~1e12 × n_keys ~1e7) in Spark
          // while DuckDB widens to int128 — the double product is
          // overflow-free (and IEEE-identical on both engines) at any
          // magnitude this diagnostic can meet
          (col("n_rows").cast("double") * col("n_keys")
            / col("total_rows")).as("x_avg"))
        .orderBy(col("n_rows").desc, col("l_suppkey"))
        .limit(10)
    }),

    // GROUPING SETS (finer than rollup/cube).
    "agg_grouping_sets" -> ((s, d) => {
      val o = Tables.ordersShared(s, d)
      o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // PIVOT: order counts by status × priority (explicit value list →
    // stable schema; empty cells are NULL on both sides).
    "agg_pivot" -> ((s, d) => {
      Tables.ordersShared(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .count()
    }),

    // Approximate distinct (HLL++). The sketch value is engine-specific,
    // so the oracle-checked contract is the ACCURACY BOUND, not the raw
    // estimate: |approx − exact| ≤ 5% · exact must hold (rsd=0.01 gives
    // ~5σ headroom; HLL++ is deterministic, so this is a stable check).
    // The oracle computes the exact count and asserts the bound TRUE.
    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitemShared(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          (abs(approx_count_distinct(col("l_partkey"), 0.01) -
            countDistinct(col("l_partkey"))).cast("double") <=
            lit(0.05) * countDistinct(col("l_partkey"))).as("approx_ok"))
    }),

    // Mergeable-sketch cardinality rollup (DataSketches HLL): the
    // pattern that makes distinct-counting compose at 100 TB — build a
    // sketch PER GROUP (map-side partial, fixed bytes per group),
    // re-aggregate groups by UNIONING sketches instead of rescanning
    // rows. Here: per-returnflag sketches, then one union for the
    // global estimate — the second level touches O(groups) sketches,
    // not O(rows). countDistinct alongside is the per-group exact
    // check; the union row's exact comes from one more distinct agg
    // (the thing the sketch union REPLACES at scale, kept here only to
    // verify the bound). As with the other sketch queries, what the
    // oracle checks is the ACCURACY CONTRACT, not the impl-specific
    // estimate — and unlike CMS, HLL's error is probabilistic with no
    // hard bound: at lgK=12 the relative standard error is
    // 1.04/√4096 ≈ 1.6%, so the asserted ±6% is ≈3.7σ (per-row chance
    // failure ~1e-4, negligible across the 5 checked rows even if the
    // corpus is regenerated), NOT a theorem.
    "agg_hll_mergeable" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d)
      val perFlag = li.groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .transform(graft.CachePool.persist)
      val groups = perFlag.select(col("l_returnflag"),
        col("exact_parts"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_parts"))
          .cast("double") <= lit(0.06) * col("exact_parts")).as("bound_ok"))
      val globalExact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val union = perFlag.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), true)).as("est"))
        .crossJoin(broadcast(globalExact))
        .select(lit("ALL").as("l_returnflag"), col("exact_parts"),
          (abs(col("est") - col("exact_parts")).cast("double") <=
            lit(0.06) * col("exact_parts")).as("bound_ok"))
      groups.unionByName(union)
    }),

    // Sketch-mergeable CUBE — the agg_hll_mergeable pattern extended to
    // a grouping LATTICE: leaf-level (returnflag, linestatus) sketches
    // are built in ONE scan, and every coarser level (per-flag, global)
    // comes from UNIONING leaf sketches — O(groups) sketch merges, zero
    // row rescans. At 100 TB this is how a distinct-count dashboard
    // serves every drill-down level from one pass; the exact distinct
    // alongside each level exists only to verify the ±6% envelope
    // (≈3.7σ at lgK=12, the agg_hll_mergeable argument) and is the
    // recomputation the sketch lattice REPLACES.
    "agg_hll_cube" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d)
      val leaf = li.groupBy("l_returnflag", "l_linestatus")
        .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .transform(graft.CachePool.persist) // 3 lattice levels, 1 build
      def ok(est: org.apache.spark.sql.Column) =
        (abs(est - col("exact_parts")).cast("double") <=
          lit(0.06) * col("exact_parts")).as("bound_ok")
      val nullStatus = lit(null).cast("string").as("l_linestatus")
      val lvl2 = leaf.select(col("l_returnflag"), col("l_linestatus"),
        col("exact_parts"), ok(hll_sketch_estimate(col("sk"))))
      val lvl1 = leaf.groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), true)).as("est"))
        .join(li.groupBy("l_returnflag")
          .agg(countDistinct("l_partkey").as("exact_parts")), "l_returnflag")
        .select(col("l_returnflag"), nullStatus, col("exact_parts"),
          ok(col("est")))
      val lvl0 = leaf
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), true)).as("est"))
        .crossJoin(broadcast(
          li.agg(countDistinct("l_partkey").as("exact_parts"))))
        .select(lit("ALL").as("l_returnflag"), nullStatus,
          col("exact_parts"), ok(col("est")))
      lvl2.unionByName(lvl1).unionByName(lvl0)
    }),

    // Count-min-sketch heavy hitters: the one-pass bounded-memory
    // frequency sketch (width ⌈e/ε⌉ × depth ⌈ln 1/δ⌉ counters) that at
    // 100 TB replaces a full groupBy when only the heavy tail matters.
    // Sketch values are seed/impl-specific, so — like the HLL query —
    // the oracle-checked contract is the GUARANTEE, not the counters:
    // estimate ∈ [exact, exact + ε·N] must hold for every probed key
    // (one-sided error is the CMS theorem; fixed seed makes it
    // deterministic). Build is distributed (treeAggregate inside
    // stat.countMinSketch); only the O(width·depth) sketch and the
    // bounded top-10 ever reach the driver.
    "agg_cms_heavy_hitters" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d).select("l_suppkey")
      val cms = li.stat.countMinSketch(col("l_suppkey"),
        eps = 0.001, confidence = 0.99, seed = 42)
      val slack = math.ceil(0.001 * cms.totalCount()).toLong
      val top = li.groupBy("l_suppkey").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("l_suppkey")).limit(10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val rows = top.map { case (k, n) =>
        val est = cms.estimateCount(k)
        (k, n, est >= n && est <= n + slack)
      }
      import s.implicits._
      rows.toSeq.toDF("l_suppkey", "n_exact", "bound_ok")
    }),

    // Ranking-window family with a total (tie-broken) ordering.
    "window_ntile" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customerShared(s, d).select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    }),

    "window_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.ordersShared(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"))
    }),

    // Array ops over embeddings (no arithmetic → exact float compare).
    // All outputs are scalars: the driver's row hasher cannot sort
    // array-typed cells, so the sorted-slice is projected to three
    // element columns (the typed array variant lives in QueriesSpec).
    "array_ops" -> ((s, d) => {
      val sorted = sort_array(col("embedding"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_dim"),
        array_max(col("embedding")).as("vmax"),
        array_min(col("embedding")).as("vmin"),
        element_at(sorted, 1).as("smallest1"),
        element_at(sorted, 2).as("smallest2"),
        element_at(sorted, 3).as("smallest3"))
    }),

    // NULL semantics: nullif/coalesce/null-aware aggregation.
    "scalar_null" -> ((s, d) => {
      Tables.lineitemShared(s, d)
        .withColumn("disc_or_null", nullif(col("l_discount"), lit(0.0)))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          count(col("disc_or_null")).as("n_discounted"),
          sum(when(col("disc_or_null").isNull, 1).otherwise(0)).cast("long")
            .as("n_zero_disc"),
          coalesce(min(col("disc_or_null")), lit(-1.0)).as("min_nonzero_disc"))
    }),

    // Custom whole-operator path: top-3 orders per customer through
    // graft.plans.TopK (LogicalPlan + SparkStrategy + two-phase exec
    // with per-partition bounded heaps) — oracle-checked against the
    // window row_number formulation it replaces.
    "topk_per_key_native" -> ((s, d) => {
      graft.plans.TopK.perKey(
        Tables.ordersShared(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    }),

    // Supply-vs-demand side of the star schema in one pass: per nation,
    // suppliers and customers aggregated from two broadcast-dim joins
    // unioned by role tag (exercises the supplier table).
    "join_supplier_customer" -> ((s, d) => {
      val nat = broadcast(Tables.nation(s, d))
      val sup = Tables.supplier(s, d)
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), lit("supplier").as("role"),
          col("s_acctbal").as("bal"))
      val cust = Tables.customerShared(s, d)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), lit("customer").as("role"),
          col("c_acctbal").as("bal"))
      sup.unionByName(cust)
        .groupBy("n_name", "role")
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double").as("total_bal"))
    }),

    // Exact interpolated percentiles (sort-based; both engines use
    // lo + frac*(hi-lo) interpolation on the same sorted values).
    "agg_percentile" -> ((s, d) => {
      Tables.ordersShared(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
    }),

    // Batch sessionization: a new session starts after a >30 min gap in
    // a user's event stream. Two windows — lag to flag gaps, running sum
    // to number sessions — one shuffle+sort total; this is the batch
    // equivalent of Structured Streaming's session_window.
    "window_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      val gapFlag = when(
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) >
          1800L * 1000000L, 1)
        .otherwise(0)
      Tables.eventsShared(s, d)
        .withColumn("new_session", gapFlag)
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
    }),

    // Salted join — the skew guard pattern, made verifiable: the dim is
    // replicated SALT ways and the fact side spreads each hot key across
    // SALT partitions via a deterministic salt; the oracle is the PLAIN
    // join, proving salting never changes results. (At 100 TB this is
    // what you do when one nation holds half the customers and AQE's
    // skew split isn't available, e.g. in a streaming join.)
    "join_salted" -> ((s, d) => {
      val SALT = 8
      val saltedDim = Tables.nation(s, d)
        .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
      val saltedFact = Tables.customerShared(s, d)
        .withColumn("salt", pmod(col("c_custkey"), lit(SALT)).cast("int"))
      saltedFact.join(saltedDim,
        col("c_nationkey") === col("n_nationkey") && saltedFact("salt") === saltedDim("salt"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
    }),

    // Schema evolution: old-schema events (no props column) unioned with
    // new-schema by name; missing columns become nulls instead of a
    // pipeline failure — CDC streams change shape over time.
    "cdc_schema_evolution" -> ((s, d) => {
      val e = Tables.eventsShared(s, d)
      // tag origin explicitly: counting `props IS NULL` would also count
      // genuinely-null source payloads, diverging from the oracle on any
      // corpus that has them
      val oldSchema = e.filter(col("event_id") % 2 === 0).drop("props")
        .withColumn("from_old_schema", lit(1))
      val newSchema = e.filter(col("event_id") % 2 === 1)
        .withColumn("from_old_schema", lit(0))
      oldSchema.unionByName(newSchema, allowMissingColumns = true)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("from_old_schema")).cast("long").as("n_missing_props"))
    }),

    // Schema drift beyond missing columns: three epochs of the same
    // table — legacy files with a NARROW int key and no props, a widened
    // long-key epoch, and an epoch that ADDED a nested meta struct —
    // unioned by name with explicit int→long widening (the migration
    // path SchemaEvolutionSpec proves mergeSchema refuses to take).
    // Legacy rows surface null props; pre-meta rows surface null meta;
    // the nested field aggregates through the null structs correctly.
    "cdc_schema_evolution_widen" -> ((s, d) => {
      val e = Tables.eventsShared(s, d)
      val v0 = e.filter(col("event_id") % 3 === 0) // legacy: int key, no props
        .select(col("event_id"), col("user_id").cast("int").as("user_id"),
          col("value"))
      val v1 = e.filter(col("event_id") % 3 === 1) // widened key + props
        .select(col("event_id"), col("user_id"), col("value"), col("props"))
      val v2 = e.filter(col("event_id") % 3 === 2) // + nested meta struct
        .select(col("event_id"), col("user_id"), col("value"), col("props"),
          struct(get_json_object(col("props"), "$.k").cast("long").as("k"),
            lit("v2").as("source")).as("meta"))
      v0.withColumn("user_id", col("user_id").cast("long")) // explicit widen
        .unionByName(v1, allowMissingColumns = true)
        .unionByName(v2, allowMissingColumns = true)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("props").isNull && col("event_id") % 3 === 0, 1)
            .otherwise(0)).cast("long").as("n_legacy"),
          sum(when(col("meta").isNotNull, 1).otherwise(0)).cast("long")
            .as("n_meta"),
          max(col("meta.k")).as("max_meta_k"))
    }),

    // Pattern-matching filters: LIKE, NOT LIKE, and anchored regexp.
    "scalar_like" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%ring%") ||
          (col("p_name").rlike("^blue ") && !col("p_type").like("PROMO%")))
        .select("p_partkey", "p_name", "p_type")
    }),

    // Second string-function wave (edit distance, padding, charset ops).
    "scalar_string2" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("edit_dist"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        rpad(col("p_brand"), 12, ".").as("brand_padded"),
        translate(col("p_brand"), "#", "-").as("brand_tr"),
        ascii(substring(col("p_name"), 1, 1)).as("first_ascii"),
        expr("chr(ascii(substring(p_name, 1, 1)) + 1)").as("next_char"),
        repeat(col("p_brand"), 2).as("brand_twice"))
    }),

    // Second date-function wave (month clamping, day arithmetic).
    "scalar_date2" -> ((s, d) => {
      val od = col("o_orderdate").cast("date")
      Tables.ordersShared(s, d).select(
        col("o_orderkey"),
        last_day(od).as("month_end"),
        add_months(od, 1).as("next_month"),
        date_sub(od, 7).as("week_before"),
        dayofyear(od).as("doy"))
    }),

    // RANGE window frame: value-based neighborhoods, not row counts.
    "window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(-10000L, 10000L)
      Tables.ordersShared(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_nearby"))
    }),

    // ROLLUP with grouping indicators (distinguishing subtotal rows).
    "agg_rollup_grouping" -> ((s, d) => {
      Tables.ordersShared(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"))
    }),

    // Lateral view / posexplode (UDTF shape).
    "scalar_split_explode" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_hll_mergeable" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS bound_ok
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL' AS l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS bound_ok
        |FROM lineitem""".stripMargin,
    // Lattice contract: exact distinct per level, TRUE verdict — the
    // estimates themselves are sketch-impl-specific (the CMS/HLL/KLL
    // convention).
    "agg_hll_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS bound_ok
        |FROM lineitem GROUP BY 1, 2
        |UNION ALL
        |SELECT l_returnflag, CAST(NULL AS VARCHAR),
        |  COUNT(DISTINCT l_partkey), TRUE
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', CAST(NULL AS VARCHAR),
        |  COUNT(DISTINCT l_partkey), TRUE
        |FROM lineitem""".stripMargin,
    "agg_kll_quantile_rollup" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS exact_p50,
        |  TRUE AS bound_ok
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL' AS l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
        |  TRUE AS bound_ok
        |FROM lineitem""".stripMargin,
    "agg_cms_heavy_hitters" ->
      """SELECT l_suppkey, COUNT(*) AS n_exact, TRUE AS bound_ok
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY n_exact DESC, l_suppkey LIMIT 10""".stripMargin,
    "agg_theta_set_ops" ->
      """WITH f AS (SELECT o_custkey,
        |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS fa,
        |    MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS fb
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  GROUP BY o_custkey)
        |SELECT 'union' AS set_op, COUNT(*) AS n_exact, TRUE AS bound_ok FROM f
        |UNION ALL
        |SELECT 'intersect' AS set_op,
        |  CAST(SUM(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  TRUE FROM f
        |UNION ALL
        |SELECT 'a_not_b' AS set_op,
        |  CAST(SUM(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  TRUE FROM f""".stripMargin,
    "asof_click_purchase" ->
      """SELECT event_id AS purchase_id, user_id, last_click FROM (
        |  SELECT event_id, user_id, event_type,
        |    max(CASE WHEN event_type = 'click' THEN event_id END) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,
    "asof_nearest_click" ->
      """WITH ec AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *,
        |    max(click_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
        |    min(click_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
        |  FROM ec),
        |p AS (SELECT *,
        |    CASE WHEN prev_us IS NOT NULL AND (next_us IS NULL
        |        OR us - prev_us <= next_us - us)
        |      THEN prev_us ELSE next_us END AS nearest_us
        |  FROM w WHERE event_type = 'purchase'),
        |q AS (SELECT *, CASE WHEN abs(nearest_us - us) <= 3600000000
        |    THEN nearest_us END AS nearest_click_us FROM p)
        |SELECT event_id AS purchase_id, user_id, us AS purchase_us,
        |  nearest_click_us, nearest_click_us - us AS gap_us
        |FROM q""".stripMargin,
    "cdc_state_asof" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id <= 5000) t WHERE rn = 1""".stripMargin,
    "events_funnel_sequential" -> {
      val T = FUNNEL_WINDOW_US
      val cum = """OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |p1 AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN us END)
         |    $cum AS ss FROM ev),
         |p2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ss IS NOT NULL
         |      AND us > ss AND us <= ss + $T THEN us END)
         |    $cum AS cq FROM p1),
         |g AS (SELECT user_id,
         |    MIN(CASE WHEN event_type = 'signup' THEN us END) AS signup_us,
         |    MIN(CASE WHEN event_type = 'click' AND ss IS NOT NULL
         |      AND us > ss AND us <= ss + $T THEN us END) AS click_us,
         |    MIN(CASE WHEN event_type = 'purchase' AND cq IS NOT NULL
         |      AND us > cq AND us <= cq + $T THEN us END) AS purchase_us
         |  FROM p2 GROUP BY user_id)
         |SELECT user_id, signup_us, click_us, purchase_us,
         |  CAST((CASE WHEN signup_us IS NOT NULL THEN 1 ELSE 0 END)
         |    + (CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
         |    + (CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END)
         |    AS INT) AS reached_step
         |FROM g""".stripMargin
    },

    "events_funnel" ->
      """SELECT user_id,
        |  MIN(CASE WHEN event_type = 'signup' THEN event_id END) AS first_signup,
        |  MIN(CASE WHEN event_type = 'click' THEN event_id END) AS first_click,
        |  MIN(CASE WHEN event_type = 'purchase' THEN event_id END) AS first_purchase,
        |  COALESCE(MIN(CASE WHEN event_type = 'signup' THEN event_id END) IS NOT NULL
        |    AND MIN(CASE WHEN event_type = 'click' THEN event_id END)
        |      > MIN(CASE WHEN event_type = 'signup' THEN event_id END)
        |    AND MIN(CASE WHEN event_type = 'purchase' THEN event_id END)
        |      > MIN(CASE WHEN event_type = 'click' THEN event_id END), FALSE) AS completed_funnel
        |FROM events GROUP BY user_id""".stripMargin,
    "events_retention" ->
      """WITH ev AS (SELECT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id),
        |a AS (SELECT DISTINCT ev.user_id, cohort_week,
        |    DATEDIFF('day', cohort_week, wk) // 7 AS week_offset
        |  FROM ev JOIN c USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2""".stripMargin,
    "join_skew_profile" ->
      """WITH freq AS (SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey),
        |tot AS (SELECT SUM(n_rows) AS total_rows, COUNT(*) AS n_keys FROM freq)
        |SELECT l_suppkey, n_rows,
        |  CAST(n_rows AS DOUBLE) / total_rows AS share,
        |  CAST(n_rows AS DOUBLE) * n_keys / total_rows AS x_avg
        |FROM freq, tot
        |ORDER BY n_rows DESC, l_suppkey LIMIT 10""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderstatus,
        |  NULLIF(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS "1-URGENT",
        |  NULLIF(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS "2-HIGH",
        |  NULLIF(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS "3-MEDIUM",
        |  NULLIF(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS "4-NOT SPECIFIED",
        |  NULLIF(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "window_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "window_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "array_ops" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_dim,
        |  list_aggregate(embedding, 'max') AS vmax,
        |  list_aggregate(embedding, 'min') AS vmin,
        |  list_sort(embedding)[1] AS smallest1,
        |  list_sort(embedding)[2] AS smallest2,
        |  list_sort(embedding)[3] AS smallest3
        |FROM embeddings""".stripMargin,
    "scalar_null" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
        |  CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
        |  COALESCE(MIN(NULLIF(l_discount, 0.0)), -1.0) AS min_nonzero_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "topk_per_key_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,
    "join_supplier_customer" ->
      """SELECT n_name, role, COUNT(*) AS n,
        |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM (
        |  SELECT n_name, 'supplier' AS role, s_acctbal AS bal
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT n_name, 'customer' AS role, c_acctbal AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
        |GROUP BY n_name, role""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "window_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id)) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "join_salted" ->
      """SELECT n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "cdc_schema_evolution" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_props
        |FROM events GROUP BY user_id""".stripMargin,
    "cdc_schema_evolution_widen" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
        |  CAST(SUM(CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_meta,
        |  MAX(CASE WHEN event_id % 3 = 2
        |    THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS max_meta_k
        |FROM events GROUP BY user_id""".stripMargin,
    "scalar_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%ring%'
        |  OR (regexp_matches(p_name, '^blue ') AND p_type NOT LIKE 'PROMO%')""".stripMargin,
    "scalar_string2" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, p_type) AS INT) AS edit_dist,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  rpad(p_brand, 12, '.') AS brand_padded,
        |  translate(p_brand, '#', '-') AS brand_tr,
        |  CAST(ascii(substr(p_name, 1, 1)) AS INT) AS first_ascii,
        |  chr(ascii(substr(p_name, 1, 1)) + 1) AS next_char,
        |  repeat(p_brand, 2) AS brand_twice
        |FROM part""".stripMargin,
    "scalar_date2" ->
      """SELECT o_orderkey,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS week_before,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy
        |FROM orders""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_nearby
        |FROM orders""".stripMargin,
    "agg_rollup_grouping" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "scalar_split_explode" ->
      """SELECT p_partkey,
        |  CAST(generate_subscripts(l, 1) - 1 AS INT) AS pos, unnest(l) AS word
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS l FROM part) t""".stripMargin
  )
}
