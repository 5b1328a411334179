package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distribution-shape and cohort-statistics operators — the profiling
  * surface an analytics consumer runs against the replicated tables
  * (reference surface: the per-entity state and event history the
  * pipeline materializes; cf. /root/reference/cmd/es_consumer/main.go:44-95
  * and /root/reference/internal/store/store.go).
  *
  * Scale design notes, per query:
  *  - `events_cum_users` — the cumulative-adoption curve. Heavy work is
  *    two hash aggregations (first-seen day per user, then new users per
  *    day); the running-sum window is over O(days) rows, so its single
  *    partition is a deliberate planner-sized choice, not a scale bug
  *    (same argument as Layout.layout_range_split's distinct-first
  *    ntile).
  *  - `events_dow_mix` — day-of-week × event-type activity profile with
  *    per-dow share. One hash aggregation; the share window runs over
  *    the ≤ 7·|event types| aggregated rows.
  *  - `agg_mode_per_group` — exact per-group mode with a total
  *    deterministic tie-break (count desc, then value asc). groupBy on
  *    (group, value) first, so the window sees O(distinct values) rows,
  *    never the fact table.
  *  - `window_percent_rank` — percent_rank + cume_dist per market
  *    segment: rank-based (not value-interpolating), so ties are exact
  *    and both engines agree bitwise — the divisions (rank−1)/(n−1) and
  *    peers/n are single IEEE ops on exact longs.
  *  - `agg_median_abs_dev` — MAD, the robust spread statistic (outlier
  *    screens that survive the very outliers they hunt). Two percentile
  *    passes with a broadcast of the O(groups) median relation between
  *    them; both engines use the same lo + frac·(hi−lo) interpolation on
  *    identical doubles (the convention agg_percentile established).
  *  - `text_hapax` — corpus vocabulary census: vocabulary size, hapax
  *    count (freq = 1), total tokens, hapax share. The classic corpus
  *    health signal (a scrape of boilerplate has few hapaxes; OCR noise
  *    has too many). One token explode + two hash aggregations; the
  *    final agg is over O(vocab) rows and emits one row.
  *  - `agg_bitmap_distinct` — EXACT distinct counting that merges like a
  *    sketch: pack user ids into 64-bit bucket bitmaps (`bucket = id div
  *    64`, `bit = id mod 64`), `bit_or` the words per (group, bucket),
  *    then sum popcounts. Both aggregations combine map-side, the words
  *    are mergeable across shards/days with plain `bit_or` (the
  *    ClickHouse/Doris bitmap-index pattern), and the shuffle carries at
  *    most distinct/64 rows per group instead of every raw fact row —
  *    the scalable alternative when HLL's error bars are not acceptable.
  *  - `agg_regr_slope` — grouped OLS fit (slope/intercept/R²) from the
  *    same exact-decimal power sums as `agg_corr_stats`: one hash
  *    aggregation, no second pass over the facts, bitwise-identical
  *    doubles on both engines.
  *  - `agg_skewness` — exact 3rd/4th standardized moments (skewness,
  *    excess kurtosis) per group from scale-0 integer-cent power sums
  *    (the `profile_outliers` conversion convention — correctly-rounded
  *    decimal→double at any magnitude). Normalization uses only
  *    mul/div/sqrt (all IEEE correctly-rounded), never `pow`, whose
  *    libm implementations differ across engines by ulps. Overflow
  *    bound: cents ≤ 5100 ⇒ c⁴ ≤ 6.8e14 ⇒ Σc⁴ < 1e38 up to ~1.5e23
  *    rows — unreachable.
  *  - `events_lifecycle` — weekly growth accounting (new / retained /
  *    resurrected / churned), the decomposition behind every honest
  *    growth chart. One distinct (user, week) aggregation, one
  *    user-partitioned lag+lead window (per-partition size is O(weeks
  *    per user), bounded), churn attributed to the week after last
  *    activity; final roll-up is O(weeks).
  *  - `events_hour_of_day` — hour-of-day seasonality (events, distinct
  *    users, exact-decimal mean value). One hash aggregation into 24
  *    groups; the distinct-user count shuffles (hr, user) pairs once.
  *  - `events_stickiness` — DAU / MAU28 stickiness, the engagement
  *    ratio. Rolling 28-day distinct users via the map-side ×28
  *    window-end expansion (the `events_weekly_active` convention):
  *    each (user, active-day) contributes to the 28 window ends it is
  *    visible from, then one distinct + one count — never a band
  *    self-join. At 100 TB the expansion is 28·|user-days| rows through
  *    one exchange; if that dominates, the mergeable-exact alternative
  *    is a per-day bitmap roll-up (`agg_bitmap_distinct`'s words OR-ed
  *    across a 28-day window of O(days) aggregates).
  *  - `events_cohort_ltv` — cumulative lifetime value per signup
  *    cohort: revenue cells (cohort week × week offset) with a running
  *    per-user LTV curve — `events_retention`'s matrix weighted by
  *    money. Two hash aggregations + one co-partitioned user join; the
  *    cumulative window is partitioned per cohort over O(offsets) rows;
  *    money stays exact decimal until the final d2-route double cast.
  *  - `events_out_of_order` — per-user event-time disorder: how often a
  *    row's event time regresses below the running max of its
  *    commit-order predecessors (`event_id` is the arrival/LSN order).
  *    THE diagnostic for sizing a streaming watermark — late_share tells
  *    you what fraction of rows a too-tight watermark would drop. The
  *    running max is a user-partitioned window (bounded per user), never
  *    a global sort.
  *  - `agg_winsorized_mean` — robust mean with tails clamped to the
  *    exact p05/p95 (the outlier-resistant summary a corrupt load
  *    cannot drag). Engine-exact despite the double bounds: the mean is
  *    assembled ANALYTICALLY as (n_below·lo + n_above·hi + Σ_mid cents)
  *    / n — each term a single exact product or an integer sum, added
  *    in one fixed order — never a data-ordered Σ of clamped doubles
  *    (which no two engines sum identically). Two passes with a
  *    broadcast O(groups) bounds relation between them.
  *  - `events_ab_readout` — experiment readout: per-variant user
  *    counts, conversion rates, and the χ² sample-ratio-mismatch
  *    component against the 50/50 design (the guardrail that catches a
  *    broken bucketing pipeline before anyone reads the lift). Variant
  *    assignment is a pure function of user_id; one per-user
  *    aggregation + an O(variants) roll-up.
  *  - `events_watermark_policy` — the decision table out_of_order
  *    motivates: for each candidate watermark delay (0 s … 24 h),
  *    exactly what fraction of rows a `withWatermark(delay)` pipeline
  *    would RETAIN, from the exact per-row lateness distribution. The
  *    lateness pass is the same user-partitioned running max; the
  *    6-candidate evaluation is a map-side ×6 expansion into one hash
  *    aggregation (the weekly_active convention).
  *  - `events_forecast_naive` — seasonal-naïve backtest: predict each
  *    day's event count by the same weekday one week earlier, report
  *    MAE and signed bias per day-of-week. The standard forecast
  *    BASELINE every fancier model must beat; all integer arithmetic on
  *    an O(days) relation.
  */
object Stats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cumulative distinct users by first-activity day.
    "events_cum_users" -> ((s, d) => {
      val daily = Tables.eventsShared(s, d)
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("day"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_new_users"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      daily.withColumn("cum_users", sum("n_new_users").over(w))
    }),

    // Day-of-week activity mix. Spark's dayofweek is 1=Sunday..7; the
    // oracle shifts DuckDB's 0-based dayofweek to match.
    "events_dow_mix" -> ((s, d) => {
      val agg = Tables.eventsShared(s, d)
        .groupBy(dayofweek(col("ts")).as("dow"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      agg.withColumn("share",
        col("n_events").cast("double") /
          sum("n_events").over(Window.partitionBy("dow")).cast("double"))
    }),

    // Exact mode of order priority per order status, deterministic
    // tie-break.
    "agg_mode_per_group" -> ((s, d) => {
      val counts = Tables.ordersShared(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("n_rows").desc, col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n_rows"))
    }),

    // Relative standing of every customer inside its market segment.
    "window_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      Tables.customerShared(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
    }),

    // Median absolute deviation of order value per order status.
    "agg_median_abs_dev" -> ((s, d) => {
      val med = Tables.ordersShared(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
      Tables.ordersShared(s, d)
        .join(broadcast(med), "o_orderstatus")
        .withColumn("adev", abs(col("o_totalprice") - col("med")))
        .groupBy("o_orderstatus")
        .agg(max("med").as("med"), expr("percentile(adev, 0.5)").as("mad"))
    }),

    // Corpus vocabulary census (same whitespace tokenization as the
    // text_* family).
    "text_hapax" -> ((s, d) => {
      TextAnalysis.docsPar(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_vocab"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"),
          sum("n").as("n_tokens"))
        .withColumn("hapax_share",
          col("n_hapax").cast("double") / col("n_vocab").cast("double"))
    }),

    // Exact mergeable distinct via 64-bit bucket bitmaps. The bucket is
    // shiftright(id, 6) — FLOOR division, the same rounding family as
    // pmod's floored remainder — so bucket*64 + bit == id for negative
    // ids too. NOTE (measured, round 11): DuckDB's `//` TRUNCATES
    // toward zero, it does not floor — the oracle's `user_id // 64` is
    // only safe because user_ids are non-negative; for a signed key
    // mirror shiftright with DuckDB's `>>`, which IS arithmetic
    // (layout_fingerprint_order does exactly that).
    "agg_bitmap_distinct" -> ((s, d) => {
      val words = Tables.eventsShared(s, d)
        .groupBy(col("event_type"), expr("shiftright(user_id, 6)").as("bucket"))
        .agg(expr("bit_or(shiftleft(1L, cast(pmod(user_id, 64) as int)))")
          .as("word"))
      words.groupBy("event_type")
        .agg(sum(expr("cast(bit_count(word) as bigint)")).as("n_users"),
          count(lit(1)).as("n_buckets"))
    }),

    // Grouped OLS: l_extendedprice ~ l_quantity per return flag.
    "agg_regr_slope" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      def d2(c: org.apache.spark.sql.Column, scale: Int) = {
        val p = math.pow(10, scale)
        (c * lit(p.toLong)).cast("decimal(38,0)").cast("double") / lit(p)
      }
      // degenerate-group guard (the text_quality_length_bias convention):
      // constant x ⇒ no fit (slope/intercept/r2 NULL); constant y ⇒ r2
      // NULL. Without it Spark's non-ANSI /0 gives NULL while DuckDB's
      // IEEE float division gives Inf/NaN — a silent oracle divergence.
      val dx = col("n") * col("sxx") - col("sx") * col("sx")
      val dy = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val slope = when(dx === 0.0, lit(null)).otherwise(num / dx)
      Tables.lineitemShared(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          d2(sum(x), 2).as("sx"), d2(sum(y), 2).as("sy"),
          d2(sum(x * x), 4).as("sxx"), d2(sum(y * y), 4).as("syy"),
          d2(sum(x * y), 4).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          slope.as("slope"),
          when(dx === 0.0, lit(null))
            .otherwise((col("sy") - slope * col("sx")) / col("n"))
            .as("intercept"),
          when(dx === 0.0 || dy === 0.0, lit(null))
            .otherwise((num * num) / (dx * dy)).as("r2"))
    }),

    // Exact skewness / excess kurtosis of quantity per return flag from
    // integer-cent power sums (no pow(); see the scaladoc note).
    "agg_skewness" -> ((s, d) => {
      val c = (col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)").cast("long")
      def pd(e: org.apache.spark.sql.Column) =
        sum(e.cast("decimal(38,0)")).cast("double")
      val stats = Tables.lineitemShared(s, d)
        .select(col("l_returnflag"), c.as("c"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          pd(col("c")).as("s1"),
          pd(col("c") * col("c")).as("s2"),
          pd(col("c") * col("c") * col("c")).as("s3"),
          pd(col("c") * col("c") * col("c") * col("c")).as("s4"))
      val m = col("s1") / col("n")
      val m2 = col("s2") / col("n") - m * m
      val m3 = col("s3") / col("n") - lit(3.0) * m * (col("s2") / col("n")) +
        lit(2.0) * m * m * m
      val m4 = col("s4") / col("n") - lit(4.0) * m * (col("s3") / col("n")) +
        lit(6.0) * m * m * (col("s2") / col("n")) - lit(3.0) * m * m * m * m
      // m2 = 0 (constant group) guard: NULL rather than Spark-NULL-vs-
      // DuckDB-NaN divergence — same convention as agg_regr_slope.
      stats.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        when(m2 === 0.0, lit(null))
          .otherwise(m3 / (m2 * sqrt(m2))).as("skewness"),
        when(m2 === 0.0, lit(null))
          .otherwise(m4 / (m2 * m2) - lit(3.0)).as("excess_kurtosis"))
    }),

    // Weekly growth accounting: new / retained / resurrected / churned.
    "events_lifecycle" -> ((s, d) => {
      val wk = Tables.eventsShared(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("wk")
      val runs = wk
        .withColumn("prev_wk", lag("wk", 1).over(w))
        .withColumn("next_wk", lead("wk", 1).over(w))
      val active = runs.select(col("wk"),
        when(col("prev_wk").isNull, lit("new"))
          .when(datediff(col("wk"), col("prev_wk")) === 7, lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
      val churned = runs
        .filter(col("next_wk").isNull ||
          datediff(col("next_wk"), col("wk")) > 7)
        .select(date_add(col("wk"), 7).as("wk"), lit("churned").as("status"))
      active.unionByName(churned)
        .groupBy("wk")
        .agg(
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("status") === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"),
          sum(when(col("status") === "churned", 1L).otherwise(0L))
            .as("n_churned"))
        .withColumn("n_active",
          col("n_new") + col("n_retained") + col("n_resurrected"))
    }),

    // Hour-of-day seasonality profile.
    "events_hour_of_day" -> ((s, d) => {
      Tables.eventsShared(s, d)
        .groupBy(hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
        .select(col("hr"), col("n_events"), col("n_users"),
          (col("sv").cast("double") / col("n_events")).as("avg_value"))
    }),

    // DAU / rolling-28-day MAU / stickiness per day.
    "events_stickiness" -> ((s, d) => {
      val days = Tables.eventsShared(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = days
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 27))")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("mau28"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau28"),
          (col("dau").cast("double") / col("mau28").cast("double"))
            .as("stickiness"))
    }),

    // Cohort-week LTV curves: cumulative revenue per user by offset.
    "events_cohort_ltv" -> ((s, d) => {
      def d2(c: org.apache.spark.sql.Column) =
        (c * lit(100L)).cast("decimal(38,0)").cast("double") / lit(100.0)
      val ev = Tables.eventsShared(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          col("value").cast("decimal(18,2)").as("v"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      val sized = cohort.groupBy("cohort_week")
        .agg(count(lit(1)).as("n_cohort_users"))
      val cells = ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          expr("datediff(wk, cohort_week) div 7").as("week_offset"))
        .agg(sum("v").as("rev_dec"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
      cells.withColumn("cum_dec", sum("rev_dec").over(w))
        .join(broadcast(sized), "cohort_week")
        .select(col("cohort_week"), col("week_offset"),
          col("n_cohort_users"),
          d2(col("rev_dec")).as("revenue"),
          (d2(col("cum_dec")) / col("n_cohort_users"))
            .as("cum_ltv_per_user"))
    }),

    // Event-time disorder vs commit order, per user.
    "events_out_of_order" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.eventsShared(s, d)
        .withColumn("prior_max", max("ts").over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("ts") < col("prior_max"), 1L).otherwise(0L))
            .as("n_late"))
        .withColumn("late_share",
          col("n_late").cast("double") / col("n_events").cast("double"))
    }),

    // Robust mean: tails clamped to exact p05/p95, assembled
    // analytically (see scaladoc) so the double math is order-free.
    "agg_winsorized_mean" -> ((s, d) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)").cast("long")
      val base = Tables.ordersShared(s, d)
        .select(col("o_orderpriority"), cents.as("c"))
        .transform(graft.CachePool.persist) // bounds pass + clamp pass
      val bounds = base.groupBy("o_orderpriority")
        .agg(expr("percentile(c, array(0.05D, 0.95D))").as("ps"))
        .select(col("o_orderpriority"),
          col("ps").getItem(0).as("lo"), col("ps").getItem(1).as("hi"))
      base.join(broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("lo"), 1L).otherwise(0L)).as("n_below"),
          sum(when(col("c") > col("hi"), 1L).otherwise(0L)).as("n_above"),
          sum(when(col("c") >= col("lo") && col("c") <= col("hi"), col("c"))
            .otherwise(0L).cast("decimal(38,0)")).cast("double").as("mid"),
          max("lo").as("lo"), max("hi").as("hi"))
        .select(col("o_orderpriority"), col("n"), col("n_below"),
          col("n_above"),
          ((col("n_below") * col("lo") + col("n_above") * col("hi") +
            col("mid")) / col("n") / lit(100.0)).as("winsorized_mean"))
    }),

    // A/B experiment readout with a sample-ratio-mismatch component.
    // Variant-assignment convention (shared with events_ab_value_ttest):
    // Spark assigns via pmod(user_id, 2) — the FLOORED remainder, always
    // in {0, 1} — and the oracle mirrors it as ((user_id % 2) + 2) % 2
    // because DuckDB's bare % truncates (negative ids would map to -1
    // and silently skew both sides' moments). Floored on both engines →
    // agreement for ALL ids, not just the corpus's non-negative ones.
    "events_ab_readout" -> ((s, d) => {
      val per = Tables.eventsShared(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      val v = per.groupBy(expr("pmod(user_id, 2)").as("variant"))
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_converted"))
        .withColumn("conv_rate",
          col("n_converted").cast("double") / col("n_users").cast("double"))
      val tot = v.agg(sum("n_users").as("total_users"))
        .withColumn("__k", lit(1))
      v.withColumn("__k", lit(1)).join(broadcast(tot), "__k")
        .select(col("variant"), col("n_users"), col("n_converted"),
          col("conv_rate"),
          // χ² term against the 50/50 design: (obs − total/2)²/(total/2)
          (((col("n_users").cast("double") -
            col("total_users").cast("double") / 2.0) *
            (col("n_users").cast("double") -
              col("total_users").cast("double") / 2.0)) /
            (col("total_users").cast("double") / 2.0)).as("srm_component"))
    }),

    // Kaplan–Meier time-to-first-purchase — discrete-time survival
    // analysis of the conversion funnel: per day-since-first-activity,
    // who is still at risk (active, not yet purchased), who converted
    // exactly there, the hazard d/n, and the survival function
    // S(t) = Π_{i≤t} (1 − h_i) — the not-yet-converted curve. Users
    // who never purchase are right-CENSORED at their last observed
    // day (the standard KM treatment; they leave the risk set without
    // an event). Scale shape: per-user (first day, first purchase,
    // last day) is one hash agg; everything after runs on the O(day
    // offsets) DURATION HISTOGRAM — at-risk counts are a descending
    // cumulative over it (never over users), and the cumulative
    // PRODUCT is an ordered fold over the collected factor array
    // (bounded, one per offset) so both engines multiply the same
    // doubles in the same order — no libm exp/ln detour.
    "events_survival_curve" -> ((s, d) => {
      val u = Tables.eventsShared(s, d)
        .select(col("user_id"), col("ts").cast("date").as("dy"),
          col("event_type"))
        .groupBy("user_id")
        .agg(min("dy").as("fd"),
          min(when(col("event_type") === "purchase", col("dy"))).as("pd"),
          max("dy").as("ld"))
      val lt = u.select(
        when(col("pd").isNotNull, datediff(col("pd"), col("fd")))
          .otherwise(datediff(col("ld"), col("fd"))).cast("int").as("l"),
        when(col("pd").isNotNull, 1L).otherwise(0L).as("converted"))
      val hist = lt.groupBy("l")
        .agg(count(lit(1)).as("n_total"), sum("converted").as("n_converted"))
      val wDesc = Window.orderBy(col("l").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAsc = Window.orderBy("l")
      val cum = hist
        .withColumn("n_at_risk", sum("n_total").over(wDesc))
        .withColumn("rn", row_number().over(wAsc))
        .withColumn("hazard",
          col("n_converted").cast("double") / col("n_at_risk").cast("double"))
        .withColumn("factor", lit(1.0) - col("hazard"))
      val fa = cum.agg(transform(
        array_sort(collect_list(struct(col("l"), col("factor")))),
        x => x.getField("factor")).as("farr"))
      cum.crossJoin(broadcast(fa))
        .select(col("l").as("day_offset"), col("n_at_risk"),
          col("n_converted"), col("hazard"),
          aggregate(slice(col("farr"), lit(1), col("rn")), lit(1.0),
            (acc, f) => acc * f).as("survival"))
    }),

    // Exact weighted median on the shared rank-statistics family: per
    // return flag, the revenue-weighted median quantity — the smallest
    // value whose 2·cum(weight) ≥ total (all integer compares, no
    // division), extracted by Boundaries.weightedQuantileValuesGrouped
    // at k=2 (this query IS that rule's k=2, i=1 point). r13: the old
    // hand-rolled Window.partitionBy(l_returnflag) cumulative was fine
    // at 3 flags × ≤50 distinct quantities but is the same
    // rank-extraction motif the family unified — the helper
    // range-shuffles on (flag, quantity), so even a two-group
    // money-grade histogram never funnels a whole group through one
    // task, and the histogram collapse happens inside the helper (the
    // prefix sum walks O(distinct values), never the fact table).
    "agg_weighted_median" -> ((s, d) => {
      val rows = Tables.lineitemShared(s, d).select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("w"))
        .transform(graft.CachePool.persist) // median walk + totals
      val tot = rows.groupBy("l_returnflag")
        .agg(sum("w").as("total_w"),
          count_distinct(col("q")).as("n_distinct_q"))
      Boundaries.weightedQuantileValuesGrouped(
          rows, Seq("l_returnflag"), "q", "w", 2)
        .join(broadcast(tot), "l_returnflag")
        .select(col("l_returnflag"), col("n_distinct_q"), col("total_w"),
          col("bv").cast("double").as("weighted_median_qty"))
    }),

    // The k>2 face of the same operator: revenue-weighted quantity
    // QUARTILES per return flag — where each quarter of the MONEY sits
    // on the quantity axis (the distribution question "what order sizes
    // carry the revenue", which the unweighted quartiles get wrong
    // whenever price correlates with quantity). Same helper, same
    // all-integer k·cum ≥ i·W rule, boundaries shipped as DOUBLE.
    "agg_weighted_quartiles" -> ((s, d) => {
      val rows = Tables.lineitemShared(s, d).select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("w"))
      Boundaries.weightedQuantileValuesGrouped(
          rows, Seq("l_returnflag"), "q", "w", 4)
        .select(col("l_returnflag"), col("i").cast("int").as("quartile"),
          col("bv").cast("double").as("boundary_qty"))
    }),

    // Difference-in-differences — the quasi-experimental readout when
    // assignment isn't randomized per exposure: effect = (treatment
    // post − pre) − (control post − pre), which nets out both the
    // time trend shared by the arms and the standing level difference
    // between them. Period split = the global epoch-day midpoint
    // ((d1−d0) halved by integer compare — no corpus-dependent date
    // literal, so the query is SF-portable); cells are per-(variant,
    // period) purchase-event cent means. All four cell moments are
    // exact integers; the five shipped doubles are single divisions /
    // one fixed subtraction tree mirrored verbatim in the oracle. An
    // empty cell NULLs the effect (null propagation, both engines).
    // Shape: one scan, a ≤4-row hash agg, a 1-row conditional pivot.
    "events_ab_did" -> ((s, d) => {
      val ev = Tables.eventsShared(s, d)
      val g = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1")).withColumn("__k", lit(1))
      val cells = ev.withColumn("__k", lit(1)).join(broadcast(g), "__k")
        .filter(col("event_type") === "purchase")
        .withColumn("post",
          datediff(to_date(col("ts")), col("d0")) * 2 >
            datediff(col("d1"), col("d0")))
        .groupBy(expr("pmod(user_id, 2)").as("variant"), col("post"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")
            .cast("decimal(38,0)")).cast("double").as("sc"))
      def cell(v: Int, p: Boolean, c: org.apache.spark.sql.Column) =
        min(when(col("variant") === v && col("post") === p, c))
      val m = col("sc") / col("n") / 100.0
      cells.agg(
          cell(0, p = false, col("n")).as("n_ctl_pre"),
          cell(0, p = true, col("n")).as("n_ctl_post"),
          cell(1, p = false, col("n")).as("n_trt_pre"),
          cell(1, p = true, col("n")).as("n_trt_post"),
          cell(0, p = false, m).as("mean_ctl_pre"),
          cell(0, p = true, m).as("mean_ctl_post"),
          cell(1, p = false, m).as("mean_trt_pre"),
          cell(1, p = true, m).as("mean_trt_post"))
        .withColumn("did",
          (col("mean_trt_post") - col("mean_trt_pre")) -
            (col("mean_ctl_post") - col("mean_ctl_pre")))
    }),

    // CUPED variance reduction — the industry-standard experiment
    // sharpener: adjust each user's post-period metric by their OWN
    // pre-period behavior, Y_adj = Y − θ·(X − E[X]) with θ =
    // cov(X,Y)/var(X), which removes the between-user variance the
    // pre-period already explains without biasing the treatment
    // contrast (X predates assignment). Everything derives from SIX
    // exact integer moments (n, Σx, Σy, Σxy, Σx², Σy² in cents via
    // decimal) + two per-variant pairs — one scan, two tiny hash aggs;
    // adjusted MEANS need no per-row pass: mean_adj_v = ȳ_v − θ(x̄_v −
    // x̄). The readout is the adjusted lift plus the variance-reduction
    // ratio ρ² = cov²/(varX·varY) — how much narrower the confidence
    // interval got for free. Degenerate guard: var(X) = 0 (or a lone
    // user) NULLs θ and everything downstream, both engines.
    "events_ab_cuped" -> ((s, d) => {
      val ev = Tables.eventsShared(s, d)
      val g = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1")).withColumn("__k", lit(1))
      val per = ev.withColumn("__k", lit(1)).join(broadcast(g), "__k")
        .withColumn("post",
          datediff(to_date(col("ts")), col("d0")) * 2 >
            datediff(col("d1"), col("d0")))
        .groupBy("user_id")
        .agg(
          coalesce(sum(when(col("event_type") === "purchase" && !col("post"),
            floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("x"),
          coalesce(sum(when(col("event_type") === "purchase" && col("post"),
            floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("y"))
        .transform(graft.CachePool.persist) // global + per-variant pass
      // sums ride decimal (the Σ(cents·cents) addend passes 2^63 well
      // before the corpus does), cast to double once at the end
      def ds(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,0)")).cast("decimal(38,0)").cast("double")
      val glob = per.agg(count(lit(1)).as("n"),
        ds(col("x")).as("sx"), ds(col("y")).as("sy"),
        ds(col("x").cast("decimal(19,0)") * col("y")).as("sxy"),
        ds(col("x").cast("decimal(19,0)") * col("x")).as("sxx"),
        ds(col("y").cast("decimal(19,0)") * col("y")).as("syy"))
        .withColumn("__k", lit(1))
      val v = per.groupBy(expr("pmod(user_id, 2)").as("variant"))
        .agg(count(lit(1)).as("vn"), ds(col("x")).as("vsx"),
          ds(col("y")).as("vsy"))
      def vc(i: Int, c: org.apache.spark.sql.Column) =
        min(when(col("variant") === i, c))
      val piv = v.agg(vc(0, col("vn")).as("n_ctl"), vc(1, col("vn")).as("n_trt"),
          vc(0, col("vsx")).as("sx_ctl"), vc(1, col("vsx")).as("sx_trt"),
          vc(0, col("vsy")).as("sy_ctl"), vc(1, col("vsy")).as("sy_trt"))
        .withColumn("__k", lit(1))
      val nD = col("n").cast("double")
      val covxy = (col("sxy") - col("sx") * col("sy") / nD) / (nD - 1.0)
      val varx = (col("sxx") - col("sx") * col("sx") / nD) / (nD - 1.0)
      val vary = (col("syy") - col("sy") * col("sy") / nD) / (nD - 1.0)
      val theta = when(col("n") <= 1L || varx <= 0.0,
        lit(null).cast("double")).otherwise(covxy / varx)
      val xbar = col("sx") / nD / 100.0
      def mAdj(sy: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
               nn: org.apache.spark.sql.Column) =
        sy / nn.cast("double") / 100.0 -
          col("theta") * (sx / nn.cast("double") / 100.0 - col("xbar"))
      glob.join(piv, "__k")
        .withColumn("theta", theta).withColumn("xbar", xbar)
        .select(col("n_ctl"), col("n_trt"), col("theta"),
          (col("sy_trt") / col("n_trt").cast("double") / 100.0 -
            col("sy_ctl") / col("n_ctl").cast("double") / 100.0).as("lift_raw"),
          (mAdj(col("sy_trt"), col("sx_trt"), col("n_trt")) -
            mAdj(col("sy_ctl"), col("sx_ctl"), col("n_ctl"))).as("lift_cuped"),
          when(col("n") <= 1L || varx <= 0.0 || vary <= 0.0,
            lit(null).cast("double"))
            .otherwise(covxy * covxy / (varx * vary)).as("var_reduction"))
    }),

    // Sample-ratio mismatch — the gate every experiment readout runs
    // FIRST: under 50/50 assignment the arm sizes follow a binomial
    // whose 1-df χ² is (n_a−n_b)²/(n_a+n_b); a significant mismatch
    // means the assignment or logging pipeline is broken and every
    // downstream readout (t-test, MW, QTE, CUPED above) is void. All
    // integer until the single division; the 3.84 threshold is the
    // shared χ²(1, 0.95) literal the t-test verdict already uses.
    "events_ab_srm" -> ((s, d) => {
      Tables.eventsShared(s, d).select("user_id").distinct()
        .agg(sum(when(expr("pmod(user_id, 2)") === 0, 1L).otherwise(0L))
          .as("n_a"),
          sum(when(expr("pmod(user_id, 2)") === 1, 1L).otherwise(0L))
            .as("n_b"))
        .select(col("n_a"), col("n_b"),
          ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
            .cast("double")./(
              (col("n_a") + col("n_b")).cast("double")).as("chi2"))
        .withColumn("srm_detected", col("chi2") > 3.841458820694124)
    }),

    // Quantile treatment effect — where in the spend distribution the
    // experiment moved: the per-quartile difference between the arms'
    // EXACT per-user purchase-total quantiles (mean lift can hide a
    // heavy-tail-only effect that QTE shows directly; the rank-based
    // companion to the t-test's mean and Mann-Whitney's stochastic
    // dominance). Both arms' boundary walks ride ONE grouped prefix-sum
    // (Boundaries.quantileValuesGrouped, grouped on the arm —
    // range-partitioned, no single-task window, and the quantile index
    // i survives the walk); cents stay exact integers end to end. The
    // r12 positional-array form mislabeled collapsed-rank tiny arms
    // (the NULL landed at the TOP quartile instead of the missing one);
    // the spine left-join below puts the NULL at the quartile whose
    // rank actually collapsed, both engines. For arms with ≥ 4 users
    // (every test SF) the values are unchanged.
    "events_ab_qte" -> ((s, d) => {
      val per = Tables.eventsShared(s, d).groupBy("user_id")
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("v"))
        .select(expr("pmod(user_id, 2)").as("variant"), col("v"))
      val q = Boundaries.quantileValuesGrouped(per, Seq("variant"), "v", 4)
        .transform(graft.CachePool.persist) // ≤ 2 arms × 3 rows, read twice
      val qc = q.filter(col("variant") === 0)
        .select(col("i").as("__ic"), col("bv").as("q_ctl_cents"))
      val qt = q.filter(col("variant") === 1)
        .select(col("i").as("__it"), col("bv").as("q_trt_cents"))
      s.range(1, 4).select(col("id").cast("int").as("quartile"))
        .join(broadcast(qc), col("quartile") === col("__ic"), "left")
        .join(broadcast(qt), col("quartile") === col("__it"), "left")
        .select(col("quartile"), col("q_ctl_cents"), col("q_trt_cents"),
          (col("q_trt_cents") - col("q_ctl_cents")).as("qte_cents"))
    }),

    // Cluster-robust RATIO-metric readout via the delta method — the
    // readout every experimentation platform ships next to CUPED: the
    // metric is revenue per SESSION, but the randomization unit is the
    // USER, so session-level variance would be wrong (sessions of one
    // user are correlated); the delta method gives the variance of the
    // ratio R = ΣY_u/ΣN_u from per-USER moment pairs:
    //   Var(R) ≈ (var(Y) − 2R·cov(Y,N) + R²·var(N)) / (n · N̄²)
    // (Deng et al.'s metric-analytics linearization, the standard
    // cluster-at-the-randomization-unit estimator). Sessions are the
    // family's 30-minute-gap convention (events_session_funnel);
    // N_u = 1 + gap count needs only the per-user lag — no second
    // window. All six per-arm moments are exact (cents / counts through
    // the decimal(19,0)·x → decimal(38,0) route, the CUPED overflow
    // argument); the shipped doubles are one fixed expression tree
    // mirrored verbatim in the oracle. Degenerate guards: a lone-user
    // or session-free arm NULLs its ratio/variance and everything
    // downstream (n<2, ΣN≤0, total variance ≤0 → NULL, both engines).
    // Shape: one scan + per-user key-partitioned lag, a per-user hash
    // agg, a 2-row arm agg, a 1-row pivot.
    "events_ab_ratio_delta" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      val per = Tables.eventsShared(s, d)
        .withColumn("new_session",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(byUser)) >
            1800L * 1000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg((sum("new_session") + lit(1L)).as("nses"),
          coalesce(sum(when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("y"))
      def ds(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,0)")).cast("decimal(38,0)").cast("double")
      val arms = per.groupBy(expr("pmod(user_id, 2)").as("variant"))
        .agg(count(lit(1)).as("n"),
          ds(col("y")).as("sy"), ds(col("nses")).as("sn"),
          ds(col("y").cast("decimal(19,0)") * col("y")).as("syy"),
          ds(col("nses").cast("decimal(19,0)") * col("nses")).as("snn"),
          ds(col("y").cast("decimal(19,0)") * col("nses")).as("syn"))
      def side(vr: Int, c: String) = min(when(col("variant") === vr, col(c)))
      val p = arms.agg(
        side(0, "n").as("n_ctl"), side(0, "sy").as("sy_c"),
        side(0, "sn").as("sn_c"), side(0, "syy").as("syy_c"),
        side(0, "snn").as("snn_c"), side(0, "syn").as("syn_c"),
        side(1, "n").as("n_trt"), side(1, "sy").as("sy_t"),
        side(1, "sn").as("sn_t"), side(1, "syy").as("syy_t"),
        side(1, "snn").as("snn_t"), side(1, "syn").as("syn_t"))
      type C = org.apache.spark.sql.Column
      def ratio(sy: C, sn: C) =
        when(sn <= 0.0, lit(null).cast("double")).otherwise(sy / sn)
      def varR(n: C, sy: C, sn: C, syy: C, snn: C, syn: C, r: C) = {
        val nD = n.cast("double")
        val varY = (syy - sy * sy / nD) / (nD - 1.0)
        val covYN = (syn - sy * sn / nD) / (nD - 1.0)
        val varN = (snn - sn * sn / nD) / (nD - 1.0)
        val meanN = sn / nD
        when(n < 2L || sn <= 0.0, lit(null).cast("double"))
          .otherwise((varY - lit(2.0) * r * covYN + r * r * varN) /
            (nD * meanN * meanN))
      }
      val out = p
        .withColumn("r_c", ratio(col("sy_c"), col("sn_c")))
        .withColumn("r_t", ratio(col("sy_t"), col("sn_t")))
        .withColumn("vr_c", varR(col("n_ctl"), col("sy_c"), col("sn_c"),
          col("syy_c"), col("snn_c"), col("syn_c"), col("r_c")))
        .withColumn("vr_t", varR(col("n_trt"), col("sy_t"), col("sn_t"),
          col("syy_t"), col("snn_t"), col("syn_t"), col("r_t")))
        .withColumn("v_sum", col("vr_c") + col("vr_t"))
      out.select(col("n_ctl"), col("n_trt"),
        col("r_c").as("ratio_ctl_cents_per_session"),
        col("r_t").as("ratio_trt_cents_per_session"),
        (col("r_t") - col("r_c")).as("lift_cents_per_session"),
        when(col("v_sum") <= 0.0, lit(null).cast("double"))
          .otherwise(sqrt(col("v_sum"))).as("se_delta"),
        when(col("v_sum") <= 0.0, lit(null).cast("double"))
          .otherwise((col("r_t") - col("r_c")) * (col("r_t") - col("r_c")) /
            col("v_sum")).as("z2"),
        (when(col("v_sum") <= 0.0, lit(null).cast("double"))
          .otherwise((col("r_t") - col("r_c")) * (col("r_t") - col("r_c")) /
            col("v_sum")) > 3.841458820694124).as("significant"))
    }),

    // GROUP-SEQUENTIAL monitoring — the peeking-safe daily readout: a
    // platform that re-tests the conversion z² every day at the fixed
    // 3.84 line inflates false positives severalfold; the sequential
    // boundary spends alpha across looks instead. Per day d: cumulative
    // assigned users (first event ≤ d) and converters (first purchase
    // ≤ d) per arm from per-user first-day histograms + one
    // key-partitioned cumulative window over the ≤O(days) grid; the
    // two-proportion pooled z² is compared to the O'Brien-Fleming-
    // family bound z²(t) = C²/t at information fraction t = cumulative
    // users / final users (Lan-DeMets continuous-monitoring
    // approximation; C = 2.0243 for overall α ≈ 0.05 — C² is the
    // shared literal 4.09779049 so both engines carry the identical
    // double). Everything is exact integers until the divisions;
    // day-0 arms with no users or degenerate pooled p NULL out, both
    // engines. Shape: two fact-table scans (the day-zero fence + one
    // persisted day-stamped projection that the per-user agg and the
    // day spine both read), two ≤days-sized histograms, a 2·days grid
    // window, a 1-row final-total broadcast.
    "events_ab_sequential" -> ((s, d) => {
      val ev = Tables.eventsShared(s, d)
      val g = ev.agg(min(to_date(col("ts"))).as("d0")).withColumn("__k", lit(1))
      // persisted: the per-user pass AND the day spine both read the
      // day-stamped projection, so the fact table is scanned twice in
      // total (the day-zero fence + this materialization), not thrice
      val withDay = ev.withColumn("__k", lit(1)).join(broadcast(g), "__k")
        .withColumn("day", datediff(to_date(col("ts")), col("d0")))
        .select("user_id", "event_type", "day")
        .transform(graft.CachePool.persist)
      val per = withDay
        .groupBy(expr("pmod(user_id, 2)").as("variant"), col("user_id"))
        .agg(min(col("day")).as("fe"),
          min(when(col("event_type") === "purchase", col("day"))).as("fp"))
        .transform(graft.CachePool.persist) // assigned + converter hists
      val aHist = per.groupBy(col("variant"), col("fe").as("day"))
        .agg(count(lit(1)).as("na_d"))
      val cHist = per.filter(col("fp").isNotNull)
        .groupBy(col("variant"), col("fp").as("day"))
        .agg(count(lit(1)).as("nc_d"))
      val days = withDay.select("day").distinct()
      val grid = days.crossJoin(broadcast(
        s.range(0, 2).select(col("id").as("variant"))))
      val wCum = Window.partitionBy("variant").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = grid.join(aHist, Seq("variant", "day"), "left")
        .join(cHist, Seq("variant", "day"), "left")
        .withColumn("na", sum(coalesce(col("na_d"), lit(0L))).over(wCum))
        .withColumn("nc", sum(coalesce(col("nc_d"), lit(0L))).over(wCum))
      def side(vr: Int, c: String) = min(when(col("variant") === vr, col(c)))
      val byDay = cum.groupBy("day").agg(
        side(0, "na").as("n_a"), side(0, "nc").as("conv_a"),
        side(1, "na").as("n_b"), side(1, "nc").as("conv_b"))
      val tot = byDay.agg(max(col("n_a") + col("n_b")).as("n_final"))
        .withColumn("__k", lit(1))
      val pa = col("conv_a").cast("double") / col("n_a").cast("double")
      val pb = col("conv_b").cast("double") / col("n_b").cast("double")
      val p = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      val se2 = p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))
      val z2 = when(col("n_a") === 0L || col("n_b") === 0L,
        lit(null).cast("double"))
        .otherwise(when(se2 <= 0.0, lit(null).cast("double"))
          .otherwise((pa - pb) * (pa - pb) / se2))
      val infoFrac = (col("n_a") + col("n_b")).cast("double") /
        col("n_final").cast("double")
      val bound = lit(4.09779049) / infoFrac
      // FUTILITY line (r13 verdict #6): the beta-spending companion that
      // lets the daily readout STOP a hopeless experiment, not only call
      // a winner. Whitehead-family boundary linear in √t meeting the
      // efficacy line at t = 1: z_fut(t) = (C + z_β)·√t − z_β/√t with
      // C = 2.0243 (the efficacy constant above) and z_β = Φ⁻¹(0.8) =
      // 0.8416212335729143 (power 0.8 — the one extra literal both
      // engines share). Early looks have z_fut < 0 — futility inactive,
      // bound NULL — and NULL z² propagates, the `crossed` convention.
      val zbeta = lit(0.8416212335729143)
      val sqrtT = sqrt(infoFrac)
      val fz = (lit(2.0243) + zbeta) * sqrtT - zbeta / sqrtT
      val boundF = when(fz > 0.0, fz * fz).otherwise(lit(null).cast("double"))
      byDay.withColumn("__k", lit(1)).join(broadcast(tot), "__k")
        .select(col("day").cast("int").as("day"),
          col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          z2.as("z2"), bound.as("bound_z2"), (z2 > bound).as("crossed"),
          boundF.as("bound_futility_z2"),
          (z2 < boundF).as("crossed_futility"))
    }),

    // Continuous-metric experiment readout: Welch's unequal-variance
    // t² on per-user purchase revenue between the two pmod(user_id,2)
    // variants — the value-lift companion to events_ab_readout's
    // conversion χ². Moments stay EXACT decimals (value at cents
    // precision; Σm and Σm² via the unscaled-integer d2 route) until
    // the closed-form t²/df assembly, written as ONE fixed expression
    // tree mirrored verbatim in the oracle so every IEEE rounding
    // lands identically. With per-variant n in the thousands the t
    // reference is ~z, so the 0.05 verdict threshold is z²=3.8415…;
    // df_welch is reported so a reader can check that approximation.
    // Shape: one per-user hash agg, a 2-row variant agg, a 1-row pivot.
    "events_ab_value_ttest" -> ((s, d) => {
      def d2(c: org.apache.spark.sql.Column, scale: Int) = {
        val p = math.pow(10, scale).toLong
        (c * lit(p)).cast("decimal(38,0)").cast("double") / lit(p.toDouble)
      }
      val per = Tables.eventsShared(s, d).groupBy("user_id")
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).as("m"))
      val v = per.groupBy(expr("pmod(user_id, 2)").as("variant"))
        .agg(count(lit(1)).as("n"),
          d2(sum(col("m")), 2).as("s1"),
          d2(sum(col("m") * col("m")), 4).as("s2"))
      def side(vr: Int, c: String) = min(when(col("variant") === vr, col(c)))
      val p = v.agg(
        side(0, "n").as("n_a"), side(0, "s1").as("s1_a"), side(0, "s2").as("s2_a"),
        side(1, "n").as("n_b"), side(1, "s1").as("s1_b"), side(1, "s2").as("s2_b"))
      val meanA = col("s1_a") / col("n_a")
      val meanB = col("s1_b") / col("n_b")
      val varA = (col("s2_a") - col("s1_a") * col("s1_a") / col("n_a")) /
        (col("n_a") - 1)
      val varB = (col("s2_b") - col("s1_b") * col("s1_b") / col("n_b")) /
        (col("n_b") - 1)
      val base = p.select(col("n_a"), col("n_b"), meanA.as("mean_a"),
        meanB.as("mean_b"), varA.as("var_a"), varB.as("var_b"))
      val se2 = col("var_a") / col("n_a") + col("var_b") / col("n_b")
      val t2 = when(col("n_a") < 2 || col("n_b") < 2 || se2 === 0.0, lit(null))
        .otherwise((col("mean_a") - col("mean_b")) *
          (col("mean_a") - col("mean_b")) / se2)
      val dfW = when(col("n_a") < 2 || col("n_b") < 2 || se2 === 0.0, lit(null))
        .otherwise(se2 * se2 /
          ((col("var_a") / col("n_a")) * (col("var_a") / col("n_a")) /
            (col("n_a") - 1) +
           (col("var_b") / col("n_b")) * (col("var_b") / col("n_b")) /
            (col("n_b") - 1)))
      base.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"), t2.as("t_stat2"), dfW.as("df_welch"),
        (t2 > 3.841458820694124).as("significant"))
    }),

    // Holm–Bonferroni step-down across the experiment's METRIC FAMILY —
    // the multiple-comparisons correction every platform applies before
    // calling a multi-metric experiment: four per-user metrics (revenue
    // cents, events, purchases, active days — all exact integers from
    // ONE per-user pass) each get the Welch z² of events_ab_value_ttest,
    // then the metrics are ranked by evidence and compared step-down
    // against χ²₁ quantiles at α/(m−i+1) — shipped as shared literals
    // ((Φ⁻¹(1−α/(2(m−i+1))))², the z-scale route that keeps CDFs out of
    // both engines, the repo's 3.8415 convention). A metric is rejected
    // only while every stronger metric was: the cumulative AND is a
    // running MIN over the 4-row metric relation (bounded partitionless
    // window, whitelisted). Moment portability: Σm² ≤ n·max(m)² ≈ 10¹³
    // at sf0.1 — decimal-exact and < 2^53 as a double with 100× room.
    // Degenerate guards per metric as in the t-test; a NULL z² sorts
    // last and is never rejected. Shape: one per-user hash agg, a 2-row
    // variant agg, a 1-row pivot, a 4-row unpivot + rank.
    "events_ab_holm" -> ((s, d) => {
      val metrics = Seq("rev" -> "revenue_cents", "nev" -> "events_per_user",
        "npur" -> "purchases_per_user", "nday" -> "active_days")
      val per = Tables.eventsShared(s, d).groupBy("user_id").agg(
        coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("rev"),
        count(lit(1)).as("nev"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("npur"),
        countDistinct(to_date(col("ts"))).as("nday"))
      val aggCols = count(lit(1)).as("n") +: metrics.flatMap { case (m, _) =>
        Seq(sum(col(m).cast("decimal(38,0)")).cast("double").as(s"s1_$m"),
          sum((col(m).cast("decimal(19,0)") * col(m)).cast("decimal(38,0)"))
            .cast("double").as(s"s2_$m"))
      }
      val v = per.groupBy(expr("pmod(user_id, 2)").as("variant"))
        .agg(aggCols.head, aggCols.tail: _*)
      def side(vr: Int, c: String) = min(when(col("variant") === vr, col(c)))
      val pcols = Seq(side(0, "n").as("n_a"), side(1, "n").as("n_b")) ++
        metrics.flatMap { case (m, _) =>
          Seq(side(0, s"s1_$m").as(s"s1a_$m"), side(0, s"s2_$m").as(s"s2a_$m"),
            side(1, s"s1_$m").as(s"s1b_$m"), side(1, s"s2_$m").as(s"s2b_$m"))
        }
      val p = v.agg(pcols.head, pcols.tail: _*)
      def z2For(m: String) = {
        val meanA = col(s"s1a_$m") / col("n_a")
        val meanB = col(s"s1b_$m") / col("n_b")
        val varA = (col(s"s2a_$m") - col(s"s1a_$m") * col(s"s1a_$m") /
          col("n_a")) / (col("n_a") - 1)
        val varB = (col(s"s2b_$m") - col(s"s1b_$m") * col(s"s1b_$m") /
          col("n_b")) / (col("n_b") - 1)
        val se2 = varA / col("n_a") + varB / col("n_b")
        when(col("n_a") < 2 || col("n_b") < 2 || se2 === 0.0,
          lit(null).cast("double"))
          .otherwise((meanA - meanB) * (meanA - meanB) / se2)
      }
      val wide = p.select(metrics.map { case (m, nm) =>
        z2For(m).as(s"z2_$m") }: _*)
      val stackArgs = metrics.map { case (m, nm) => s"'$nm', z2_$m" }
        .mkString(", ")
      val long = wide.selectExpr(
        s"stack(${metrics.size}, $stackArgs) AS (metric, z2)")
      // Holm thresholds: (Φ⁻¹(1 − 0.05/(2·(m−i+1))))² for i = 1..4
      val thresholds = Seq(6.23853263690954, 5.731139281939075,
        5.0238861873148934, 3.8414588206941236)
      val wR = Window.orderBy(col("z2").desc_nulls_last, col("metric"))
      val wCum = Window.orderBy(col("holm_rank"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val thr = thresholds.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (acc, (t, i)) => when(col("holm_rank") === i + 1, lit(t))
          .otherwise(acc)
      }
      val pass = when(col("z2").isNotNull && col("z2") > col("threshold"),
        lit(1)).otherwise(lit(0))
      long.withColumn("holm_rank", row_number().over(wR))
        .withColumn("threshold", thr)
        .withColumn("rejected", min(pass).over(wCum) === 1)
        .select(col("metric"), col("z2"), col("holm_rank"),
          col("threshold"), col("rejected"))
    }),

    // Mann–Whitney U — the rank-based nonparametric companion to the
    // Welch test above: compares the A/B revenue DISTRIBUTIONS without
    // the normality lean, which is exactly where heavy-tailed revenue
    // misleads a t-test. The rank machinery is EXACT and histogram-
    // shaped: per distinct cent-total tie group of size t, the shared
    // average rank is cum_below + (t+1)/2, so DOUBLED rank sums are
    // integers — 2·R_A = Σ ca·(2·cum_below + t + 1), accumulated in
    // decimal (the addend passes 2^63 near 10⁹ users); the normal
    // approximation carries the standard Σ(t³−t) tie correction, also
    // decimal. Money-grade totals tie far less than the decile grids,
    // so the histogram can approach O(users) distinct rows — r12 moved
    // the cum_below pass onto the Boundaries distributed prefix-sum
    // (range-partitioned; no single-task window), and the z readout
    // gained the repo's degenerate guard (≤1 user total, or an empty
    // arm, has no sampling distribution: NULL, matching the oracle —
    // Spark's raw IEEE division would say NaN/±Inf where DuckDB's
    // NULL-propagating arithmetic stays NULL).
    "events_ab_mannwhitney" -> ((s, d) => {
      val per = Tables.eventsShared(s, d).groupBy("user_id")
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("long"))), lit(0L)).as("v"))
        .select(expr("pmod(user_id, 2)").as("variant"), col("v"))
      val hist = per.groupBy("v")
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ca"),
          count(lit(1)).as("ct"))
      val agg1 = Boundaries
        .prefixSum(hist, "v", "ct", "cum_below", inclusive = false)
        .agg(sum("ca").as("n_a"), sum(col("ct") - col("ca")).as("n_b"),
          sum(col("ca").cast("decimal(19,0)") *
            (lit(2) * col("cum_below") + col("ct") + 1))
            .cast("decimal(38,0)").cast("double").as("two_ra"),
          sum(col("ct").cast("decimal(19,0)") * col("ct") * col("ct")
            - col("ct"))
            .cast("decimal(38,0)").cast("double").as("tie_cubes"))
      val nA = col("n_a").cast("double")
      val nB = col("n_b").cast("double")
      val n = nA + nB
      val withU = agg1.withColumn("u_a",
        (col("two_ra") -
          (col("n_a").cast("decimal(19,0)") * (col("n_a") + 1))
            .cast("double")) / 2.0)
      // varTerm = 0 exactly when EVERY total ties (tie_cubes = n³−n):
      // z would be 0/0 = NaN in Spark where DuckDB's NULL-propagating
      // division stays NULL — the same engine split the arm guards
      // cover, one case further out (r12 review)
      val varTerm = (n + 1.0) - col("tie_cubes") / (n * (n - 1.0))
      withU.select(col("n_a"), col("n_b"), col("u_a"),
        when(col("n_a") + col("n_b") <= 1L ||
          col("n_a") === 0L || col("n_b") === 0L ||
          varTerm <= 0.0, lit(null).cast("double"))
          .otherwise(
            (col("u_a") - nA * nB / 2.0) /
              sqrt(nA * nB / 12.0 * varTerm)).as("z"))
    }),

    // Attribution-model readout over purchase segments: each purchase
    // owns the clicks since the user's PREVIOUS purchase (gaps-and-
    // islands segmentation — seg = count of purchases strictly before
    // the row, so clicks and their converting purchase share a key and
    // first-touch/last-touch are min/max event_id within it). Reports
    // how many purchases are attributable at all, how many are
    // single-touch (the two classic models agree), and the mean click
    // path length where attribution exists. ONE user-partitioned window
    // pass + a (user, seg)-co-partitioned left join — never a per-pair
    // range probe; the report is a 1-row integer aggregate.
    "events_attribution" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = Tables.eventsShared(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("seg", coalesce(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(byUser), lit(0L)))
        .transform(graft.CachePool.persist) // click pass + purchase pass
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "seg")
        .agg(count(lit(1)).as("n_clicks"),
          min("event_id").as("first_click"), max("event_id").as("last_click"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select("user_id", "seg")
      buys.join(clicks, Seq("user_id", "seg"), "left")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("n_clicks").isNotNull, 1L).otherwise(0L))
            .as("n_attributed"),
          sum(when(col("first_click") === col("last_click"), 1L)
            .otherwise(0L)).as("n_single_touch"),
          coalesce(sum("n_clicks"), lit(0L)).as("total_clicks"))
        .select(col("n_purchases"), col("n_attributed"),
          col("n_single_touch"), col("total_clicks"),
          (col("n_attributed").cast("double") /
            col("n_purchases").cast("double")).as("share_attributed"),
          when(col("n_attributed") === 0L, lit(null))
            .otherwise(col("total_clicks").cast("double") /
              col("n_attributed").cast("double")).as("avg_clicks_per_attributed"))
    }),

    // Retention-vs-delay decision table for streaming watermark sizing.
    "events_watermark_policy" -> ((s, d) => {
      val delays = Array(0L, 60L * 1000000L, 300L * 1000000L,
        3600L * 1000000L, 21600L * 1000000L, 86400L * 1000000L)
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.eventsShared(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("lateness_us",
          greatest(lit(0L), coalesce(max("us").over(w) - col("us"), lit(0L))))
        .select(col("lateness_us"), explode(lit(delays)).as("delay_us"))
        .groupBy("delay_us")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("lateness_us") <= col("delay_us"), 1L).otherwise(0L))
            .as("n_retained"))
        .withColumn("retain_share",
          col("n_retained").cast("double") / col("n_events").cast("double"))
    }),

    // The lateness DISTRIBUTION behind the watermark policy table:
    // exact p50/p95/p99/max of per-row event-time lateness, per event
    // type — the percentile view that picks the delay candidates the
    // policy table then evaluates. Same user-partitioned running max;
    // the percentile aggregation sees (type, lateness) rows only.
    "events_lag_percentiles" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.eventsShared(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("lateness_us",
          greatest(lit(0L), coalesce(max("us").over(w) - col("us"), lit(0L))))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          expr("percentile(lateness_us, array(0.5D, 0.95D, 0.99D))")
            .as("ps"),
          max("lateness_us").as("max_lateness_us"))
        .select(col("event_type"), col("n_events"),
          col("ps").getItem(0).as("p50_us"),
          col("ps").getItem(1).as("p95_us"),
          col("ps").getItem(2).as("p99_us"),
          col("max_lateness_us"))
    }),

    // Seasonal-naive forecast backtest per day-of-week.
    "events_forecast_naive" -> ((s, d) => {
      val daily = Tables.eventsShared(s, d)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      val pred = daily.select(date_add(col("day"), 7).as("day"),
        col("n").as("pred"))
      daily.join(pred, "day")
        .groupBy(dayofweek(col("day")).as("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n") - col("pred"))).as("abs_err_total"),
          sum(col("n") - col("pred")).as("bias_total"))
        .withColumn("mae",
          col("abs_err_total").cast("double") / col("n_days"))
    }),

    // Linear-trend forecast — the forecast family's OLS tier: per
    // event type, fit daily volume ~ epoch-day by least squares from
    // EXACT integer power sums (the agg_regr_slope algebra: slope =
    // (nΣty − ΣtΣy) / (nΣt² − (Σt)²), every sum a BIGINT well under
    // 2^53, so the two IEEE divisions are the only float steps and
    // both engines compute identical doubles), then project 7 days
    // past the last observed day. Zero-variance guard: a type seen on
    // a single day has no trend — slope/predicted go NULL, never ±Inf
    // (the r9 advice convention). One hash aggregation over O(types ×
    // days) rows; the ×7 horizon explode is map-side.
    "events_forecast_linear" -> ((s, d) => {
      val daily = Tables.eventsShared(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("long").as("t"),
          col("y"))
      daily.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("t").as("st"),
          sum(col("t") * col("t")).as("stt"),
          sum("y").as("sy"), sum(col("t") * col("y")).as("sty"),
          max("t").as("tmax"))
        .withColumn("den", col("n") * col("stt") - col("st") * col("st"))
        .withColumn("slope",
          when(col("den") === 0L, lit(null).cast("double"))
            .otherwise((col("n") * col("sty") - col("st") * col("sy"))
              .cast("double") / col("den").cast("double")))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("st").cast("double"))
            / col("n").cast("double"))
        .withColumn("h", explode(sequence(lit(1), lit(7))))
        .select(col("event_type"), col("h").cast("int").as("horizon"),
          date_add(lit("1970-01-01").cast("date"),
            (col("tmax") + col("h")).cast("int")).as("forecast_day"),
          (col("intercept") + col("slope") *
            (col("tmax") + col("h")).cast("double")).as("predicted"))
    }),

    // Hour-of-day seasonality test: per event type, Pearson's χ²
    // against the uniform-over-24-hours null. With E = N/24 constant,
    // Σ(O−E)²/E collapses algebraically to 24·ΣO²/N − N — so missing
    // hours need no backfill row (they contribute 0 to ΣO² and the
    // identity still holds), the statistic is built from ONE integer
    // power sum, and the only float steps are a division and a
    // subtraction mirrored verbatim in the oracle. Overflow: ΣO² ≤ N²
    // needs N < 6e8 per type — rescale to DECIMAL accumulation past
    // that. Threshold is the standard χ²(df=23, 0.95) table value;
    // both engines compare against the identical literal, so the
    // boolean is engine-exact regardless of the constant's provenance.
    // Shape: O(types × 24) aggregation rows after one hash agg.
    "events_hourly_seasonality" -> ((s, d) => {
      val byHour = Tables.eventsShared(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("o"))
      byHour.groupBy("event_type")
        .agg(sum("o").as("n_events"),
          count(lit(1)).as("hours_present"),
          max("o").as("max_hourly"),
          sum(col("o") * col("o")).as("sum_sq"))
        .withColumn("chi2",
          (lit(24L) * col("sum_sq")).cast("double") /
            col("n_events").cast("double") -
            col("n_events").cast("double"))
        .withColumn("uniform_rejected", col("chi2") > 35.17246162690806)
    }),

    // Experiment power analysis — the planning companion to
    // events_ab_value_ttest: from the SAME per-user purchase-revenue
    // moments (exact decimal Σm, Σm² via the d2 route), how many users
    // per arm does a future test need to detect a 5%-of-mean lift at
    // α=0.05 two-sided, power 0.8? n = ⌈2(z_α+z_β)²·σ²/δ²⌉ with the
    // z-sum constant precomputed once in Scala and embedded as the
    // SAME round-trip literal in both engines (Double.toString
    // round-trips exactly; DuckDB parses it to the identical double),
    // so the one IEEE expression tree is mirrored verbatim. Degenerate
    // guard: zero mean or zero variance → NULL n_required, never ÷0.
    // Shape: one per-user hash agg + a 1-row global aggregate.
    "events_power_analysis" -> ((s, d) => {
      def d2(c: org.apache.spark.sql.Column, scale: Int) = {
        val p = math.pow(10, scale).toLong
        (c * lit(p)).cast("decimal(38,0)").cast("double") / lit(p.toDouble)
      }
      val per = Tables.eventsShared(s, d).groupBy("user_id")
        .agg(coalesce(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).as("m"))
      val g = per.agg(count(lit(1)).as("n_users"),
        d2(sum(col("m")), 2).as("s1"),
        d2(sum(col("m") * col("m")), 4).as("s2"))
      val mean = col("s1") / col("n_users")
      val varr = (col("s2") - col("s1") * col("s1") / col("n_users")) /
        (col("n_users") - 1)
      val base = g.select(col("n_users"), mean.as("mean_rev"),
        varr.as("var_rev"))
      val delta = lit(0.05) * col("mean_rev")
      val nReq = when(col("mean_rev") === 0.0 || col("var_rev") === 0.0,
        lit(null).cast("long"))
        .otherwise(ceil(lit(Stats.POWER_K) * col("var_rev") /
          (delta * delta)).cast("long"))
      base.select(col("n_users"), col("mean_rev"), col("var_rev"),
        delta.as("mde_abs"), nReq.as("n_required_per_arm"))
    })
  )

  /** 2·(z₀.₀₂₅ + z₀.₂)² for the power-analysis sample-size formula —
    * computed once here so the Spark literal and the oracle's embedded
    * decimal literal are the SAME double (Double.toString round-trips).
    */
  val POWER_K: Double = {
    val za = 1.959963984540054 // Φ⁻¹(0.975)
    val zb = 0.8416212335729143 // Φ⁻¹(0.8)
    2.0 * (za + zb) * (za + zb)
  }

  /** events_ab_holm oracle: the identical per-user metric pass, variant
    * moments, pivot, one Welch z² block per metric (the value-ttest
    * tree verbatim), UNION-unpivot, rank, and the running-MIN step-down
    * — thresholds are the same shared literals the Spark side ships.
    */
  private lazy val eventsAbHolmSql = {
    val mets = Seq("rev" -> "revenue_cents", "nev" -> "events_per_user",
      "npur" -> "purchases_per_user", "nday" -> "active_days")
    val thresholds = Seq(6.23853263690954, 5.731139281939075,
      5.0238861873148934, 3.8414588206941236)
    val s1s2 = mets.map { case (m, _) =>
      s"""CAST(SUM(CAST($m AS DECIMAL(38,0))) AS DOUBLE) AS s1_$m,
         |    CAST(SUM(CAST($m AS DECIMAL(19,0)) * $m) AS DOUBLE) AS s2_$m""".stripMargin
    }.mkString(",\n    ")
    val pivots = mets.map { case (m, _) =>
      s"""MIN(CASE WHEN variant = 0 THEN s1_$m END) AS s1a_$m,
         |    MIN(CASE WHEN variant = 0 THEN s2_$m END) AS s2a_$m,
         |    MIN(CASE WHEN variant = 1 THEN s1_$m END) AS s1b_$m,
         |    MIN(CASE WHEN variant = 1 THEN s2_$m END) AS s2b_$m""".stripMargin
    }.mkString(",\n    ")
    val rows = mets.map { case (m, nm) =>
      val varA = s"(s2a_$m - s1a_$m * s1a_$m / n_a) / (n_a - 1)"
      val varB = s"(s2b_$m - s1b_$m * s1b_$m / n_b) / (n_b - 1)"
      val se2 = s"($varA) / n_a + ($varB) / n_b"
      val diff = s"(s1a_$m / n_a - s1b_$m / n_b)"
      s"""SELECT '$nm' AS metric,
         |  CASE WHEN n_a < 2 OR n_b < 2 OR $se2 = 0 THEN NULL
         |    ELSE $diff * $diff / ($se2) END AS z2
         |FROM p""".stripMargin
    }.mkString("\nUNION ALL\n")
    // `e0` forces a DOUBLE literal: DuckDB parses a bare 17-digit
    // decimal literal as DECIMAL(17,16), whose cast to double lands one
    // ulp off the correctly-rounded string parse Spark's lit() does
    val thrCase = thresholds.zipWithIndex.map { case (t, i) =>
      s"WHEN ${i + 1} THEN ${t}e0"
    }.mkString(" ")
    s"""WITH per AS (SELECT user_id,
       |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS rev,
       |    COUNT(*) AS nev,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS npur,
       |    COUNT(DISTINCT CAST(ts AS DATE)) AS nday
       |  FROM events GROUP BY user_id),
       |v AS (SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS n,
       |    $s1s2
       |  FROM per GROUP BY 1),
       |p AS (SELECT
       |    MIN(CASE WHEN variant = 0 THEN n END) AS n_a,
       |    MIN(CASE WHEN variant = 1 THEN n END) AS n_b,
       |    $pivots
       |  FROM v),
       |u AS ($rows),
       |r AS (SELECT metric, z2, row_number() OVER (
       |    ORDER BY z2 DESC NULLS LAST, metric) AS holm_rank FROM u),
       |t AS (SELECT metric, z2, CAST(holm_rank AS INT) AS holm_rank,
       |    CASE holm_rank $thrCase END AS threshold FROM r)
       |SELECT metric, z2, holm_rank, threshold,
       |  MIN(CASE WHEN z2 IS NOT NULL AND z2 > threshold THEN 1 ELSE 0 END)
       |    OVER (ORDER BY holm_rank
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
       |    AS rejected
       |FROM t""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "events_cum_users" ->
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT day, COUNT(*) AS n_new_users FROM f GROUP BY day)
        |SELECT day, n_new_users,
        |  CAST(SUM(n_new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM d""".stripMargin,

    "events_dow_mix" ->
      """WITH a AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |    event_type, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, event_type, n_events,
        |  CAST(n_events AS DOUBLE) /
        |    CAST(SUM(n_events) OVER (PARTITION BY dow) AS DOUBLE) AS share
        |FROM a""".stripMargin,

    "agg_mode_per_group" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_rows
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n_rows
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY n_rows DESC, o_orderpriority) AS rn FROM c) t
        |WHERE rn = 1""".stripMargin,

    "window_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |    AS pct_rank,
        |  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |    AS cume
        |FROM customer""".stripMargin,

    "agg_median_abs_dev" ->
      """WITH m AS (SELECT o_orderstatus,
        |    quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderstatus, MAX(med) AS med,
        |  quantile_cont(abs(o.o_totalprice - med), 0.5) AS mad
        |FROM orders o JOIN m USING (o_orderstatus)
        |GROUP BY o.o_orderstatus""".stripMargin,

    "text_hapax" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok)
        |SELECT COUNT(*) AS n_vocab,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS hapax_share
        |FROM c""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT user_id // 64) AS n_buckets
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_regr_slope" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(x) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS sx,
        |    CAST(CAST(SUM(y) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS sy,
        |    CAST(CAST(SUM(x * x) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS sxx,
        |    CAST(CAST(SUM(y * y) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS syy,
        |    CAST(CAST(SUM(x * y) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS sxy
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |        FROM lineitem) t
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |    END AS intercept,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |    ELSE ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |      ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
        |FROM s""".stripMargin,

    "agg_skewness" ->
      """WITH s AS (
        |  -- int128→double via the exact decimal STRING (the
        |  -- profile_outliers convention): correctly rounded at any
        |  -- magnitude, matching Spark's BigDecimal→double exactly.
        |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(c * c) AS VARCHAR) AS DOUBLE) AS s2,
        |    CAST(CAST(SUM(c * c * c) AS VARCHAR) AS DOUBLE) AS s3,
        |    CAST(CAST(SUM(c * c * c * c) AS VARCHAR) AS DOUBLE) AS s4
        |  FROM (SELECT l_returnflag,
        |          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |        FROM lineitem) t
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  CASE WHEN s2 / n - (s1 / n) * (s1 / n) = 0 THEN NULL ELSE
        |  (s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n)))
        |    END AS skewness,
        |  CASE WHEN s2 / n - (s1 / n) * (s1 / n) = 0 THEN NULL ELSE
        |  (s4 / n - 4.0 * (s1 / n) * (s3 / n)
        |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))
        |    - 3.0 END AS excess_kurtosis
        |FROM s""".stripMargin,

    "events_lifecycle" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(DATE_TRUNC('week', ts) AS DATE) AS wk FROM events),
        |r AS (SELECT user_id, wk,
        |    LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
        |    LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        |  FROM wk),
        |st AS (
        |  SELECT wk, CASE WHEN prev_wk IS NULL THEN 'new'
        |      WHEN DATEDIFF('day', prev_wk, wk) = 7 THEN 'retained'
        |      ELSE 'resurrected' END AS status
        |  FROM r
        |  UNION ALL
        |  SELECT wk + 7 AS wk, 'churned' AS status FROM r
        |  WHERE next_wk IS NULL OR DATEDIFF('day', wk, next_wk) > 7)
        |SELECT wk,
        |  CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
        |  CAST(SUM(CASE WHEN status IN ('new', 'retained', 'resurrected')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_active
        |FROM st GROUP BY wk""".stripMargin,

    "events_hour_of_day" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_value
        |FROM events GROUP BY 1""".stripMargin,

    "events_stickiness" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM days GROUP BY day),
        |ex AS (SELECT DISTINCT user_id,
        |    CAST(unnest(generate_series(day, day + 27, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM days),
        |mau AS (SELECT day, COUNT(*) AS mau28 FROM ex GROUP BY day)
        |SELECT day, dau, mau28,
        |  CAST(dau AS DOUBLE) / CAST(mau28 AS DOUBLE) AS stickiness
        |FROM dau JOIN mau USING (day)""".stripMargin,

    "events_cohort_ltv" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(DATE_TRUNC('week', ts) AS DATE) AS wk,
        |    CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1),
        |sz AS (SELECT cohort_week, COUNT(*) AS n_cohort_users FROM c GROUP BY 1),
        |cells AS (SELECT cohort_week,
        |    DATEDIFF('day', cohort_week, wk) // 7 AS week_offset,
        |    SUM(v) AS rev_dec
        |  FROM ev JOIN c USING (user_id) GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, week_offset, rev_dec,
        |    SUM(rev_dec) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
        |  FROM cells)
        |SELECT cohort_week, week_offset, n_cohort_users,
        |  CAST(CAST(rev_dec * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS revenue,
        |  CAST(CAST(cum_dec * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100
        |    / n_cohort_users AS cum_ltv_per_user
        |FROM cum JOIN sz USING (cohort_week)""".stripMargin,

    "events_out_of_order" ->
      """WITH m AS (SELECT user_id, ts,
        |    MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS late_share
        |FROM m GROUP BY user_id""".stripMargin,

    "agg_winsorized_mean" ->
      """WITH base AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |b AS (SELECT o_orderpriority, quantile_cont(c, [0.05, 0.95]) AS ps
        |  FROM base GROUP BY 1),
        |b2 AS (SELECT o_orderpriority, ps[1] AS lo, ps[2] AS hi FROM b),
        |g AS (SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |    CAST(SUM(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |    -- hugeint→double via the exact decimal STRING (the
        |    -- profile_outliers convention)
        |    CAST(CAST(SUM(CASE WHEN c >= lo AND c <= hi THEN c ELSE 0 END)
        |      AS VARCHAR) AS DOUBLE) AS mid,
        |    MAX(lo) AS lo, MAX(hi) AS hi
        |  FROM base JOIN b2 USING (o_orderpriority)
        |  GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n, n_below, n_above,
        |  (n_below * lo + n_above * hi + mid) / n / 100.0 AS winsorized_mean
        |FROM g""".stripMargin,

    "events_ab_readout" ->
      """WITH per AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |v AS (SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS n_users,
        |    CAST(SUM(converted) AS BIGINT) AS n_converted
        |  FROM per GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS total_users FROM v)
        |SELECT variant, n_users, n_converted,
        |  CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
        |  ((CAST(n_users AS DOUBLE) - CAST(total_users AS DOUBLE) / 2.0)
        |    * (CAST(n_users AS DOUBLE) - CAST(total_users AS DOUBLE) / 2.0))
        |    / (CAST(total_users AS DOUBLE) / 2.0) AS srm_component
        |FROM v, t""".stripMargin,

    "events_survival_curve" ->
      """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
        |    MIN(CASE WHEN event_type = 'purchase'
        |        THEN CAST(ts AS DATE) END) AS pd,
        |    MAX(CAST(ts AS DATE)) AS ld
        |  FROM events GROUP BY user_id),
        |lt AS (SELECT CAST(CASE WHEN pd IS NOT NULL
        |      THEN datediff('day', fd, pd)
        |      ELSE datediff('day', fd, ld) END AS INT) AS l,
        |    CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS converted
        |  FROM u),
        |hist AS (SELECT l, COUNT(*) AS n_total,
        |    CAST(SUM(converted) AS BIGINT) AS n_converted
        |  FROM lt GROUP BY l),
        |cum AS (SELECT l, n_total, n_converted,
        |    CAST(SUM(n_total) OVER (ORDER BY l DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_at_risk,
        |    row_number() OVER (ORDER BY l) AS rn
        |  FROM hist),
        |fa AS (SELECT array_agg(
        |    1.0 - CAST(n_converted AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
        |    ORDER BY l) AS farr FROM cum)
        |SELECT l AS day_offset, n_at_risk, n_converted,
        |  CAST(n_converted AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard,
        |  list_reduce(list_prepend(1.0, farr[1:rn]), (x, y) -> x * y)
        |    AS survival
        |FROM cum CROSS JOIN fa""".stripMargin,

    "agg_weighted_median" ->
      """WITH hist AS (SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS total_w,
        |    COUNT(*) AS n_distinct_q
        |  FROM hist GROUP BY 1),
        |cum AS (SELECT l_returnflag, q, w,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cw
        |  FROM hist),
        |med AS (SELECT cum.l_returnflag,
        |    CAST(MIN(q) AS DOUBLE) AS weighted_median_qty
        |  FROM cum JOIN tot ON cum.l_returnflag = tot.l_returnflag
        |  WHERE cw * 2 >= total_w GROUP BY 1)
        |SELECT l_returnflag, n_distinct_q, total_w, weighted_median_qty
        |FROM tot JOIN med USING (l_returnflag)""".stripMargin,

    // Same weighted-rank rule at k=4: boundary_i = min q whose
    // 4·cum(weight) ≥ i·total within the flag.
    "agg_weighted_quartiles" ->
      """WITH h AS (SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, q,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cw
        |  FROM h),
        |t AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS tw
        |  FROM h GROUP BY 1),
        |k AS (SELECT l_returnflag, CAST(i AS INT) AS quartile, tw
        |  FROM t, (SELECT unnest(generate_series(1, 3)) AS i) si)
        |SELECT k.l_returnflag, quartile,
        |  CAST(MIN(q) AS DOUBLE) AS boundary_qty
        |FROM k JOIN c ON k.l_returnflag = c.l_returnflag
        |  AND c.cw * 4 >= k.quartile * k.tw
        |GROUP BY 1, 2""".stripMargin,

    // Same first-day histograms, same cumulative grid, same pooled-z²
    // and C²/t boundary expression trees (C² = the shared 4.09779049
    // literal).
    "events_ab_sequential" ->
      """WITH g AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |per AS (SELECT ((user_id % 2) + 2) % 2 AS variant, user_id,
        |    MIN(date_diff('day', d0, CAST(ts AS DATE))) AS fe,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN date_diff('day', d0, CAST(ts AS DATE)) END) AS fp
        |  FROM events, g GROUP BY 1, 2),
        |ah AS (SELECT variant, fe AS day, COUNT(*) AS na_d
        |  FROM per GROUP BY 1, 2),
        |ch AS (SELECT variant, fp AS day, COUNT(*) AS nc_d
        |  FROM per WHERE fp IS NOT NULL GROUP BY 1, 2),
        |days AS (SELECT DISTINCT date_diff('day', d0, CAST(ts AS DATE))
        |    AS day FROM events, g),
        |grid AS (SELECT day, variant FROM days,
        |  (SELECT unnest(generate_series(0, 1)) AS variant) v),
        |cum AS (SELECT variant, day,
        |    CAST(SUM(COALESCE(na_d, 0)) OVER w AS BIGINT) AS na,
        |    CAST(SUM(COALESCE(nc_d, 0)) OVER w AS BIGINT) AS nc
        |  FROM grid LEFT JOIN ah USING (variant, day)
        |    LEFT JOIN ch USING (variant, day)
        |  WINDOW w AS (PARTITION BY variant ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |bd AS (SELECT day,
        |    MIN(CASE WHEN variant = 0 THEN na END) AS n_a,
        |    MIN(CASE WHEN variant = 0 THEN nc END) AS conv_a,
        |    MIN(CASE WHEN variant = 1 THEN na END) AS n_b,
        |    MIN(CASE WHEN variant = 1 THEN nc END) AS conv_b
        |  FROM cum GROUP BY 1),
        |tot AS (SELECT MAX(n_a + n_b) AS n_final FROM bd),
        |x AS (SELECT bd.*, n_final,
        |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |    CAST(conv_a + conv_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE) AS p,
        |    CAST(n_a + n_b AS DOUBLE) / CAST(n_final AS DOUBLE) AS t
        |  FROM bd, tot),
        |y AS (SELECT *,
        |    CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |      WHEN p * (1.0 - p) * (1.0 / CAST(n_a AS DOUBLE)
        |        + 1.0 / CAST(n_b AS DOUBLE)) <= 0.0 THEN NULL
        |      ELSE (pa - pb) * (pa - pb)
        |        / (p * (1.0 - p) * (1.0 / CAST(n_a AS DOUBLE)
        |          + 1.0 / CAST(n_b AS DOUBLE))) END AS z2,
        |    4.09779049 / t AS bound_z2,
        |    (2.0243 + 0.8416212335729143) * sqrt(t)
        |      - 0.8416212335729143 / sqrt(t) AS fz
        |  FROM x)
        |SELECT CAST(day AS INT) AS day, n_a, n_b, conv_a, conv_b,
        |  z2, bound_z2, z2 > bound_z2 AS crossed,
        |  CASE WHEN fz > 0.0 THEN fz * fz END AS bound_futility_z2,
        |  z2 < (CASE WHEN fz > 0.0 THEN fz * fz END) AS crossed_futility
        |FROM y""".stripMargin,

    // Same doubled-rank histogram algebra; pmod ↔ ((x % 2) + 2) % 2 is
    // the family's variant convention.
    "events_ab_mannwhitney" ->
      """WITH per AS (SELECT user_id,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0) AS v
        |  FROM events GROUP BY user_id),
        |pv AS (SELECT ((user_id % 2) + 2) % 2 AS variant, v FROM per),
        |hist AS (SELECT v,
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    COUNT(*) AS ct
        |  FROM pv GROUP BY v),
        |cum AS (SELECT *, COALESCE(SUM(ct) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
        |  FROM hist),
        |a AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(ct - ca) AS BIGINT) AS n_b,
        |    CAST(CAST(SUM(CAST(ca AS DECIMAL(19,0))
        |      * (2 * cum_below + ct + 1)) AS DECIMAL(38,0)) AS DOUBLE)
        |      AS two_ra,
        |    CAST(CAST(SUM(CAST(ct AS DECIMAL(19,0)) * ct * ct - ct)
        |      AS DECIMAL(38,0)) AS DOUBLE) AS tie_cubes
        |  FROM cum),
        |u AS (SELECT n_a, n_b, tie_cubes,
        |    (two_ra - CAST(CAST(n_a AS DECIMAL(19,0)) * (n_a + 1) AS DOUBLE))
        |      / 2.0 AS u_a
        |  FROM a)
        |SELECT n_a, n_b, u_a,
        |  CASE WHEN n_a + n_b <= 1 OR n_a = 0 OR n_b = 0
        |      OR ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
        |          - tie_cubes / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))
        |        <= 0.0 THEN NULL
        |    ELSE (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
        |      sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
        |        ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
        |          - tie_cubes / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))
        |    END AS z
        |FROM u""".stripMargin,

    // Same midpoint split, same conditional pivot, same one fixed
    // subtraction tree.
    "events_ab_did" ->
      """WITH g AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
        |    MAX(CAST(ts AS DATE)) AS d1 FROM events),
        |cells AS (SELECT ((user_id % 2) + 2) % 2 AS variant,
        |    date_diff('day', d0, CAST(ts AS DATE)) * 2
        |      > date_diff('day', d0, d1) AS post,
        |    COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
        |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sc
        |  FROM events, g WHERE event_type = 'purchase' GROUP BY 1, 2),
        |p AS (SELECT
        |    MIN(CASE WHEN variant = 0 AND NOT post THEN n END) AS n_ctl_pre,
        |    MIN(CASE WHEN variant = 0 AND post THEN n END) AS n_ctl_post,
        |    MIN(CASE WHEN variant = 1 AND NOT post THEN n END) AS n_trt_pre,
        |    MIN(CASE WHEN variant = 1 AND post THEN n END) AS n_trt_post,
        |    MIN(CASE WHEN variant = 0 AND NOT post THEN sc / n / 100.0 END)
        |      AS mean_ctl_pre,
        |    MIN(CASE WHEN variant = 0 AND post THEN sc / n / 100.0 END)
        |      AS mean_ctl_post,
        |    MIN(CASE WHEN variant = 1 AND NOT post THEN sc / n / 100.0 END)
        |      AS mean_trt_pre,
        |    MIN(CASE WHEN variant = 1 AND post THEN sc / n / 100.0 END)
        |      AS mean_trt_post
        |  FROM cells)
        |SELECT *, (mean_trt_post - mean_trt_pre)
        |  - (mean_ctl_post - mean_ctl_pre) AS did
        |FROM p""".stripMargin,

    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u)
        |SELECT n_a, n_b,
        |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE) AS chi2,
        |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE) > 3.841458820694124 AS srm_detected
        |FROM c""".stripMargin,

    // Per-arm value-at-rank extraction with the quantile index i kept
    // through the walk (r13): a collapsed rank (tiny arm) leaves ITS
    // quartile NULL via the spine left-join — not the top one, which is
    // where the old positional list-index form shifted it.
    "events_ab_qte" ->
      """WITH per AS (SELECT ((user_id % 2) + 2) % 2 AS variant,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0)
        |      AS BIGINT) AS v
        |  FROM events GROUP BY user_id),
        |rk AS (SELECT variant, v,
        |    row_number() OVER (PARTITION BY variant ORDER BY v) AS rn
        |  FROM per),
        |rs AS (SELECT variant, CAST(i AS INT) AS i, (i * nn) // 4 AS rk2
        |  FROM (SELECT variant, COUNT(*) AS nn FROM per GROUP BY 1) n,
        |       (SELECT unnest(generate_series(1, 3)) AS i) si
        |  WHERE (i * nn) // 4 >= 1),
        |q AS (SELECT rs.variant, rs.i, rk.v AS bv
        |  FROM rs JOIN rk ON rk.variant = rs.variant AND rk.rn = rs.rk2)
        |SELECT spine.quartile,
        |  qc.bv AS q_ctl_cents, qt.bv AS q_trt_cents,
        |  qt.bv - qc.bv AS qte_cents
        |FROM (SELECT CAST(unnest(generate_series(1, 3)) AS INT)
        |    AS quartile) spine
        |LEFT JOIN (SELECT i, bv FROM q WHERE variant = 0) qc
        |  ON spine.quartile = qc.i
        |LEFT JOIN (SELECT i, bv FROM q WHERE variant = 1) qt
        |  ON spine.quartile = qt.i""".stripMargin,

    // Same 30-minute-gap sessions, same six exact moments per arm, same
    // delta-method expression tree (r substituted as sy/sn — identical
    // under the variance guard, which already excludes sn <= 0).
    "events_ab_ratio_delta" -> {
      def varRSql(n: String, sy: String, sn: String, syy: String,
                  snn: String, syn: String) = {
        val nd = s"CAST($n AS DOUBLE)"
        val r = s"($sy / $sn)"
        s"""CASE WHEN $n < 2 OR $sn <= 0.0 THEN NULL ELSE
           |  ((($syy - $sy * $sy / $nd) / ($nd - 1.0))
           |   - 2.0 * $r * (($syn - $sy * $sn / $nd) / ($nd - 1.0))
           |   + $r * $r * (($snn - $sn * $sn / $nd) / ($nd - 1.0)))
           |  / ($nd * ($sn / $nd) * ($sn / $nd)) END""".stripMargin
      }
      s"""WITH g AS (SELECT user_id, event_type, value,
         |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
         |        PARTITION BY user_id ORDER BY event_id)) > 1800 * 1000000
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |per AS (SELECT user_id,
         |    CAST(SUM(new_session) + 1 AS BIGINT) AS nses,
         |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0)
         |      AS BIGINT) AS y
         |  FROM g GROUP BY user_id),
         |a AS (SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS n,
         |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS DOUBLE) AS sy,
         |    CAST(CAST(SUM(CAST(nses AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS DOUBLE) AS sn,
         |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0)) * y
         |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS syy,
         |    CAST(CAST(SUM(CAST(CAST(nses AS DECIMAL(19,0)) * nses
         |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS snn,
         |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0)) * nses
         |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS syn
         |  FROM per GROUP BY 1),
         |p AS (SELECT
         |    MIN(CASE WHEN variant = 0 THEN n END) AS n_ctl,
         |    MIN(CASE WHEN variant = 0 THEN sy END) AS sy_c,
         |    MIN(CASE WHEN variant = 0 THEN sn END) AS sn_c,
         |    MIN(CASE WHEN variant = 0 THEN syy END) AS syy_c,
         |    MIN(CASE WHEN variant = 0 THEN snn END) AS snn_c,
         |    MIN(CASE WHEN variant = 0 THEN syn END) AS syn_c,
         |    MIN(CASE WHEN variant = 1 THEN n END) AS n_trt,
         |    MIN(CASE WHEN variant = 1 THEN sy END) AS sy_t,
         |    MIN(CASE WHEN variant = 1 THEN sn END) AS sn_t,
         |    MIN(CASE WHEN variant = 1 THEN syy END) AS syy_t,
         |    MIN(CASE WHEN variant = 1 THEN snn END) AS snn_t,
         |    MIN(CASE WHEN variant = 1 THEN syn END) AS syn_t
         |  FROM a),
         |x AS (SELECT n_ctl, n_trt,
         |    CASE WHEN sn_c <= 0.0 THEN NULL ELSE sy_c / sn_c END AS r_c,
         |    CASE WHEN sn_t <= 0.0 THEN NULL ELSE sy_t / sn_t END AS r_t,
         |    (${varRSql("n_ctl", "sy_c", "sn_c", "syy_c", "snn_c", "syn_c")})
         |      + (${varRSql("n_trt", "sy_t", "sn_t", "syy_t", "snn_t", "syn_t")})
         |      AS v_sum
         |  FROM p)
         |SELECT n_ctl, n_trt,
         |  r_c AS ratio_ctl_cents_per_session,
         |  r_t AS ratio_trt_cents_per_session,
         |  r_t - r_c AS lift_cents_per_session,
         |  CASE WHEN v_sum <= 0.0 THEN NULL ELSE sqrt(v_sum) END AS se_delta,
         |  CASE WHEN v_sum <= 0.0 THEN NULL
         |    ELSE (r_t - r_c) * (r_t - r_c) / v_sum END AS z2,
         |  CASE WHEN v_sum <= 0.0 THEN NULL
         |    ELSE (r_t - r_c) * (r_t - r_c) / v_sum END
         |    > 3.841458820694124 AS significant
         |FROM x""".stripMargin
    },

    // Same six moments, same θ / x̄ / adjusted-mean expression trees.
    "events_ab_cuped" ->
      """WITH g AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
        |    MAX(CAST(ts AS DATE)) AS d1 FROM events),
        |per AS (SELECT user_id,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND NOT (date_diff('day', d0, CAST(ts AS DATE)) * 2
        |        > date_diff('day', d0, d1))
        |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0) AS x,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND date_diff('day', d0, CAST(ts AS DATE)) * 2
        |        > date_diff('day', d0, d1)
        |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0) AS y
        |  FROM events, g GROUP BY user_id),
        |gm AS (SELECT COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0)) * y
        |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(19,0)) * x
        |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0)) * y
        |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS syy
        |  FROM per),
        |v AS (SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS vn,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS DOUBLE) AS vsx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS DOUBLE) AS vsy
        |  FROM per GROUP BY 1),
        |piv AS (SELECT
        |    MIN(CASE WHEN variant = 0 THEN vn END) AS n_ctl,
        |    MIN(CASE WHEN variant = 1 THEN vn END) AS n_trt,
        |    MIN(CASE WHEN variant = 0 THEN vsx END) AS sx_ctl,
        |    MIN(CASE WHEN variant = 1 THEN vsx END) AS sx_trt,
        |    MIN(CASE WHEN variant = 0 THEN vsy END) AS sy_ctl,
        |    MIN(CASE WHEN variant = 1 THEN vsy END) AS sy_trt
        |  FROM v),
        |m AS (SELECT *,
        |    (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
        |      AS covxy,
        |    (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
        |      AS varx,
        |    (syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
        |      AS vary
        |  FROM gm, piv),
        |t AS (SELECT *,
        |    CASE WHEN n <= 1 OR varx <= 0.0 THEN NULL
        |      ELSE covxy / varx END AS theta,
        |    sx / CAST(n AS DOUBLE) / 100.0 AS xbar
        |  FROM m)
        |SELECT n_ctl, n_trt, theta,
        |  sy_trt / CAST(n_trt AS DOUBLE) / 100.0
        |    - sy_ctl / CAST(n_ctl AS DOUBLE) / 100.0 AS lift_raw,
        |  (sy_trt / CAST(n_trt AS DOUBLE) / 100.0
        |    - theta * (sx_trt / CAST(n_trt AS DOUBLE) / 100.0 - xbar))
        |  - (sy_ctl / CAST(n_ctl AS DOUBLE) / 100.0
        |    - theta * (sx_ctl / CAST(n_ctl AS DOUBLE) / 100.0 - xbar))
        |    AS lift_cuped,
        |  CASE WHEN n <= 1 OR varx <= 0.0 OR vary <= 0.0 THEN NULL
        |    ELSE covxy * covxy / (varx * vary) END AS var_reduction
        |FROM t""".stripMargin,

    "events_ab_holm" -> eventsAbHolmSql,

    "events_ab_value_ttest" ->
      """WITH per AS (SELECT user_id,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS m
        |  FROM events GROUP BY user_id),
        |v AS (SELECT ((user_id % 2) + 2) % 2 AS variant, COUNT(*) AS n,
        |    CAST(CAST(SUM(m) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS s1,
        |    CAST(CAST(SUM(m * m) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000
        |      AS s2
        |  FROM per GROUP BY 1),
        |p AS (SELECT
        |    MIN(CASE WHEN variant = 0 THEN n END) AS n_a,
        |    MIN(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
        |    MIN(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
        |    MIN(CASE WHEN variant = 1 THEN n END) AS n_b,
        |    MIN(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
        |    MIN(CASE WHEN variant = 1 THEN s2 END) AS s2_b
        |  FROM v),
        |b AS (SELECT n_a, n_b,
        |    s1_a / n_a AS mean_a, s1_b / n_b AS mean_b,
        |    (s2_a - s1_a * s1_a / n_a) / (n_a - 1) AS var_a,
        |    (s2_b - s1_b * s1_b / n_b) / (n_b - 1) AS var_b
        |  FROM p)
        |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR var_a / n_a + var_b / n_b = 0
        |    THEN NULL
        |    ELSE (mean_a - mean_b) * (mean_a - mean_b) /
        |      (var_a / n_a + var_b / n_b) END AS t_stat2,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR var_a / n_a + var_b / n_b = 0
        |    THEN NULL
        |    ELSE (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
        |      ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
        |       (var_b / n_b) * (var_b / n_b) / (n_b - 1)) END AS df_welch,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR var_a / n_a + var_b / n_b = 0
        |    THEN NULL
        |    ELSE (mean_a - mean_b) * (mean_a - mean_b) /
        |      (var_a / n_a + var_b / n_b) > 3.841458820694124 END
        |    AS significant
        |FROM b""".stripMargin,

    "events_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
        |  FROM events),
        |c AS (SELECT user_id, seg, COUNT(*) AS n_clicks,
        |    MIN(event_id) AS first_click, MAX(event_id) AS last_click
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (SELECT user_id, seg FROM ev WHERE event_type = 'purchase'),
        |j AS (SELECT
        |    COUNT(*) AS n_purchases,
        |    CAST(SUM(CASE WHEN n_clicks IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_attributed,
        |    CAST(SUM(CASE WHEN first_click = last_click THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_single_touch,
        |    CAST(COALESCE(SUM(n_clicks), 0) AS BIGINT) AS total_clicks
        |  FROM b LEFT JOIN c USING (user_id, seg))
        |SELECT n_purchases, n_attributed, n_single_touch, total_clicks,
        |  CAST(n_attributed AS DOUBLE) / CAST(n_purchases AS DOUBLE)
        |    AS share_attributed,
        |  CASE WHEN n_attributed = 0 THEN NULL
        |    ELSE CAST(total_clicks AS DOUBLE) / CAST(n_attributed AS DOUBLE)
        |    END AS avg_clicks_per_attributed
        |FROM j""".stripMargin,

    "events_watermark_policy" ->
      """WITH m AS (SELECT user_id, epoch_us(ts) AS us,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM events),
        |l AS (SELECT GREATEST(0, COALESCE(pm - us, 0)) AS lateness_us FROM m),
        |d AS (SELECT CAST(unnest([0, 60000000, 300000000, 3600000000,
        |    21600000000, 86400000000]) AS BIGINT) AS delay_us)
        |SELECT delay_us, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN lateness_us <= delay_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN lateness_us <= delay_us THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS retain_share
        |FROM l, d GROUP BY delay_us""".stripMargin,

    "events_lag_percentiles" ->
      """WITH m AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM events),
        |l AS (SELECT event_type,
        |    GREATEST(0, COALESCE(pm - us, 0)) AS lateness_us FROM m)
        |SELECT event_type, COUNT(*) AS n_events,
        |  quantile_cont(lateness_us, 0.5) AS p50_us,
        |  quantile_cont(lateness_us, 0.95) AS p95_us,
        |  quantile_cont(lateness_us, 0.99) AS p99_us,
        |  MAX(lateness_us) AS max_lateness_us
        |FROM l GROUP BY event_type""".stripMargin,

    "events_forecast_naive" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |j AS (SELECT d.day, d.n, p.n AS pred
        |  FROM daily d JOIN daily p ON d.day = p.day + 7)
        |SELECT CAST(dayofweek(day) + 1 AS INT) AS dow, COUNT(*) AS n_days,
        |  CAST(SUM(abs(n - pred)) AS BIGINT) AS abs_err_total,
        |  CAST(SUM(n - pred) AS BIGINT) AS bias_total,
        |  CAST(SUM(abs(n - pred)) AS DOUBLE) / COUNT(*) AS mae
        |FROM j GROUP BY 1""".stripMargin,

    // DuckDB SUM(BIGINT) is HUGEINT — every sum re-cast to BIGINT
    // BEFORE the slope arithmetic so the double conversions round the
    // same 64-bit values as Spark (all magnitudes < 2^53: exact).
    "events_forecast_linear" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |tt AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS t, y
        |  FROM daily),
        |fit AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(t * t) AS BIGINT) AS stt,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(t * y) AS BIGINT) AS sty,
        |    MAX(t) AS tmax
        |  FROM tt GROUP BY 1),
        |sl AS (SELECT *, n * stt - st * st AS den,
        |    CASE WHEN n * stt - st * st = 0 THEN NULL
        |      ELSE CAST(n * sty - st * sy AS DOUBLE)
        |        / CAST(n * stt - st * st AS DOUBLE) END AS slope
        |  FROM fit),
        |ic AS (SELECT *,
        |    (CAST(sy AS DOUBLE) - slope * CAST(st AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept
        |  FROM sl)
        |SELECT event_type, CAST(h AS INT) AS horizon,
        |  DATE '1970-01-01' + CAST(tmax + h AS INT) AS forecast_day,
        |  intercept + slope * CAST(tmax + h AS DOUBLE) AS predicted
        |FROM ic, (SELECT unnest(generate_series(1, 7)) AS h) hs""".stripMargin,

    "events_hourly_seasonality" ->
      """WITH byh AS (SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n_events,
        |    COUNT(*) AS hours_present, CAST(MAX(o) AS BIGINT) AS max_hourly,
        |    CAST(SUM(o * o) AS BIGINT) AS sum_sq
        |  FROM byh GROUP BY 1)
        |SELECT event_type, n_events, hours_present, max_hourly, sum_sq,
        |  CAST(24 * sum_sq AS DOUBLE) / CAST(n_events AS DOUBLE)
        |    - CAST(n_events AS DOUBLE) AS chi2,
        |  CAST(24 * sum_sq AS DOUBLE) / CAST(n_events AS DOUBLE)
        |    - CAST(n_events AS DOUBLE) > 35.17246162690806
        |    AS uniform_rejected
        |FROM g""".stripMargin,

    "events_power_analysis" -> {
      val k = Stats.POWER_K.toString
      s"""WITH per AS (SELECT user_id,
         |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(value AS DECIMAL(18,2)) END),
         |      CAST(0 AS DECIMAL(18,2))) AS m
         |  FROM events GROUP BY user_id),
         |g AS (SELECT COUNT(*) AS n_users,
         |    CAST(CAST(SUM(m) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS s1,
         |    CAST(CAST(SUM(m * m) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000
         |      AS s2
         |  FROM per),
         |b AS (SELECT n_users, s1 / n_users AS mean_rev,
         |    (s2 - s1 * s1 / n_users) / (n_users - 1) AS var_rev
         |  FROM g)
         |SELECT n_users, mean_rev, var_rev,
         |  0.05 * mean_rev AS mde_abs,
         |  CASE WHEN mean_rev = 0 OR var_rev = 0 THEN NULL
         |    ELSE CAST(CEIL($k * var_rev /
         |      ((0.05 * mean_rev) * (0.05 * mean_rev))) AS BIGINT) END
         |    AS n_required_per_arm
         |FROM b""".stripMargin
    }
  )
}
