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
  */
object Stats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cumulative distinct users by first-activity day.
    "events_cum_users" -> ((s, d) => {
      val daily = Tables.events(s, d)
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
      val agg = Tables.events(s, d)
        .groupBy(dayofweek(col("ts")).as("dow"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      agg.withColumn("share",
        col("n_events").cast("double") /
          sum("n_events").over(Window.partitionBy("dow")).cast("double"))
    }),

    // Exact mode of order priority per order status, deterministic
    // tie-break.
    "agg_mode_per_group" -> ((s, d) => {
      val counts = Tables.orders(s, d)
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
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
    }),

    // Median absolute deviation of order value per order status.
    "agg_median_abs_dev" -> ((s, d) => {
      val med = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
      Tables.orders(s, d)
        .join(broadcast(med), "o_orderstatus")
        .withColumn("adev", abs(col("o_totalprice") - col("med")))
        .groupBy("o_orderstatus")
        .agg(max("med").as("med"), expr("percentile(adev, 0.5)").as("mad"))
    }),

    // Corpus vocabulary census (same whitespace tokenization as the
    // text_* family).
    "text_hapax" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_vocab"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"),
          sum("n").as("n_tokens"))
        .withColumn("hapax_share",
          col("n_hapax").cast("double") / col("n_vocab").cast("double"))
    })
  )

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
        |FROM c""".stripMargin
  )
}
