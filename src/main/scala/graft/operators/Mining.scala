package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence- and affinity-mining operators over the event log and order
  * baskets — the "what happens next / what goes together" analytics a
  * behavioral pipeline derives from the same CDC stream the reference
  * replicates (reference surface: the events table the pipeline's
  * consumers query; cf. /root/reference/cmd/es_consumer/main.go:44-95,
  * which materializes exactly this per-entity event history).
  *
  * Scale design:
  *  - `events_transition_matrix` — one window pass per user (shuffle on
  *    user_id, sort by the LSN-analog event_id) + one hash aggregation
  *    over (from, to) — state-machine-sized output regardless of input
  *    rows. The per-from normalization runs over the aggregated matrix
  *    (≤ |event types|² rows), not the event log.
  *  - `basket_part_pairs` — pairs are generated from per-order sorted
  *    part arrays (one groupBy on the natural key), NOT an item×item
  *    self-join: per-basket expansion is bounded by max basket size
  *    (TPC-H ≤ 7 ⟹ ≤ 21 pairs/order), so the pair relation is O(orders)
  *    and there is no join-key skew to guard. The DuckDB oracle uses the
  *    equivalent self-join formulation — different plan, same relation —
  *    which also documents the algebraic identity being exploited.
  *  - `asof_tolerance` — as-of join with a staleness bound (pandas
  *    merge_asof's `tolerance`), expressed as a RANGE window frame over
  *    the ordering key: one exchange, no range-join explosion, no
  *    broadcast needed at any scale.
  */
object Mining {

  /** asof_tolerance staleness bound, in event_id (LSN) units. */
  private val ASOF_TOL = 200L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Markov transition matrix: count (event_type → next event_type)
    // per user-ordered sequence, with per-from transition probability.
    // prob is one IEEE division of two exact longs — bit-identical in
    // both engines (sum ≤ event count ≪ 2^53).
    "events_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("to_event", lead(col("event_type"), 1).over(w))
        .filter(col("to_event").isNotNull)
        .groupBy(col("event_type").as("from_event"), col("to_event"))
        .agg(count(lit(1)).as("n_transitions"))
      val wf = Window.partitionBy("from_event")
      trans.withColumn("prob",
        col("n_transitions").cast("double") /
          sum("n_transitions").over(wf).cast("double"))
    }),

    // Market-basket affinity: top co-occurring part pairs across order
    // baskets. sort_array makes pair generation order-canonical
    // (part_a < part_b) without a distinct; ties in the top-k are fully
    // ordered.
    "basket_part_pairs" -> ((s, d) => {
      val baskets = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      baskets
        .filter(size(col("parts")) >= 2)
        .select(explode(flatten(transform(col("parts"), (x, i) =>
          transform(slice(col("parts"), i + lit(2), size(col("parts"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(25)
    }),

    // As-of join with tolerance: for each purchase, the latest earlier
    // click of the same user NO OLDER than ASOF_TOL event-ids — the
    // bounded-staleness variant of asof_click_purchase. The RANGE frame
    // [−TOL, −1] over the ordering key is the single-exchange form; a
    // match outside the window correctly yields NULL (stale click
    // ignored), which an unbounded-preceding frame cannot express.
    "asof_tolerance" -> ((s, d) => {
      val ec = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          when(col("event_type") === "click", col("event_id")).as("click_id"))
      val w = Window.partitionBy("user_id").orderBy(col("event_id"))
        .rangeBetween(-ASOF_TOL, -1)
      ec.withColumn("last_click", max(col("click_id")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_click"))
    }))

  val oracles: Map[String, String] = Map(

    "events_transition_matrix" ->
      """WITH seq AS (SELECT event_type AS from_event,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS to_event
        |  FROM events),
        |m AS (SELECT from_event, to_event, COUNT(*) AS n_transitions
        |  FROM seq WHERE to_event IS NOT NULL GROUP BY 1, 2)
        |SELECT from_event, to_event, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |    CAST(SUM(n_transitions) OVER (PARTITION BY from_event) AS DOUBLE)
        |    AS prob
        |FROM m""".stripMargin,

    // Self-join formulation — the algebraic identity of the basket
    // expansion above: pairs(sorted array) ≡ {(a,b) : same order, a<b}.
    "basket_part_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  COUNT(*) AS n_orders
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 25""".stripMargin,

    "asof_tolerance" ->
      s"""SELECT event_id AS purchase_id, user_id, last_click
         |FROM (SELECT event_id, user_id, event_type,
         |    max(CASE WHEN event_type = 'click' THEN event_id END)
         |      OVER (PARTITION BY user_id ORDER BY event_id
         |        RANGE BETWEEN $ASOF_TOL PRECEDING AND 1 PRECEDING)
         |      AS last_click
         |  FROM events WHERE event_type IN ('click', 'purchase')) t
         |WHERE event_type = 'purchase'""".stripMargin)
}
