package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession

/** Raw-SQL surface: queries expressed as ANSI SQL strings through
  * `GraftSession.attach` (temp views + native functions) rather than the
  * DataFrame API — proving a reference user can bring plain SQL,
  * including the subquery forms Catalyst must decorrelate into joins:
  *
  *  - correlated EXISTS → left-semi hash join (no per-row probe loop)
  *  - IN subquery       → left-semi join with dedup on the build side
  *  - scalar subquery   → single-row broadcast, evaluated once
  *
  * Each SQL text is written to be valid in BOTH Spark and DuckDB, so the
  * oracle IS the query string — the strictest possible contract.
  * Portable-float rule as everywhere: averages via exact decimal sums.
  */
object SqlSurface {

  /** Tables each query references — attach registers only these (each
    * registration eagerly reads parquet footers; re-registering all 10
    * corpus tables per query construction is wasted I/O).
    */
  private val tablesOf: Map[String, Seq[String]] = Map(
    "sql_correlated_exists" -> Seq("customer", "orders"),
    "sql_in_subquery" -> Seq("customer", "nation", "orders"),
    "sql_scalar_subquery" -> Seq("orders"),
    "sql_lateral_join" -> Seq("customer", "orders"),
    "sql_recursive_spine" -> Seq("orders"))

  private val texts: Map[String, String] = Map(
    "sql_correlated_exists" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin,
    "sql_in_subquery" ->
      """SELECT n_name, COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |GROUP BY n_name""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                                 / COUNT(*) FROM orders)""".stripMargin,
    "sql_lateral_join" ->
      """SELECT c_custkey, o.max_price, o.n_orders
        |FROM customer JOIN LATERAL (
        |  SELECT MAX(o_totalprice) AS max_price, COUNT(*) AS n_orders
        |  FROM orders WHERE o_custkey = c_custkey) o ON true
        |WHERE c_custkey % 10 = 0""".stripMargin,
    // Recursive CTE (Spark 4 + DuckDB): a gap-free monthly spine LEFT
    // JOINed to a sparse revenue rollup — the "report every month even
    // the empty ones" calendar shape. Linear recursion, 89 iterations
    // (bounded well under Spark's 100-level recursion limit); the spine
    // is O(months) rows so the recursion cost is nil. Scale shape: the
    // rollup aggregates orders BEFORE the join (map-side partial, one
    // O(months)-row result) — joining raw orders to the spine instead
    // would shuffle the whole fact onto ~89 month keys, a skew
    // disaster at 100 TB that no optimizer un-writes for you. The DATE
    // casts pin the month key to DATE in both engines (DuckDB's
    // date_trunc/interval arithmetic would otherwise yield TIMESTAMP
    // where Spark yields DATE).
    "sql_recursive_spine" ->
      """WITH RECURSIVE spine(mo) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(mo + INTERVAL 1 MONTH AS DATE) FROM spine
        |  WHERE mo < DATE '2002-05-01'),
        |m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders WHERE o_totalprice > 400000
        |  GROUP BY 1)
        |SELECT spine.mo, COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(rev, 0.0) AS revenue
        |FROM spine LEFT OUTER JOIN m ON m.mo = spine.mo""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, sql) =>
      name -> ((s: SparkSession, d: String) => {
        GraftSession.attach(s, d, tablesOf(name))
        s.sql(sql)
      })
    }

  val oracles: Map[String, String] = texts
}
