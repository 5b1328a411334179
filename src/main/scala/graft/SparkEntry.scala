package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module contributes a map of named queries plus matching DuckDB
  * oracle SQL; this object is just the union. Column names and types are
  * aligned between the Spark plan and the oracle SQL (the driver's
  * compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship: the CDC latest-state-per-key materialization — the
    * semantics the entire reference pipeline exists to produce
    * (SURVEY.md §2.3 A3) — enriched with per-key changelog statistics
    * (one extra aggregation over the same shuffle key, so the join is
    * co-partitioned). Driver smoke-checks rows > 0 on sf0.001; row count
    * equals the number of distinct keys, so it is always non-empty.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val events = sources.Tables.events(spark, sfDir)
    val latest = pipeline.ChangeLog.latestState(events, Seq("user_id"), "event_id")
    val stats = events.groupBy("user_id").agg(
      count(lit(1)).as("n_changes"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("lifetime_value"),
      min(col("ts")).as("first_seen"))
    latest.join(stats, "user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2 + north-star ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pipeline.CdcQueries.queries ++
      operators.Relational.queries ++
      operators.RelationalExt.queries ++
      operators.RelationalExt2.queries ++
      operators.TpchRest.queries ++
      operators.Mining.queries ++
      operators.Stats.queries ++
      operators.Profiling.queries ++
      operators.SqlSurface.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Graph.queries ++
      operators.Layout.queries ++
      operators.TextAnalysis.queries ++
      operators.Curation.queries ++
      multimodal.Multimodal.queries

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    pipeline.CdcQueries.oracles ++
      operators.Relational.oracles ++
      operators.RelationalExt.oracles ++
      operators.RelationalExt2.oracles ++
      operators.TpchRest.oracles ++
      operators.Mining.oracles ++
      operators.Stats.oracles ++
      operators.Profiling.oracles ++
      operators.SqlSurface.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Graph.oracles ++
      operators.Layout.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Curation.oracles ++
      multimodal.Multimodal.oracles
}
