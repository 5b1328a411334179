package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relation registry (reference D4): pgoutput names tuple columns ONLY
  * through the registry built from RelationMessages — the reference
  * updates its relation store per message mid-stream
  * (/root/reference/internal/wal/replicator.go:320-322) and decodes
  * every subsequent tuple against the store's CURRENT schema.
  * Re-expressed relationally, the registry is an append-only
  * (relation, lsn, columns) log:
  *
  *  - [[currentSchemas]] — the latest version per relation. A streaming
  *    consumer re-reads the log inside `foreachBatch` (a refreshed
  *    broadcast dimension — O(relations) rows, never a shuffle), so a
  *    RelationMessage landing between microbatches changes the
  *    projection of the NEXT batch without a restart (StreamingSpec).
  *  - [[projectAsOf]] — batch replay semantics: each event projects
  *    through the version current AT ITS LSN (max registered lsn ≤
  *    event lsn), the `cdc_registry_asof` query's core.
  *
  * Projection semantics mirror positional pgoutput decode: a
  * registered-but-absent column surfaces as NULL (the widened-schema
  * case), an unregistered payload key DROPS (the registry cannot name
  * a column it has not seen). The payload map never shuffles — both
  * joins broadcast the registry side.
  */
object RelationRegistry {

  /** Latest registered column set per relation (ties on lsn break to
    * the wider schema — a relation re-registered at one LSN keeps the
    * richest message, deterministically).
    */
  def currentSchemas(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("relation")
      .orderBy(col("lsn").desc, size(col("columns")).desc)
    log.withColumn("reg_rn", row_number().over(w))
      .filter(col("reg_rn") === 1)
      .select("relation", "columns")
  }

  /** Project each event's string-erased after-image through the given
    * (relation, columns) schema set — one broadcast join on the
    * relation name. The projected map holds exactly the registered
    * columns, in registry order, looked up from the original payload
    * (NULL where absent).
    */
  def projectThroughRegistry(events: DataFrame, schemas: DataFrame)
      : DataFrame = {
    // the registry version in effect IS the catalog: it supersedes the
    // envelope's snapshot-time `columns` field (which only snapshot
    // events carry — replicator.go:114-126)
    val ev = events.drop("columns")
    ev.join(broadcast(schemas), ev("tableName") === schemas("relation"))
      .withColumn("after",
        map_from_arrays(col("columns"),
          transform(col("columns"), c => element_at(col("after"), c))))
      .drop("relation")
  }

  /** Batch replay: attach the schema version current at each event's
    * LSN (max registered lsn ≤ event lsn, ties to the wider schema) and
    * project the after-image through it. The registry log is
    * O(relations · versions) — broadcast; one row survives per event.
    */
  def projectAsOf(events: DataFrame, log: DataFrame): DataFrame = {
    val reg = log.select(col("relation"), col("lsn").as("reg_lsn"),
      col("columns"))
    val w = Window.partitionBy("lsn", "key")
      .orderBy(col("reg_lsn").desc, size(col("columns")).desc)
    events.drop("columns") // superseded by the as-of registry version
      .join(broadcast(reg),
        col("tableName") === col("relation") && col("reg_lsn") <= col("lsn"))
      .withColumn("asof_rn", row_number().over(w))
      .filter(col("asof_rn") === 1)
      .withColumn("after",
        map_from_arrays(col("columns"),
          transform(col("columns"), c => element_at(col("after"), c))))
      .drop("relation", "reg_lsn", "asof_rn")
  }
}
