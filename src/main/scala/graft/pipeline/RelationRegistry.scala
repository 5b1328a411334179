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
    * richest message, deterministically; equal-width ties break on the
    * column array itself, so two same-lsn same-width registrations
    * with different column SETS resolve the same way every run — r16
    * advice: row_number over an under-specified order can flap).
    */
  def currentSchemas(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("relation")
      .orderBy(col("lsn").desc, size(col("columns")).desc, col("columns"))
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
    * project the after-image through it.
    *
    * Formulated as an INTERVAL join (r16, was a window over the joined
    * events): the registry log — O(relations · versions), always
    * broadcast — is first deduplicated per (relation, lsn) keeping the
    * wider schema (the re-registration tie-break), then each version
    * gets its validity interval [lsn, next version's lsn) via one lead()
    * over the tiny registry relation. An event then matches EXACTLY ONE
    * interval, so no window ever runs over the event side — the r15
    * formulation shuffled every event to rank registry candidates and,
    * worse, partitioned that window by (lsn, key), silently collapsing
    * distinct events that shared both (an LSN-uniqueness assumption the
    * API never stated). This shape needs no uniqueness assumption at
    * all and keeps the payload map shuffle-free.
    *
    * Events with NO applicable version — an unregistered relation, or
    * an lsn before the relation's first RelationMessage — are KEPT with
    * a NULL `columns`/`after` (the r15 inner join dropped them without
    * a trace, the same silent-conservation failure assignToCells
    * guards against). Callers that require full coverage can assert
    * `columns IS NOT NULL`; the reference itself crashes on an
    * unregistered relation id (replicator.go:330-333), which a pipeline
    * re-expresses as a dead-letter filter, not a vanished row.
    */
  def projectAsOf(events: DataFrame, log: DataFrame): DataFrame = {
    // equal-width same-lsn registrations tie-break on the column array
    // itself (deterministic across runs — r16 advice), matching
    // currentSchemas' resolution order
    val wDup = Window.partitionBy("relation", "reg_lsn")
      .orderBy(size(col("columns")).desc, col("columns"))
    val wNext = Window.partitionBy("relation").orderBy("reg_lsn")
    val versions = log
      .select(col("relation"), col("lsn").as("reg_lsn"), col("columns"))
      .withColumn("dup_rn", row_number().over(wDup))
      .filter(col("dup_rn") === 1)
      .withColumn("next_lsn", lead(col("reg_lsn"), 1).over(wNext))
      .select("relation", "reg_lsn", "next_lsn", "columns")
    val ev = events.drop("columns") // superseded by the as-of version
    ev.join(broadcast(versions),
        ev("tableName") === versions("relation") &&
          versions("reg_lsn") <= ev("lsn") &&
          (versions("next_lsn").isNull || ev("lsn") < versions("next_lsn")),
        "left")
      .withColumn("after",
        map_from_arrays(col("columns"),
          transform(col("columns"), c => element_at(col("after"), c))))
      .drop("relation", "reg_lsn", "next_lsn")
  }
}
