package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch CDC dataflow: the semantics the whole reference pipeline exists
  * to produce, re-expressed as declarative Spark plans.
  *
  * The reference materializes "latest state per key" implicitly via
  * idempotent keyed upserts into Elasticsearch (doc id = LSN,
  * es_consumer/main.go:77-95) fed by an ordered WAL stream
  * (replicator.go:247-421). Here the same semantics are a single
  * shuffle-once aggregation: `groupBy(key).agg(max_by(struct(*), version))`
  * — partial aggregation (map-side combine) means each executor keeps one
  * candidate row per key before the exchange, so at 100 TB the shuffle
  * volume is O(distinct keys), not O(events).
  */
object ChangeLog {

  /** Latest row per key by a total-order version column (reference A3).
    * `versionCol` must be unique per key for determinism (the WAL LSN is;
    * `event_id` in the test corpus is globally unique).
    */
  def latestState(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(all, col(versionCol)).as("latest"))
      .select(df.columns.map(c => col(s"latest.`$c`").as(c)): _*)
  }

  /** Latest state with delete tombstones: a key whose LATEST op is a
    * delete disappears from the materialized view (reference stubs
    * DELETE at replicator.go:398-407 and never emits it; SURVEY.md §2.6
    * says we must do it right).
    */
  def latestStateWithTombstones(df: DataFrame, keyCols: Seq[String],
      versionCol: String, isDelete: Column): DataFrame = {
    val tagged = df.withColumn("__is_delete", isDelete)
    latestState(tagged, keyCols, versionCol)
      .filter(!col("__is_delete"))
      .drop("__is_delete")
  }

  /** Snapshot-seed ∪ change-stream with an LSN fence + keyed dedup.
    *
    * The reference reads the fence AFTER the snapshot (replicator.go:167-183)
    * so rows changed mid-snapshot are emitted twice, and snapshot events
    * carry no LSN so the dedup that should save it can't (SURVEY.md §3.2).
    * Correct form: both sides carry the version; union + dropDuplicates on
    * the unique version id. The dedup is a hash aggregation on the id —
    * no sort, map-side partial dedup first.
    */
  def fenceUnion(snapshot: DataFrame, stream: DataFrame, idCol: String): DataFrame =
    snapshot.unionByName(stream).dropDuplicates(idCol)

  /** Replay idempotency (reference A4/D13): consuming the same changelog
    * twice must not change the result. dropDuplicates on the unique event
    * id is the batch analog of the ES doc-id overwrite.
    */
  def replayDedup(df: DataFrame, idCol: String): DataFrame =
    df.dropDuplicates(idCol)
}
