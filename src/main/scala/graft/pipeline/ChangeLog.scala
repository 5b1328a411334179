package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch CDC dataflow: the semantics the whole reference pipeline exists
  * to produce, re-expressed as declarative Spark plans.
  *
  * The reference materializes "latest state per key" implicitly via
  * idempotent keyed upserts into Elasticsearch (doc id = LSN,
  * es_consumer/main.go:77-95) fed by an ordered WAL stream
  * (replicator.go:247-421). Here the same semantics are the custom
  * two-phase top-k operator with k=1: each partition keeps ONE candidate
  * row per key in a heap (no sort — `max_by(struct(*))` would fall back
  * to SortAggregate because struct buffers can't hash-aggregate), the
  * exchange moves O(distinct keys) rows, and the final pass streams.
  * At 100 TB the shuffle volume is the answer, not the changelog.
  */
object ChangeLog {

  /** Latest row per key by a total-order version column (reference A3).
    * `versionCol` must be unique per key for determinism (the WAL LSN is;
    * `event_id` in the test corpus is globally unique).
    */
  def latestState(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    graft.plans.TopK.perKey(df, keyCols, Seq((versionCol, false)), 1)

  /** Latest state with TOAST carry-forward (SURVEY §7.5.5): the merge
    * [[graft.model.CdcEvent.unchangedCols]] exists for. An update that
    * lists a column there did NOT re-ship that column's (TOASTed)
    * value — the materialized state must carry the key's PRIOR value
    * forward, which plain last-event-wins ([[latestState]]) cannot do:
    * it would overwrite the state with the marker's null (or, in the
    * reference, with the literal string `"(unchanged)"`,
    * replicator.go:349-350).
    *
    * Distributed formulation — per-COLUMN argmax, not a per-key ordered
    * fold (a key's whole history never meets in one task):
    *   1. tombstone fence: max delete LSN per key; only events after it
    *      are live (a delete wipes state, a later insert restarts it);
    *   2. explode each live after-image to (key, column, lsn, value)
    *      and DROP the entries the event flagged unchanged — absence is
    *      what makes the older value win;
    *   3. latest entry per (key, column) via the TopK heap (k=1, no
    *      sort), then reassemble the state map.
    * Cost: one O(columns) map-side expansion + the same keyed shuffles
    * latestState needs; no state, no iteration, scales as exchanges.
    * Output: (key, state_lsn, state map); keys whose latest event is
    * the delete fence disappear, like [[latestStateWithTombstones]].
    */
  def latestStateCarryForward(env: DataFrame): DataFrame = {
    val (live, latestPerCol) = carryForwardCells(env)
    val stateLsn = live.groupBy("key").agg(max("lsn").as("state_lsn"))
    val state = latestPerCol.groupBy("key")
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("c"), col("v"))))).as("state"))
    stateLsn.join(state, Seq("key"), "left")
  }

  /** The carry-forward core, shared with [[cellProvenance]]: the live
    * (post-fence) event relation and the winning (key, column, lsn,
    * value) cell per column.
    */
  private def carryForwardCells(env: DataFrame): (DataFrame, DataFrame) = {
    val dels = env.filter(col("op") === "delete")
      .groupBy("key").agg(max("lsn").as("del_lsn"))
    val live = env.filter(col("op").isin("insert", "update", "snapshot"))
      .join(dels, Seq("key"), "left")
      .filter(col("del_lsn").isNull || col("lsn") > col("del_lsn"))
    val entries = live
      .select(col("key"), col("lsn"), col("unchangedCols"),
        explode(col("after")).as(Seq("c", "v")))
      .filter(!array_contains(
        coalesce(col("unchangedCols"), array().cast("array<string>")),
        col("c")))
      .select("key", "c", "lsn", "v")
    (live,
      graft.plans.TopK.perKey(entries, Seq("key", "c"), Seq(("lsn", false)), 1))
  }

  /** Cell-level LINEAGE of the carried-forward state: which LSN wrote
    * each column of each key's current row. Under TOAST markers a
    * cell's source can be OLDER than the row's state LSN (the marked
    * update kept the prior value), which row-level provenance cannot
    * express — this is the audit view that makes the carry-forward
    * inspectable. Output: (key, state_lsn, one src-LSN column per
    * payload column) — integers only, no value formatting. Same cost
    * profile as [[latestStateCarryForward]] (it IS the same dataflow,
    * pivoted instead of reassembled).
    */
  def cellProvenance(env: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val (live, latestPerCol) = carryForwardCells(env)
    val stateLsn = live.groupBy("key").agg(max("lsn").as("state_lsn"))
    val aggs = payloadCols.map(p =>
      max(when(col("c") === p, col("lsn"))).as(s"lsn_$p"))
    val pivoted = latestPerCol.groupBy("key").agg(aggs.head, aggs.tail: _*)
    stateLsn.join(pivoted, Seq("key"), "left")
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

  /** Kafka-style compact+delete retention policy (log.cleanup.policy=
    * compact + delete.retention.ms, in LSN space): a tombstone is
    * retained only while it is younger than `fence − fence/4` —
    * consumers lagging further than a quarter of the log must
    * resnapshot anyway, so the tombstone no longer protects anyone.
    * SHARED by the batch report (`cdc_tombstone_gc`) and the streaming
    * sink ([[graft.streaming.ChangeLogStream.retentionUpsertBatch]]) so
    * the two can never drift. LSNs are non-negative, so the shift IS
    * integer division by 4 (matches the oracle's `fence // 4`).
    */
  def tombstoneHorizon(fence: Column): Column =
    fence - shiftright(fence, 2)

  /** True while a tombstone at `lsn` must still be served. */
  def tombstoneRetained(lsn: Column, fence: Column): Column =
    lsn > tombstoneHorizon(fence)

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
    dedupById(snapshot.unionByName(stream), idCol)

  /** Replay idempotency (reference A4/D13): consuming the same changelog
    * twice must not change the result. Dedup on the unique event id is
    * the batch analog of the ES doc-id overwrite.
    */
  def replayDedup(df: DataFrame, idCol: String): DataFrame =
    dedupById(df, idCol)

  /** One row per id via the top-k operator (k=1, keyed by the id):
    * `dropDuplicates(id)` would aggregate every payload column with
    * First over immutable buffers — a SortAggregate that sorts whole
    * partitions; the heap form never sorts. Rows sharing an id are
    * replayed duplicates of the SAME logical row, so which copy
    * survives is immaterial (the same contract dropDuplicates has).
    */
  private def dedupById(df: DataFrame, idCol: String): DataFrame =
    graft.plans.TopK.perKey(df, Seq(idCol), Seq((idCol, false)), 1)
}
