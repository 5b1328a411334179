package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.pipeline.ChangeLog

/** A raw change event as it arrives on the stream (the `events` corpus
  * shape; FIXTURES.md maps user_id→key, event_id→LSN, event_type→op).
  */
case class RawEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Emitted state transition: the current materialized row per key, or a
  * tombstone marker when the latest op deleted the key.
  */
case class StateOut(user_id: Long, event_id: Long, event_type: String,
    value: Double, deleted: Boolean)

/** Structured Streaming re-expression of the reference pipeline
  * (SURVEY.md §3): WAL stream → keyed events → idempotent latest-state
  * materialization.
  *
  * What the reference does with hand-rolled loops maps 1:1 here:
  *  - LSN checkpoint every ~10 s in BoltDB (store.go:54-61, lossy)
  *    → `checkpointLocation` offsets+state, exact per microbatch.
  *  - at-least-once redelivery made safe by ES doc-id overwrite
  *    (es_consumer/main.go:77) → `dropDuplicatesWithinWatermark` +
  *    idempotent `foreachBatch` merge.
  *  - no event-time semantics at all (§2.7) → watermarked windows added
  *    as a first-class improvement.
  *
  * State stores scale horizontally: all stateful ops here key by
  * `user_id`, so state is hash-partitioned across executors and each
  * partition's store is O(its keys).
  */
object ChangeLogStream {

  /** Event-time tumbling-window aggregation with late-data drop. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming replay-dedup: the reference's doc-id idempotency (D13)
    * with bounded state — duplicates beyond the watermark horizon are
    * already impossible to re-deliver in-order, so state is evictable.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful latest-state per key with tombstones: the A3 upsert as
    * explicit keyed state. Emits a StateOut per input change (Update
    * mode); `deleted=true` marks key removal (reference never emits
    * these — §2.6). Events within a batch apply in LSN order; stale
    * (lower-LSN) arrivals are ignored — replay/out-of-order safe.
    */
  def latestStatePerKey(events: Dataset[RawEvent]): Dataset[StateOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[RawEvent], state: GroupState[StateOut]) =>
          val ordered = batch.toSeq.sortBy(_.event_id)
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[StateOut]
          ordered.foreach { e =>
            if (!cur.exists(_.event_id >= e.event_id)) {
              val next = StateOut(uid, e.event_id, e.event_type, e.value,
                deleted = e.event_type == "error")
              cur = Some(next)
              out += next
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** The same latest-state semantics on Spark 4's transformWithState —
    * the successor to flatMapGroupsWithState: typed state variables
    * (ValueState here; list/map state available), per-state TTL config,
    * timers, and a RocksDB-backed store (set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider — the API requires it). Kept alongside the FMGWS version:
    * both are driver-relevant surfaces of the same operator.
    */
  class LatestStateProcessor extends StatefulProcessor[Long, RawEvent, StateOut] {
    @transient private var state: ValueState[StateOut] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[StateOut]("latest",
        Encoders.product[StateOut], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[RawEvent],
        timerValues: TimerValues): Iterator[StateOut] = {
      val ordered = rows.toSeq.sortBy(_.event_id)
      var cur = Option(state.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[StateOut]
      ordered.foreach { e =>
        if (!cur.exists(_.event_id >= e.event_id)) {
          val next = StateOut(key, e.event_id, e.event_type, e.value,
            deleted = e.event_type == "error")
          cur = Some(next)
          out += next
        }
      }
      cur.foreach(state.update)
      out.iterator
    }
  }

  def latestStatePerKeyTws(events: Dataset[RawEvent]): Dataset[StateOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new LatestStateProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Latest-state with TTL: keys idle past `ttl` have their state
    * dropped via event-time timeout. At 100 TB of changelog the state
    * store is the scaling liability — unbounded latestStatePerKey state
    * grows with EVERY key ever seen; TTL caps it at the active-key set.
    * Trade-off (made explicit, not accidental): an event arriving after
    * its key expired is applied fresh, exactly like the reference's
    * at-least-once redelivery re-creating an ES doc.
    */
  def latestStatePerKeyWithTTL(events: Dataset[RawEvent],
      watermark: String = "10 minutes",
      ttlMs: Long = 60L * 60 * 1000): Dataset[StateOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[RawEvent], state: GroupState[StateOut]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = batch.toSeq.sortBy(_.event_id)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[StateOut]
            ordered.foreach { e =>
              if (!cur.exists(_.event_id >= e.event_id)) {
                val next = StateOut(uid, e.event_id, e.event_type, e.value,
                  deleted = e.event_type == "error")
                cur = Some(next)
                out += next
              }
            }
            cur.foreach(state.update)
            if (ordered.nonEmpty) {
              val maxTs = ordered.map(_.ts.getTime).max
              state.setTimeoutTimestamp(maxTs + ttlMs)
            }
            out.iterator
          }
      }
  }

  /** foreachBatch idempotent keyed upsert into a parquet "latest state"
    * table — the ES-sink analog (K2/A3) with batch commits instead of
    * one refresh per document. Merge = union(existing, batch-latest) →
    * latest-state; staging write + swap keeps readers consistent.
    * (On a real deployment this is a Delta/Iceberg MERGE; plain parquet
    * keeps this repo dependency-free.)
    */
  def upsertBatch(tableDir: String, keyCols: Seq[String], versionCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a failed swap can leave the table renamed aside;
    // restore it before merging so no state is ever dropped
    val recoverTarget = new Path(tableDir)
    val recoverBackup = new Path(tableDir + "__prev")
    if (!fs.exists(recoverTarget) && fs.exists(recoverBackup))
      fs.rename(recoverBackup, recoverTarget)
    val batchLatest = ChangeLog.latestState(batch, keyCols, versionCol)
    val merged =
      if (fs.exists(new Path(tableDir)))
        ChangeLog.latestState(
          spark.read.parquet(tableDir).unionByName(batchLatest),
          keyCols, versionCol)
      else batchLatest
    val staging = new Path(tableDir + s"__staging_$batchId")
    merged.write.mode("overwrite").parquet(staging.toString)
    // swap via rename-aside so a crash mid-swap never silently loses the
    // table: the worst case leaves target missing with backup present,
    // which the recovery branch below (and any operator) can see — and
    // every rename result is CHECKED, not assumed
    val target = new Path(tableDir)
    val backup = new Path(tableDir + "__prev")
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(target) && !fs.rename(target, backup))
      throw new java.io.IOException(s"failed to move $target aside to $backup")
    if (!fs.rename(staging, target)) {
      // restore the previous state before failing
      if (fs.exists(backup)) fs.rename(backup, target)
      throw new java.io.IOException(s"failed to publish $staging to $target")
    }
    if (fs.exists(backup)) fs.delete(backup, true)
  }

  /** D12 index routing as physical layout: the reference routes each
    * document to a per-table ES index named `cdc_<schema>_<table>`
    * (es_consumer/main.go:66-75); here the envelope lands partitioned
    * by (schemaName, tableName) — one DIRECTORY per routed table, so a
    * reader of one table prunes every other table at the directory
    * level (SinkSpec asserts the pruning from the physical plan).
    * Append-mode: existing tables' files are never rewritten.
    */
  def routeToTables(envelope: DataFrame, dir: String): Unit =
    envelope.write.partitionBy("schemaName", "tableName")
      .mode("append").parquet(dir)

  /** Read back ONE routed table — the per-index reader. */
  def readTable(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: String, table: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("schemaName") === schema && col("tableName") === table)

  /** [[upsertBatch]] with the K3 log tee: one structured progress record
    * (rows, LSN range) appended to the durable log table per committed
    * micro-batch — what the reference's replicator logs into SQLite on
    * every message + checkpoint cycle (logger.go:56-73). The record is
    * appended AFTER the upsert commit so the log never claims progress
    * the state table lost.
    */
  def loggedUpsertBatch(tableDir: String, logDir: String, keyCols: Seq[String],
      versionCol: String)(batch: DataFrame, batchId: Long): Unit = {
    // compute the progress aggregate BEFORE the upsert evaluates the
    // batch (so the upsert's own scan is the only other pass), but
    // APPEND it only after the commit — the log never claims progress
    // the state table lost
    val record =
      graft.ops.LogSink.progressRecord(batch, batchId, versionCol, "upsert-sink")
    upsertBatch(tableDir, keyCols, versionCol)(batch, batchId)
    graft.ops.LogSink.append(batch.sparkSession, logDir, Seq(record))
  }
}
