package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CdcEvent

/** Envelope construction (reference D6–D11): raw change rows → the
  * unified CdcEvent envelope, including the before-image the reference
  * only stubbed (replicator.go:387-396 logs updates but never emits
  * old+new data — SURVEY.md §2.6).
  *
  * The before-image is the previous after-image of the same key: one
  * window (shuffle on key, sort by LSN) computes it for the whole log —
  * no point lookups, scales as a single exchange.
  */
object Envelope {

  import org.apache.spark.sql.Column

  private def emptyMap: Column = typedLit(Map.empty[String, String])

  /** op mapping (reference message kinds, replicator.go:319-415). */
  private def opCol: Column =
    when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "error", "delete")
      .otherwise("update")

  /** String-erased after-image (§1.2: the reference stringifies every
    * value, replicator.go:344-359). ONE definition — every envelope
    * builder shares it, so a payload-column change cannot desynchronize
    * batch, snapshot, and streaming envelopes.
    */
  private def afterImage: Column = map(
    lit("user_id"), col("user_id").cast("string"),
    lit("value"), col("value").cast("string"),
    lit("k"), get_json_object(col("props"), "$.k"))

  /** The shared 10-column envelope projection. Expects `op` and
    * `after_img` columns on the input; `before` and `columns` are the
    * only per-builder degrees of freedom. `after` empties on delete for
    * every builder (op="snapshot" never matches).
    */
  private def envelopeColumns(before: Column, columnsMeta: Column,
      unchangedCols: Column = lit(null).cast("array<string>")): Seq[Column] = Seq(
    col("op"),
    lit("public").as("schemaName"),
    lit("users").as("tableName"),
    col("event_id").as("lsn"),
    col("ts"),
    concat(lit("public.users:"), col("user_id").cast("string")).as("key"),
    before.as("before"),
    when(col("op") === "delete", emptyMap).otherwise(col("after_img")).as("after"),
    (col("event_id") / 100).cast("long").as("txnId"),
    columnsMeta.as("columns"),
    unchangedCols.as("unchangedCols"))

  /** Stream events carry no catalog — the reference only captures
    * FieldDescriptions during the snapshot SELECT (replicator.go:114-126);
    * pgoutput stream tuples identify columns by relation registry.
    */
  private def noCatalog: Column = lit(null).cast(CdcEvent.columnsType)

  /** events table → Dataset[CdcEvent] with op mapping, key construction
    * (D11: "schema.table:pk" — but from a DECLARED key, not the
    * reference's positional first-column guess), string-erased payload
    * maps (§1.2), and lag-derived before-images.
    */
  def toCdcEvents(events: DataFrame): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy("event_id")
    // Lag (op, after_img) together: after a delete the key's state no
    // longer exists, so the next event's before-image is EMPTY — lagging
    // the after-image alone would resurrect the deleted payload.
    events
      .withColumn("op", opCol)
      .withColumn("after_img", afterImage)
      .withColumn("prev", lag(struct(col("op"), col("after_img")), 1).over(w))
      .withColumn("before_img",
        when(col("prev.op") === "delete", emptyMap)
          .otherwise(col("prev.after_img")))
      .select(envelopeColumns(
        before = when(col("op") === "insert", emptyMap)
          .otherwise(coalesce(col("before_img"), emptyMap)),
        columnsMeta = noCatalog): _*)
      .as[CdcEvent]
  }

  /** Snapshot events (reference replicator.go:69-184): one event per row
    * visible at the fence, op="snapshot", payload in `after`, and the
    * per-column catalog `{name, typeOid, typeMod, format}` attached —
    * the field the reference emits (replicator.go:138-145) but its
    * consumer drops. Carrying it lets a downstream consumer type the
    * string-erased payload without any out-of-band catalog access.
    */
  def snapshotEvents(events: DataFrame, fenceLsn: Long): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_id") <= fenceLsn)
      .withColumn("op", lit("snapshot"))
      .withColumn("after_img", afterImage)
      .select(envelopeColumns(
        before = emptyMap,
        columnsMeta = typedLit(CdcEvent.usersCatalog)): _*)
      .as[CdcEvent]
  }

  /** Streaming-safe envelope: [[toCdcEvents]] minus the lag-derived
    * before-image — the lag window needs each key's full history, which
    * a stream cannot see without keyed state (and the reference never
    * emits before-images at all, replicator.go:387-396, so the wire
    * contract loses nothing). Batch consumers who want before-images use
    * [[toCdcEvents]].
    */
  def toCdcEventsStreaming(events: DataFrame): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("op", opCol)
      .withColumn("after_img", afterImage)
      .select(envelopeColumns(before = emptyMap, columnsMeta = noCatalog): _*)
      .as[CdcEvent]
  }

  /** Envelope with synthesized TOAST `'u'` markers (SURVEY §7.5.5) —
    * the test corpus has no TOAST-able columns, so the pgoutput
    * behavior is modeled deterministically on top of it: an UPDATE
    * whose `event_id % 3 == 0` ships `k` as unchanged, and one whose
    * `event_id % 5 == 0` ships `value` as unchanged (both at
    * `% 15 == 0`; LSNs are non-negative so `%` agrees across engines).
    * A marked column stays in `after` with a NULL value and its name in
    * `unchangedCols` — the null-plus-flag modeling the survey promises,
    * instead of the reference's `"(unchanged)"` string-as-data
    * (replicator.go:349-350). [[graft.pipeline.ChangeLog.latestStateCarryForward]]
    * resolves the markers; inserts and deletes never mark (pgoutput
    * only emits `'u'` on UPDATE new-tuples).
    */
  def toCdcEventsToast(events: DataFrame): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val kUnch = col("op") === "update" && col("event_id") % 3 === 0
    val vUnch = col("op") === "update" && col("event_id") % 5 === 0
    val emptyArr = array().cast("array<string>")
    events
      .withColumn("op", opCol)
      .withColumn("after_img", map(
        lit("user_id"), col("user_id").cast("string"),
        lit("value"), when(vUnch, lit(null).cast("string"))
          .otherwise(col("value").cast("string")),
        lit("k"), when(kUnch, lit(null).cast("string"))
          .otherwise(get_json_object(col("props"), "$.k"))))
      .withColumn("unch",
        when(col("op") === "update", concat(
          when(kUnch, array(lit("k"))).otherwise(emptyArr),
          when(vUnch, array(lit("value"))).otherwise(emptyArr)))
          .otherwise(lit(null).cast("array<string>")))
      .select(envelopeColumns(before = emptyMap, columnsMeta = noCatalog,
        unchangedCols = col("unch")): _*)
      .as[CdcEvent]
  }

  /** K1 wire shape (producer.go:35-42): one Kafka message per event —
    * `key` = the partitioning key bytes ("schema.table:pk",
    * replicator.go:374-379), `value` = the JSON envelope bytes. This is
    * byte-for-byte the two-column relation a `spark.read.format("kafka")`
    * batch read delivers, so everything downstream of [[fromKafkaMessages]]
    * works unchanged against a real broker.
    */
  def toKafkaMessages(events: Dataset[CdcEvent]): DataFrame =
    events.select(
      col("key").cast("binary").as("key"),
      to_json(struct(events.columns.map(col): _*)).cast("binary").as("value"))

  /** Consumer side (es_consumer/main.go:44-75): decode the message value
    * back into the envelope. Corrupt values become null rows (D10 done
    * right), and the Kafka message key is deliberately IGNORED — the
    * envelope's own `key` field is authoritative, so a mis-keyed producer
    * cannot corrupt downstream state.
    */
  def fromKafkaMessages(msgs: DataFrame): Dataset[CdcEvent] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    msgs.select(from_json(col("value").cast("string"), CdcEvent.envelopeSchema).as("ev"))
      .select("ev.*").as[CdcEvent]
  }

  /** D9/D10: envelope → JSON wire format → back. The reference marshals
    * to JSON for Kafka (replicator.go:146-150) and unmarshals in the
    * consumer (es_consumer/main.go:66-71); `to_json`/`from_json` is the
    * columnar equivalent, with corrupt records becoming nulls instead of
    * silently-committed poison pills.
    */
  def jsonRoundTrip(events: Dataset[CdcEvent]): DataFrame = {
    val serialized = events.select(to_json(struct(events.columns.map(col): _*)).as("wire"))
    serialized.select(from_json(col("wire"), CdcEvent.envelopeSchema).as("ev"))
      .select("ev.*")
  }
}
