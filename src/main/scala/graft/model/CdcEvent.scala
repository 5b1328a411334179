package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The unified change-event envelope.
  *
  * The reference uses two asymmetric JSON shapes — snapshot events
  * (`values` + `columns`, replicator.go:138-145) and stream events
  * (`data` + `lsn`, replicator.go:360-367) — and its consumer silently
  * drops snapshot payloads because it only decodes the stream shape
  * (es_consumer/main.go:19-26). We give both kinds ONE schema (SURVEY.md
  * §1.1): an op tag, the fully-qualified table, a total-order version
  * (`lsn`), an event timestamp, the partitioning `key`
  * ("schema.table:pk", replicator.go:374-379), and string-erased
  * before/after images mirroring the reference's type erasure
  * (replicator.go:344-359 stringifies every value).
  *
  * `MapType(String,String)` keeps the payload dynamic-schema like the
  * reference; typed analytic queries project out of it with `from_json` /
  * casts at the boundary.
  */
/** Per-column catalog metadata of a snapshot event, captured by the
  * reference from the wire FieldDescriptions (replicator.go:114-126):
  * column name, data-type OID, type modifier, wire format. The reference
  * EMITS this on every snapshot event but its consumer silently drops it
  * (es_consumer/main.go:19-26 decodes only the stream shape); we carry
  * it so a consumer can recover declared types — the ES-mapping-
  * inference use case — without a catalog lookup.
  */
case class ColumnMeta(name: String, typeOid: Int, typeMod: Int, format: Int)

case class CdcEvent(
    op: String,            // snapshot | insert | update | delete | truncate
    schemaName: String,
    tableName: String,
    lsn: Long,             // total order; reference: uint64 WAL LSN
    ts: Timestamp,         // event time (reference stamps wall clock, replicator.go:365)
    key: String,           // "schema.table:pk" — Kafka message key analog
    before: Map[String, String], // pre-image (update/delete); empty otherwise
    after: Map[String, String],  // post-image (snapshot/insert/update); empty for delete
    txnId: Long,           // reference logs Begin/Commit Xid but drops it (replicator.go:323-331)
    columns: Seq[ColumnMeta], // snapshot-op column catalog (replicator.go:138-145); null for stream events
    /** TOAST `'u'` sentinel done right (SURVEY §7.5.5): the names of
      * `after` columns whose values Postgres did NOT re-ship because an
      * UPDATE left the TOASTed value unchanged. The reference stores
      * the literal string `"(unchanged)"` AS the value
      * (replicator.go:349-350) — downstream state then holds that
      * string as data. Here the column stays in `after` with a NULL
      * value and its name listed in this field, so a consumer can
      * distinguish "SET NULL" (null, not listed) from "unchanged, carry
      * the prior value forward" (null + listed). Null/empty for every
      * op except update; [[graft.pipeline.ChangeLog.latestStateCarryForward]]
      * consumes it.
      */
    unchangedCols: Seq[String] = null
)

object CdcEvent {
  val ops: Seq[String] = Seq("snapshot", "insert", "update", "delete", "truncate")

  val columnMetaSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("typeOid", IntegerType, nullable = false),
    StructField("typeMod", IntegerType, nullable = false),
    StructField("format", IntegerType, nullable = false)
  ))

  val columnsType: ArrayType = ArrayType(columnMetaSchema, containsNull = false)

  /** Fixed envelope schema for untyped (DataFrame / from_json) use. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("schemaName", StringType, nullable = false),
    StructField("tableName", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true),
    StructField("txnId", LongType, nullable = false),
    StructField("columns", columnsType, nullable = true),
    StructField("unchangedCols", ArrayType(StringType, containsNull = false),
      nullable = true)
  ))

  /** The users-table catalog a snapshot of the test corpus carries.
    * OIDs are the standard PostgreSQL pg_type ids (int8=20, float8=701,
    * text=25); typeMod -1 = no modifier, format 0 = text wire format —
    * the values the reference's snapshot query reports for these types.
    */
  val usersCatalog: Seq[ColumnMeta] = Seq(
    ColumnMeta("user_id", 20, -1, 0),
    ColumnMeta("value", 701, -1, 0),
    ColumnMeta("k", 25, -1, 0)
  )
}
