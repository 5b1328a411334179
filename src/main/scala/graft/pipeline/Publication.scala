package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** S4 analog — publication setup and the subscriber-side change feed.
  *
  * The reference issues idempotent `CREATE PUBLICATION ... FOR ALL
  * TABLES` DDL inside a `DO $$` block (replicator.go:195-205): a
  * publication is the declarative contract of WHICH tables' changes a
  * subscriber receives. The Spark-side equivalents of its two halves:
  *
  *  - catalog setup: register each published table as a temp view,
  *    `createOrReplaceTempView` being the same
  *    create-if-absent/replace-if-present idempotency the `DO $$` block
  *    buys (running [[ensure]] twice is a no-op, not an error);
  *  - subscription filter: the change feed restricted to the published
  *    tables — a pushdown-friendly `filter` on the envelope's qualified
  *    table name, so unpublished tables' changes are pruned at the scan,
  *    not shipped and dropped.
  */
object Publication {

  /** A named set of schema-qualified tables ("schema.table"). */
  case class Spec(name: String, tables: Seq[String]) {
    require(name.nonEmpty && tables.nonEmpty, "publication needs a name and tables")
  }

  /** Idempotent catalog setup: each published PHYSICAL table becomes a
    * temp view `<publication>__<table>`. Unknown table names fail fast
    * (the reference's DDL would, too).
    */
  def ensure(spark: SparkSession, sfDir: String, spec: Spec): Unit =
    spec.tables.foreach { qualified =>
      val table = qualified.split('.').last
      val df = Tables.byName(spark, sfDir, table)
      df.createOrReplaceTempView(s"${spec.name}__$table")
    }

  /** Subscriber-side feed: envelope rows restricted to the publication.
    * The predicate is a plain `IN` on schemaName/tableName columns —
    * partition- and scan-prunable on any envelope store partitioned by
    * table (the layout D12 routing writes).
    */
  def feed(envelope: DataFrame, spec: Spec): DataFrame =
    envelope.filter(
      concat(col("schemaName"), lit("."), col("tableName")).isin(spec.tables: _*))
}
