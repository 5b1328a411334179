package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver corpus (TESTDATA.md).
  *
  * Plays the role of the reference's sources: the snapshot full-table scan
  * (reference `internal/wal/replicator.go:69-184`) becomes a partitioned
  * columnar parquet scan — Catalyst pushes predicates and prunes columns
  * into the scan, so downstream operators declare what they need and the
  * scan reads only that. At 100 TB each table is a directory of many
  * row-group-sized files; `spark.read.parquet` parallelizes by file split
  * automatically, nothing here assumes single-node materialization
  * (unlike the reference's `ReadAll`, replicator.go:103).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (early
    * corpus generations — Spark's vectorized reader rejects it outright)
    * and TIMESTAMP(MICROS) (current generations — reads natively). Handle
    * either: read under the legacy nanos-as-long conf (a no-op for µs
    * files), then normalize on the INFERRED type — a long column is nanos
    * and gets the same ns→µs truncation DuckDB applies; a timestamp
    * column is already µs and passes through. Dispatching on the inferred
    * schema (not the sfDir) keeps every events consumer agnostic to which
    * corpus generation it is reading.
    *
    * The legacy conf is needed only during eager schema inference, so it
    * is saved and restored around the read (verified empirically: the
    * execution path keeps producing correct values after the restore) —
    * reading events must not silently change how OTHER nanos parquet is
    * read for the rest of the session. No per-read parquet option exists
    * for this (probed: both spellings fail schema inference).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val raw = try table(s, d, "events")
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
    val norm = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        // µs files infer as TIMESTAMP_NTZ; cast to TIMESTAMP so consumers
        // see the SAME type the nanos path (timestamp_micros) produces —
        // unix_micros() and friends reject NTZ. Verify pins the session
        // to UTC, so the NTZ→LTZ cast is value-preserving vs the naive
        // timestamps the DuckDB oracle reads.
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    norm.select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Name-keyed lookup through the TYPED loaders (events needs its nanos
    * handling even when resolved dynamically); unknown names fail fast
    * with the catalog listed.
    */
  def byName(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "region" => region(s, d)
    case "nation" => nation(s, d)
    case "customer" => customer(s, d)
    case "supplier" => supplier(s, d)
    case "part" => part(s, d)
    case "orders" => orders(s, d)
    case "lineitem" => lineitem(s, d)
    case "events" | "users" => events(s, d) // "users" = the CDC table's role name
    case "documents" => documents(s, d)
    case "embeddings" => embeddings(s, d)
    case other => throw new IllegalArgumentException(
      s"unknown table $other; available: region nation customer supplier " +
        "part orders lineitem events users documents embeddings")
  }
}
