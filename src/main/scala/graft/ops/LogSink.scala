package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** K3 analog — the durable structured log the reference tees every
  * Info+ line into (`logger.go:56-73`: a custom zap WriteSyncer doing
  * `INSERT INTO logs(entry)` per line, console + SQLite via the tee at
  * `logger.go:42-53`).
  *
  * Spark-side: an append-only parquet log table. Each [[append]] writes
  * NEW files only (mode=append never rewrites existing ones), so a
  * crash mid-append can at worst lose the in-flight batch — committed
  * records are immutable, the same durability row-wise INSERTs gave the
  * reference. Unlike the reference's single free-text `entry` column,
  * records are STRUCTURED (level/component/message + the replication
  * positions the reference interpolates into strings), so the log is
  * queryable without regex archaeology.
  */
object LogSink {

  /** One log record. `firstLsn`/`lastLsn` carry replication progress on
    * pipeline-progress records (-1 elsewhere), mirroring the LSN the
    * reference logs on every checkpoint cycle.
    */
  case class LogRecord(ts: Timestamp, level: String, component: String,
      message: String, batchId: Long, nRows: Long, firstLsn: Long, lastLsn: Long)

  def append(spark: SparkSession, dir: String, records: Seq[LogRecord]): Unit = {
    import spark.implicits._
    if (records.nonEmpty)
      spark.createDataset(records)
        // a log append is a handful of rows — one file, not one per core
        .coalesce(1)
        .write.mode("append").parquet(dir)
  }

  def read(spark: SparkSession, dir: String): Dataset[LogRecord] = {
    import spark.implicits._
    spark.read.parquet(dir).as[LogRecord]
  }

  /** Progress record for one micro-batch of the upsert sink — what the
    * reference's replicator logs per WAL message + checkpoint cycle.
    * One count/min/max aggregation over the batch; callers compute it
    * before the sink commit and append it after (see
    * ChangeLogStream.loggedUpsertBatch).
    */
  def progressRecord(batch: DataFrame, batchId: Long, lsnCol: String,
      component: String): LogRecord = {
    import org.apache.spark.sql.functions._
    // cast the min/max to long IN the aggregation: the version column is
    // any orderable numeric/timestamp type (upsertBatch accepts them
    // all), and a raw getLong on an int or timestamp min would throw
    // AFTER the upsert already committed
    val row = batch.agg(count(lit(1)),
      min(col(lsnCol)).cast("long"), max(col(lsnCol)).cast("long")).head()
    val n = row.getLong(0)
    // rows may exist with an all-null lsn column (min/max NULL even
    // though n > 0) — the -1 fence must cover that, not NPE
    def lsn(i: Int): Long = if (n == 0 || row.isNullAt(i)) -1L else row.getLong(i)
    LogRecord(new Timestamp(System.currentTimeMillis()), "INFO", component,
      s"batch $batchId: $n rows", batchId, n, lsn(1), lsn(2))
  }
}
