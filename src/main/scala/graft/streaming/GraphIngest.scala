package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Durable standing-index ingestion (r15 verdict #2) — the deployment
  * shape of the streamed HNSW-style edge append. The r15 equality test
  * proved `Similarity.appendGraphEdges` matches the batch A/B's
  * appended arm, but folded the standing assignment through a driver
  * collect and held edges in a driver set; here BOTH stores are
  * parquet, appended inside `foreachBatch`, so the query can die and
  * resume from its checkpoint with no index state in the driver at all
  * — the `upsertBatch` composition applied to the vector tier.
  *
  * Store layout (one directory per standing index):
  * {{{
  *   store/assign/batch=<id>/  (vec_id, e, cent_id)  multi-probe rows
  *   store/edges/batch=<id>/   (src, dst, sim)       appended edges
  * }}}
  *
  * Idempotency is the batch-keyed-overwrite convention: a foreachBatch
  * replay (crash after the writes, before the checkpoint commit)
  * rewrites the SAME `batch=<id>` directories with the SAME rows —
  * [[Similarity.appendGraphEdges]] is deterministic in (batch,
  * standing, cents), and a replay that already sees its own assign
  * rows in the store recomputes identical edges because `topGEdges`
  * group-maxes candidates per (src, dst), so the doubled target rows
  * collapse. Edges write FIRST: they derive from the PRE-batch
  * standing view, so a crash between the two writes replays against
  * the store state the edges were computed from.
  *
  * 100 TB shape: per batch, one broadcast join against the O(k·d)
  * standing centroids plus a cell-blocked top-G — the standing corpus
  * never reshuffles and never rewrites; the assign store is an
  * append-only partitioned relation a periodic compaction job would
  * re-bucket by cent_id (the same maintenance story as upsertBatch's
  * bucket files). Centroid non-emptiness validates ONCE at stream
  * construction ([[Similarity.incStandingState]] /
  * [[Similarity.validatedCentroids]]), keeping this per-batch path
  * job-free beyond its own two writes.
  */
object GraphIngest {

  /** The standing assignment a microbatch builds edges against: the
    * seed (the index's trained standing corpus assignment) plus every
    * batch appended so far. O(ingested) parquet rows, read with
    * partition discovery — never a shuffle; the probe join against it
    * is cell-blocked downstream.
    */
  def standingAssign(spark: SparkSession, storeDir: String,
                     seedAssign: DataFrame): DataFrame = {
    val p = new Path(s"$storeDir/assign")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      seedAssign.unionByName(
        spark.read.parquet(s"$storeDir/assign")
          .select("vec_id", "e", "cent_id"))
    else seedAssign
  }

  /** Every edge appended so far, deduplicated — the relation a reader
    * unions with the standing build's symmetrized edges. Empty (not an
    * error) before the first batch lands, so a search tier can compose
    * it unconditionally.
    */
  def edges(spark: SparkSession, storeDir: String): DataFrame = {
    val p = new Path(s"$storeDir/edges")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.parquet(p.toString).select("src", "dst").distinct()
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType))))
  }

  /** The `foreachBatch` sink: build the batch's blocked top-G edges
    * against the current standing view and append both stores under
    * this batch's id. Curried for
    * `writeStream.foreachBatch(GraphIngest.appendBatch(store, cents, seed) _)`.
    */
  def appendBatch(storeDir: String, cents: DataFrame, seedAssign: DataFrame)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val standing = standingAssign(spark, storeDir, seedAssign)
    val (newEdges, bAssign) = Similarity.appendGraphEdges(
      batch.select("vec_id", "e"), standing, cents)
    newEdges.write.mode("overwrite")
      .parquet(s"$storeDir/edges/batch=$batchId")
    bAssign.write.mode("overwrite")
      .parquet(s"$storeDir/assign/batch=$batchId")
  }

  /** Offline maintenance: fold every per-batch partition into one
    * compacted partition per store — `batch=-1`, a value no streaming
    * batchId ever takes, so the partition-discovery schema stays
    * uniform and the NEXT stream run keeps appending `batch=<id>`
    * directories beside it. The assign store rewrites bucketed-sorted
    * by cent_id (the probe join's blocking key — after compaction a
    * cell's rows are contiguous instead of scattered across every
    * batch file written since the last compaction); the edge store
    * group-maxes duplicate (src, dst) rows appended by different
    * batches. Value-preserving by construction: [[standingAssign]] /
    * [[edges]] read the same rows before and after (StreamingSpec's
    * durable-ingestion test asserts both, then appends a fresh batch
    * beside the compacted partition).
    *
    * Contract: run with NO active query on the store, after a CLEAN
    * shutdown — compaction folds only committed batches; an uncommitted
    * batch's replay-idempotency depends on its `batch=<id>` directory
    * being overwritten in place, which compaction would break. This is
    * the same offline-maintenance contract as a bucketed-store rewrite
    * in upsertBatch's world. At 100 TB the pattern is the standard
    * log-structured one: O(batches) small files fold into O(buckets)
    * sorted files on a schedule, appends stay O(batch).
    */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val fs = new Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fold(sub: String, write: (DataFrame, String) => Unit): Unit = {
      val dir = new Path(s"$storeDir/$sub")
      if (!fs.exists(dir)) return
      val tmp = new Path(s"$storeDir/${sub}_compacting")
      val old = new Path(s"$storeDir/${sub}_precompact")
      write(spark.read.parquet(dir.toString), tmp.toString)
      // rename-aside swap (the upsertBatch convention): the original
      // partitions move aside BEFORE the compacted data moves in and
      // drop only at the end, so every crash window leaves a complete
      // copy on disk — a leftover `_precompact`/`_compacting` directory
      // is the recovery marker an operator acts on before restarting
      fs.rename(dir, old)
      fs.mkdirs(dir)
      fs.rename(tmp, new Path(s"$storeDir/$sub/batch=-1"))
      fs.delete(old, true)
    }
    fold("assign", (df, out) => df
      .select("vec_id", "e", "cent_id")
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.parquet(out))
    fold("edges", (df, out) => df
      .groupBy("src", "dst").agg(max("sim").as("sim"))
      .write.parquet(out))
  }
}
