package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-layout planning operators — the piece of a 100 TB pipeline that
  * decides HOW bytes land on disk so later scans can prune:
  *
  *  - `layout_zorder` — Z-order (Morton) clustering quality report:
  *    interleave range-normalized bits of two scan predicates'
  *    columns and report, per Z-bucket, how tight the per-bucket
  *    min/max ranges are. Tight ranges = parquet row-group stats prune
  *    multi-dimensionally, the mechanism behind Delta/Iceberg
  *    OPTIMIZE ZORDER. Everything is integer bit arithmetic —
  *    bit-identical across engines and partitionings.
  *  - `layout_range_split` — balanced range-partition boundaries over
  *    the key's DISTINCT values (ntile over the deduplicated key space):
  *    the split points a writer would feed to repartitionByRange. The
  *    distinct-first shape is what makes the single-partition ntile
  *    window safe: the key space is orders of magnitude smaller than
  *    the data (at true scale you'd sample the distinct relation; the
  *    exact form doubles as its own oracle).
  */
object Layout {

  private[graft] val ZBITS = 8 // bits per dimension → 16-bit Morton code
  private val ZBUCKET_SHIFT = 10 // keep top 6 bits → 64 buckets
  private val SPLITS = 32
  private val TARGET_CHARS = 100000L // compaction target: chars per output file

  /** Interleave the low ZBITS of `a` (odd positions) and `b` (even):
    * the Morton code as a sum of shifted bit tests — pure integer ops,
    * whole-stage-codegen friendly, and expressible identically in the
    * oracle's SQL.
    */
  private[graft] def morton(a: Column, b: Column): Column =
    (0 until ZBITS).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  private def mortonSql(a: String, b: String): String =
    (0 until ZBITS).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-bucket stats over lineitem's (l_partkey, l_suppkey): coords are
    // range-normalized to ZBITS via (key · 2^ZBITS) div (max+1) — a
    // 1-row max aggregate broadcast into the scan (same bounded shape
    // as a scalar subquery). The report shows each of the 64 buckets
    // covering ~1/8 of EACH key's range simultaneously — the 2-D
    // pruning a linear sort on one key cannot give.
    "layout_zorder" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      val m = li.agg((max("l_partkey") + 1L).as("mp"),
        (max("l_suppkey") + 1L).as("ms"))
      val coords = li.crossJoin(broadcast(m))
        .withColumn("cp", expr(s"(l_partkey * ${1L << ZBITS}) div mp"))
        .withColumn("cs", expr(s"(l_suppkey * ${1L << ZBITS}) div ms"))
      coords
        .withColumn("z_bucket", shiftright(morton(col("cp"), col("cs")), ZBUCKET_SHIFT))
        .groupBy("z_bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
    }),

    // Small-file compaction plan: per source partition of the document
    // corpus, how many TARGET_CHARS-sized output files a compaction
    // rewrite should produce and the mean docs per file — the planner
    // behind OPTIMIZE/rewriteDataFiles. One hash aggregation; all
    // integer ceil-division, so the plan is engine-exact. At 100 TB the
    // same aggregate runs per (table, partition) over the file listing,
    // which is millions of rows, not billions — planner-sized.
    "layout_compaction_plan" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        // greatest(1, …): a partition whose docs are all empty still
        // writes one file — and div-by-zero never reaches the plan
        .withColumn("n_files",
          expr(s"greatest(1L, (total_chars + ${TARGET_CHARS - 1}) div $TARGET_CHARS)"))
        .withColumn("docs_per_file",
          expr("(n_docs + n_files - 1) div n_files"))
    }),

    // Balanced range-split boundaries for l_orderkey: distinct keys,
    // ntile(SPLITS) in key order, then each tile's [lo, hi] + key count.
    // ntile's fill rule (earlier tiles get the remainder) is shared SQL
    // semantics, so the tiles match the oracle exactly.
    "layout_range_split" -> ((s, d) => {
      val ks = Tables.lineitem(s, d).select("l_orderkey").distinct()
      val w = Window.orderBy("l_orderkey")
      ks.withColumn("split_id", ntile(SPLITS).over(w))
        .groupBy("split_id")
        .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"),
          count(lit(1)).as("n_keys"))
    })
  )

  val oracles: Map[String, String] = Map(
    "layout_zorder" ->
      s"""WITH m AS (SELECT MAX(l_partkey) + 1 AS mp, MAX(l_suppkey) + 1 AS ms FROM lineitem),
         |c AS (SELECT (l_partkey * ${1L << ZBITS}) // mp AS cp,
         |             (l_suppkey * ${1L << ZBITS}) // ms AS cs,
         |             l_partkey, l_suppkey
         |      FROM lineitem, m)
         |SELECT CAST((${mortonSql("cp", "cs")}) >> $ZBUCKET_SHIFT AS BIGINT) AS z_bucket,
         |  COUNT(*) AS n_rows,
         |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |  MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
         |FROM c GROUP BY 1""".stripMargin,
    // DuckDB's SUM over BIGINT widens to HUGEINT, and greatest/'//'
    // propagate it — cast every derived column back to BIGINT so the
    // driver's type-sensitive value hash matches Spark's LongType
    // (same convention as Dedup's CAST(SUM(…) AS BIGINT)).
    "layout_compaction_plan" ->
      s"""WITH agg AS (SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |  FROM documents GROUP BY source),
         |f AS (SELECT source, n_docs, total_chars,
         |    CAST(greatest(1, (total_chars + ${TARGET_CHARS - 1}) // $TARGET_CHARS) AS BIGINT) AS n_files
         |  FROM agg)
         |SELECT source, n_docs, total_chars, n_files,
         |  CAST((n_docs + n_files - 1) // n_files AS BIGINT) AS docs_per_file
         |FROM f""".stripMargin,
    "layout_range_split" ->
      s"""SELECT split_id, MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi,
         |  COUNT(*) AS n_keys
         |FROM (SELECT l_orderkey, CAST(ntile($SPLITS) OVER (ORDER BY l_orderkey) AS INT) AS split_id
         |      FROM (SELECT DISTINCT l_orderkey FROM lineitem) dk) t
         |GROUP BY split_id""".stripMargin
  )
}
