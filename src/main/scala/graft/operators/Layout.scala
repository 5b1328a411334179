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
  *  - `layout_skipping_gain` — the zone-map ROI report: the same 2-D
  *    box predicate evaluated against a linear (one-key) layout and the
  *    z-ordered layout, counting buckets/rows that survive min/max
  *    pruning under each. Read amplification quantifies what the
  *    OPTIMIZE ZORDER rewrite buys; the verdict pass is O(buckets).
  *  - `layout_range_split` — balanced range-partition boundaries over
  *    the key space, the way Spark's own RangePartitioner earns them at
  *    scale: boundary candidates come from a DETERMINISTIC salted-hash
  *    sample of the distinct keys (membership a pure function of the
  *    key, so both engines pick the identical sample), split points are
  *    the sample's SPLITS-quantile ranks, and per-split [lo, hi] + key
  *    counts are EXACT — one fully-parallel aggregation against the
  *    broadcast boundary array. Only the boundary PLACEMENT is sampled;
  *    the distinct-key relation itself never crosses a single-partition
  *    exchange (a global ntile over billions of distinct keys would
  *    funnel them all through one sorted task).
  */
object Layout {

  private[graft] val ZBITS = 8 // bits per dimension → 16-bit Morton code
  private val ZBUCKET_SHIFT = 10 // keep top 6 bits → 64 buckets
  private val SPLITS = 32
  // boundary-sample rate for layout_range_split: md5 3-hex-char prefix
  // < 0x041 ⇒ 65/4096 ≈ 1.6% of distinct keys feed the quantile pass.
  // Registered in graft.SampleRates; PlanQualitySpec asserts the 1/32
  // ceiling over every registered rate.
  private val RS_RATE_HEX = graft.SampleRates.rates("layout_range_split")
  private val TARGET_CHARS = 100000L // compaction target: chars per output file
  // layout_hilbert_gain file width in curve positions — deliberately
  // NOT a power of 4: aligned widths make Hilbert and Morton buckets
  // the same squares and the comparison degenerate (see the query doc)
  private val HGAIN_BUCKET = 1000

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

  /** Hilbert index of the ZBITS-per-dimension grid cell (cp, cs) — the
    * standard xy2d bit-descent (quadrant digit + reflect/swap rotation
    * per level, the textbook formulation): at each bit level the
    * quadrant contributes s²·((3·rx) XOR ry) and the frame rotates so
    * the NEXT level's quadrant is read in curve orientation. Unlike
    * Morton, consecutive indices are always grid NEIGHBORS (HilbertSpec
    * proves bijectivity + unit-step continuity over the full 256×256
    * grid), so equal-index-range buckets are tighter rectangles — the
    * reason Hilbert beats Z-order as a clustering key.
    *
    * Each level is its own projection over the previous level's
    * columns (hx/hy referenced more than once per step, so Catalyst's
    * CollapseProject keeps the steps chunked instead of inlining an
    * exponentially-grown expression) — pure integer ops end to end.
    */
  private[graft] def withHilbert(df: DataFrame): DataFrame = {
    val n = 1L << ZBITS
    var cur = df.withColumn("hx", col("cp")).withColumn("hy", col("cs"))
      .withColumn("hd", lit(0L))
    for (k <- (ZBITS - 1) to 0 by -1) {
      val s = 1L << k
      val rx = shiftright(col("hx"), k).bitwiseAND(lit(1L))
      val ry = shiftright(col("hy"), k).bitwiseAND(lit(1L))
      val keep = cur.columns.filterNot(Set("hx", "hy", "hd")).map(col).toSeq
      cur = cur.select(keep ++ Seq(
        when(ry === 0L,
          when(rx === 1L, lit(n - 1) - col("hy")).otherwise(col("hy")))
          .otherwise(col("hx")).as("hx"),
        when(ry === 0L,
          when(rx === 1L, lit(n - 1) - col("hx")).otherwise(col("hx")))
          .otherwise(col("hy")).as("hy"),
        (col("hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)).as("hd")): _*)
    }
    cur.drop("hx", "hy")
  }

  /** The same bit-descent as [[withHilbert]], unrolled as ZBITS chained
    * CTEs (h1..h$ZBITS over h0) with per-step column names — no lateral
    * alias shadowing ambiguity. Caller provides
    * `h0 AS (SELECT <pass>, cp AS hx0, cs AS hy0, CAST(0 AS BIGINT) AS hd0 ...)`
    * and reads `hd$ZBITS` from `h$ZBITS`.
    */
  private def hilbertSqlChain(pass: String): String = {
    val n = 1L << ZBITS
    (0 until ZBITS).map { i =>
      val k = ZBITS - 1 - i
      val s = 1L << k
      val rx = s"((hx$i >> $k) & 1)"
      val ry = s"((hy$i >> $k) & 1)"
      s"""h${i + 1} AS (SELECT $pass,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
         |    THEN ${n - 1} - hy$i ELSE hy$i END) ELSE hx$i END AS hx${i + 1},
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
         |    THEN ${n - 1} - hx$i ELSE hx$i END) ELSE hy$i END AS hy${i + 1},
         |  hd$i + ${s * s} * xor(3 * $rx, $ry) AS hd${i + 1}
         |FROM h$i)""".stripMargin
    }.mkString(",\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-bucket stats over lineitem's (l_partkey, l_suppkey): coords are
    // range-normalized to ZBITS via (key · 2^ZBITS) div (max+1) — a
    // 1-row max aggregate broadcast into the scan (same bounded shape
    // as a scalar subquery). The report shows each of the 64 buckets
    // covering ~1/8 of EACH key's range simultaneously — the 2-D
    // pruning a linear sort on one key cannot give.
    "layout_zorder" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d).select("l_partkey", "l_suppkey")
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

    // Zone-map skipping ROI: the proof that z-ordering EARNS its
    // rewrite. Bucket the fact 64 ways twice — linearly by one key, and
    // by the Morton code of both — compute each bucket's min/max "zone
    // map" for both keys, and evaluate the same mid-range 2-D box
    // predicate against both layouts: how many buckets (and rows) must
    // be read, vs how many rows actually match. The z-layout prunes on
    // BOTH dimensions at once; the linear layout can only prune its
    // sort key, so its second-dimension ranges stay full-width and its
    // read amplification is the cost of the wrong layout. Two hash
    // aggregations over one scan + O(buckets) verdicts — all integer.
    "layout_skipping_gain" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d).select("l_partkey", "l_suppkey")
      val m = li.agg((max("l_partkey") + 1L).as("mp"),
        (max("l_suppkey") + 1L).as("ms"))
      val coords = li.crossJoin(broadcast(m))
        .withColumn("cp", expr(s"(l_partkey * ${1L << ZBITS}) div mp"))
        .withColumn("cs", expr(s"(l_suppkey * ${1L << ZBITS}) div ms"))
        .withColumn("z_bucket",
          shiftright(morton(col("cp"), col("cs")), ZBUCKET_SHIFT))
        .withColumn("lin_bucket", expr("(l_partkey * 64) div mp"))
        .withColumn("p_lo", expr("mp div 4"))
        .withColumn("p_hi", expr("mp div 2 - 1"))
        .withColumn("s_lo", expr("ms div 4"))
        .withColumn("s_hi", expr("ms div 2 - 1"))
        .transform(graft.CachePool.persist) // two layout passes, one scan
      val inBox = col("l_partkey") >= col("p_lo") &&
        col("l_partkey") <= col("p_hi") &&
        col("l_suppkey") >= col("s_lo") && col("l_suppkey") <= col("s_hi")
      def stats(bucket: Column, name: String) = coords
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(inBox, 1L).otherwise(0L)).as("n_match"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"),
          max("p_lo").as("p_lo"), max("p_hi").as("p_hi"),
          max("s_lo").as("s_lo"), max("s_hi").as("s_hi"))
        .withColumn("read",
          !(col("max_pk") < col("p_lo") || col("min_pk") > col("p_hi") ||
            col("max_sk") < col("s_lo") || col("min_sk") > col("s_hi")))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("read"), 1L).otherwise(0L)).as("n_buckets_read"),
          sum(when(col("read"), col("n_rows")).otherwise(0L))
            .as("n_rows_read"),
          sum("n_match").as("n_rows_matched"))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("n_buckets_read"), col("n_rows_read"), col("n_rows_matched"),
          when(col("n_rows_matched") === 0L, lit(null).cast("double"))
            .otherwise(col("n_rows_read").cast("double") /
              col("n_rows_matched").cast("double"))
            .as("read_amplification"))
      stats(col("z_bucket"), "zorder")
        .unionByName(stats(col("lin_bucket"), "linear"))
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

    // Balanced range-split boundaries for l_orderkey, RangePartitioner-
    // style (the r8 form ran a global ntile over EVERY distinct key —
    // one sorted task holding billions of rows at 100 TB):
    //   1. sample the distinct keys by salted md5 (RS_RATE ≈ 1.6%;
    //      membership is a pure function of the key — the
    //      text_train_split convention — so the oracle draws the
    //      byte-identical sample);
    //   2. boundaries = the sample's SPLITS-quantile ranks via
    //      Boundaries.quantileArray (histogram + distributed prefix-sum
    //      + rank-extraction join — since r12 even this O(sample) pass
    //      is range-partitioned, no partitionless window anywhere; at a
    //      bigger corpus you lower the rate, never change the shape);
    //   3. EXACT per-split [lo, hi] + key counts: broadcast the sorted
    //      boundary array (≤ SPLITS−1 values) into a fully-parallel
    //      pass over the distinct keys — split_id = 1 + |{b < key}|,
    //      keys equal to a boundary land in the lower split.
    // Tiles stay contiguous, disjoint and exactly counted; only their
    // SIZES are sample-approximate — which is precisely the contract of
    // repartitionByRange itself.
    "layout_range_split" -> ((s, d) => {
      val ks = Tables.lineitemShared(s, d).select("l_orderkey").distinct()
      val samp = ks.filter(
        substring(md5(concat(lit("rs|"), col("l_orderkey").cast("string"))),
          1, 3) < RS_RATE_HEX)
      // boundary ranks via the shared Boundaries helper (r12): over the
      // DISTINCT key sample every histogram count is 1, so min{v :
      // cum(v) ≥ rk} is exactly the old row_number()-rank value — same
      // boundaries, but the ordered pass is range-partitioned instead
      // of a partitionless row_number window. dedupValues collapses
      // ranks that share a key (split boundaries must be distinct).
      val barr = Boundaries
        .quantileArray(samp, "l_orderkey", SPLITS, "barr", dedupValues = true)
        .drop("__k")
      ks.crossJoin(broadcast(barr))
        .withColumn("split_id",
          (lit(1) + size(filter(col("barr"), x => x < col("l_orderkey"))))
            .cast("int"))
        .groupBy("split_id")
        .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"),
          count(lit(1)).as("n_keys"))
    }),

    // Hilbert clustering report — layout_zorder's upgrade path: bucket
    // the same normalized 2-D coords by HILBERT index range instead of
    // Morton. Same 64 buckets, same min/max zone-map stats, directly
    // comparable rows; layout_hilbert_gain below runs the measured
    // head-to-head under the same box predicate.
    "layout_hilbert" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d).select("l_partkey", "l_suppkey")
      val m = li.agg((max("l_partkey") + 1L).as("mp"),
        (max("l_suppkey") + 1L).as("ms"))
      val coords = li.crossJoin(broadcast(m))
        .withColumn("cp", expr(s"(l_partkey * ${1L << ZBITS}) div mp"))
        .withColumn("cs", expr(s"(l_suppkey * ${1L << ZBITS}) div ms"))
      withHilbert(coords)
        .withColumn("h_bucket", shiftright(col("hd"), ZBUCKET_SHIFT))
        .groupBy("h_bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
    }),

    // Hilbert vs Z-order, measured under the conditions where they
    // actually differ. Buckets ALIGNED to subtree boundaries (hd >>
    // 10) are geometrically identical 32x32 squares for BOTH curves —
    // only the numbering differs — so any aligned-bucket comparison
    // reads equal and proves nothing (measured first, then fixed).
    // Real writers cut files by ROW COUNT along the curve, at offsets
    // that never align with subtrees; modeled here as UNALIGNED
    // fixed-width index ranges (div HGAIN_BUCKET, not a power of 4).
    // There Hilbert's unit-step continuity keeps every bucket one
    // compact blob while Morton's quadrant jumps scatter buckets that
    // straddle them: this box measures 7 vs 11 buckets read at every
    // SF. Box is the CENTER square (3/8..5/8 of each key), straddling
    // both midlines — the worst case for quadrant jumps. All integer;
    // one scan, one persist, two O(buckets) verdicts.
    "layout_hilbert_gain" -> ((s, d) => {
      val li = Tables.lineitemShared(s, d).select("l_partkey", "l_suppkey")
      val m = li.agg((max("l_partkey") + 1L).as("mp"),
        (max("l_suppkey") + 1L).as("ms"))
      val coords = withHilbert(li.crossJoin(broadcast(m))
        .withColumn("cp", expr(s"(l_partkey * ${1L << ZBITS}) div mp"))
        .withColumn("cs", expr(s"(l_suppkey * ${1L << ZBITS}) div ms"))
        .withColumn("z_idx", morton(col("cp"), col("cs")))
        .withColumn("p_lo", expr("(mp * 3) div 8"))
        .withColumn("p_hi", expr("(mp * 5) div 8 - 1"))
        .withColumn("s_lo", expr("(ms * 3) div 8"))
        .withColumn("s_hi", expr("(ms * 5) div 8 - 1")))
        .withColumn("h_bucket", expr(s"hd div $HGAIN_BUCKET"))
        .withColumn("zg_bucket", expr(s"z_idx div $HGAIN_BUCKET"))
        .transform(graft.CachePool.persist)
      val inBox = col("l_partkey") >= col("p_lo") &&
        col("l_partkey") <= col("p_hi") &&
        col("l_suppkey") >= col("s_lo") && col("l_suppkey") <= col("s_hi")
      def stats(bucket: Column, name: String) = coords
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(inBox, 1L).otherwise(0L)).as("n_match"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"),
          max("p_lo").as("p_lo"), max("p_hi").as("p_hi"),
          max("s_lo").as("s_lo"), max("s_hi").as("s_hi"))
        .withColumn("read",
          !(col("max_pk") < col("p_lo") || col("min_pk") > col("p_hi") ||
            col("max_sk") < col("s_lo") || col("min_sk") > col("s_hi")))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("read"), 1L).otherwise(0L)).as("n_buckets_read"),
          sum(when(col("read"), col("n_rows")).otherwise(0L))
            .as("n_rows_read"),
          sum("n_match").as("n_rows_matched"))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("n_buckets_read"), col("n_rows_read"), col("n_rows_matched"),
          when(col("n_rows_matched") === 0L, lit(null).cast("double"))
            .otherwise(col("n_rows_read").cast("double") /
              col("n_rows_matched").cast("double"))
            .as("read_amplification"))
      stats(col("h_bucket"), "hilbert")
        .unionByName(stats(col("zg_bucket"), "zorder"))
    }),

    // Fingerprint-sorted corpus layout — the text-store sibling of
    // OPTIMIZE ZORDER: write shards in SimHash order instead of
    // arrival order, so near-duplicate documents land adjacent. Two
    // payoffs at 100 TB: general-purpose compressors see repeated
    // byte runs inside a block (near-dups share most shingles), and a
    // near-dup investigation scan prunes to the fingerprint range
    // instead of touching every shard. The report MEASURES the
    // locality both orderings give: mean Hamming distance between
    // ADJACENT fingerprints under arrival (doc_id) order vs SimHash
    // order — lower = more similar neighbors. Adjacency is computed
    // WITHIN range-shards of each ordering's own sort key (the lag
    // window is shard-partitioned — a global-order window would
    // funnel the corpus through one task; the O(shards) seam pairs
    // this drops are the same pairs a sharded writer never co-locates
    // anyway). Fingerprints are SIGNED: the oracle shards with
    // DuckDB's arithmetic `>>` (its `//` truncates toward zero and
    // disagrees with shiftright below zero — see the oracle note);
    // mean = exact BIGINT sum ÷ exact count, one IEEE division.
    "layout_fingerprint_order" -> ((s, d) => {
      val fp = Dedup.simhashDf(s, d)
      def adjacency(label: String, shard: Column, order: Column) = {
        val w = Window.partitionBy("shard").orderBy(order, col("doc_id"))
        fp.withColumn("shard", shard)
          .withColumn("prev", lag(col("simhash"), 1).over(w))
          .filter(col("prev").isNotNull)
          .agg(count(lit(1)).as("n_pairs"),
            (sum(expr("cast(bit_count(simhash ^ prev) as bigint)"))
              .cast("double") / count(lit(1)).cast("double"))
              .as("mean_adjacent_hamming"))
          .select(lit(label).as("ordering"),
            col("n_pairs"), col("mean_adjacent_hamming"))
      }
      adjacency("arrival_doc_id",
        expr("shiftright(doc_id, 5)"), col("doc_id"))
        .unionByName(adjacency("simhash_sorted",
          expr("shiftright(simhash, 60)"), col("simhash")))
    })
  )

  val oracles: Map[String, String] = Map(
    // Same simhash base as the dedup family. Fingerprints go NEGATIVE
    // (bit 63 weight), and DuckDB's `//` TRUNCATES toward zero while
    // Spark's shiftright floors — measured here: -5234 // 2^60 = 0 but
    // -5234 >> 60 = -1 — so the shard key uses DuckDB's `>>`, which IS
    // arithmetic/flooring, matching shiftright bit-for-bit.
    // xor+bit_count are integer-exact in both engines.
    "layout_fingerprint_order" ->
      s"""WITH sh AS (${Dedup.simhashSqlBase}),
         |aa AS (SELECT bit_count(xor(simhash, prev)) AS hd FROM (
         |    SELECT simhash, lag(simhash) OVER (
         |      PARTITION BY doc_id >> 5 ORDER BY doc_id) AS prev
         |    FROM sh) t WHERE prev IS NOT NULL),
         |bb AS (SELECT bit_count(xor(simhash, prev)) AS hd FROM (
         |    SELECT simhash, lag(simhash) OVER (
         |      PARTITION BY simhash >> 60 ORDER BY simhash, doc_id)
         |      AS prev
         |    FROM sh) t WHERE prev IS NOT NULL)
         |SELECT 'arrival_doc_id' AS ordering, COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(hd AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_adjacent_hamming
         |FROM aa
         |UNION ALL
         |SELECT 'simhash_sorted' AS ordering, COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(hd AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_adjacent_hamming
         |FROM bb""".stripMargin,
    "layout_hilbert" ->
      s"""WITH m AS (SELECT MAX(l_partkey) + 1 AS mp, MAX(l_suppkey) + 1 AS ms FROM lineitem),
         |c AS (SELECT (l_partkey * ${1L << ZBITS}) // mp AS cp,
         |             (l_suppkey * ${1L << ZBITS}) // ms AS cs,
         |             l_partkey, l_suppkey
         |      FROM lineitem, m),
         |h0 AS (SELECT l_partkey, l_suppkey, cp AS hx0, cs AS hy0,
         |         CAST(0 AS BIGINT) AS hd0 FROM c),
         |${hilbertSqlChain("l_partkey, l_suppkey")}
         |SELECT CAST(hd$ZBITS >> $ZBUCKET_SHIFT AS BIGINT) AS h_bucket,
         |  COUNT(*) AS n_rows,
         |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |  MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
         |FROM h$ZBITS GROUP BY 1""".stripMargin,
    "layout_hilbert_gain" ->
      s"""WITH m AS (SELECT MAX(l_partkey) + 1 AS mp, MAX(l_suppkey) + 1 AS ms FROM lineitem),
         |c AS (SELECT l_partkey, l_suppkey,
         |    (l_partkey * ${1L << ZBITS}) // mp AS cp,
         |    (l_suppkey * ${1L << ZBITS}) // ms AS cs,
         |    (mp * 3) // 8 AS p_lo, (mp * 5) // 8 - 1 AS p_hi,
         |    (ms * 3) // 8 AS s_lo, (ms * 5) // 8 - 1 AS s_hi
         |  FROM lineitem, m),
         |h0 AS (SELECT l_partkey, l_suppkey, p_lo, p_hi, s_lo, s_hi,
         |    (${mortonSql("cp", "cs")}) // $HGAIN_BUCKET AS zg_bucket,
         |    cp AS hx0, cs AS hy0, CAST(0 AS BIGINT) AS hd0
         |  FROM c),
         |${hilbertSqlChain("l_partkey, l_suppkey, p_lo, p_hi, s_lo, s_hi, zg_bucket")},
         |c2 AS (SELECT *, hd$ZBITS // $HGAIN_BUCKET AS h_bucket,
         |    CASE WHEN l_partkey >= p_lo AND l_partkey <= p_hi
         |      AND l_suppkey >= s_lo AND l_suppkey <= s_hi
         |      THEN 1 ELSE 0 END AS in_box
         |  FROM h$ZBITS),
         |hb AS (SELECT h_bucket, COUNT(*) AS n_rows, SUM(in_box) AS n_match,
         |    MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |    MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk,
         |    MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
         |    MAX(s_lo) AS s_lo, MAX(s_hi) AS s_hi
         |  FROM c2 GROUP BY 1),
         |zb AS (SELECT zg_bucket, COUNT(*) AS n_rows, SUM(in_box) AS n_match,
         |    MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |    MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk,
         |    MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
         |    MAX(s_lo) AS s_lo, MAX(s_hi) AS s_hi
         |  FROM c2 GROUP BY 1),
         |v AS (
         |  SELECT 'hilbert' AS layout, n_rows, n_match,
         |    CASE WHEN max_pk < p_lo OR min_pk > p_hi
         |      OR max_sk < s_lo OR min_sk > s_hi THEN 0 ELSE 1 END AS rd
         |  FROM hb
         |  UNION ALL
         |  SELECT 'zorder' AS layout, n_rows, n_match,
         |    CASE WHEN max_pk < p_lo OR min_pk > p_hi
         |      OR max_sk < s_lo OR min_sk > s_hi THEN 0 ELSE 1 END AS rd
         |  FROM zb)
         |SELECT layout, COUNT(*) AS n_buckets,
         |  CAST(SUM(rd) AS BIGINT) AS n_buckets_read,
         |  CAST(SUM(rd * n_rows) AS BIGINT) AS n_rows_read,
         |  CAST(SUM(n_match) AS BIGINT) AS n_rows_matched,
         |  CASE WHEN SUM(n_match) = 0 THEN NULL
         |    ELSE CAST(CAST(SUM(rd * n_rows) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(SUM(n_match) AS BIGINT) AS DOUBLE) END
         |    AS read_amplification
         |FROM v GROUP BY layout""".stripMargin,
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
    // Same coords derivation as layout_zorder, evaluated under BOTH
    // bucketings; HUGEINT sums cast back to BIGINT as usual.
    "layout_skipping_gain" ->
      s"""WITH m AS (SELECT MAX(l_partkey) + 1 AS mp, MAX(l_suppkey) + 1 AS ms FROM lineitem),
         |c AS (SELECT l_partkey, l_suppkey,
         |    (l_partkey * ${1L << ZBITS}) // mp AS cp,
         |    (l_suppkey * ${1L << ZBITS}) // ms AS cs,
         |    (l_partkey * 64) // mp AS lin_bucket,
         |    mp // 4 AS p_lo, mp // 2 - 1 AS p_hi,
         |    ms // 4 AS s_lo, ms // 2 - 1 AS s_hi
         |  FROM lineitem, m),
         |c2 AS (SELECT *,
         |    (${mortonSql("cp", "cs")}) >> $ZBUCKET_SHIFT AS z_bucket,
         |    CASE WHEN l_partkey >= p_lo AND l_partkey <= p_hi
         |      AND l_suppkey >= s_lo AND l_suppkey <= s_hi
         |      THEN 1 ELSE 0 END AS in_box
         |  FROM c),
         |zb AS (SELECT z_bucket, COUNT(*) AS n_rows, SUM(in_box) AS n_match,
         |    MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |    MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk,
         |    MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
         |    MAX(s_lo) AS s_lo, MAX(s_hi) AS s_hi
         |  FROM c2 GROUP BY 1),
         |lb AS (SELECT lin_bucket, COUNT(*) AS n_rows, SUM(in_box) AS n_match,
         |    MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |    MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk,
         |    MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
         |    MAX(s_lo) AS s_lo, MAX(s_hi) AS s_hi
         |  FROM c2 GROUP BY 1),
         |v AS (
         |  SELECT 'zorder' AS layout, n_rows, n_match,
         |    CASE WHEN max_pk < p_lo OR min_pk > p_hi
         |      OR max_sk < s_lo OR min_sk > s_hi THEN 0 ELSE 1 END AS rd
         |  FROM zb
         |  UNION ALL
         |  SELECT 'linear' AS layout, n_rows, n_match,
         |    CASE WHEN max_pk < p_lo OR min_pk > p_hi
         |      OR max_sk < s_lo OR min_sk > s_hi THEN 0 ELSE 1 END AS rd
         |  FROM lb)
         |SELECT layout, COUNT(*) AS n_buckets,
         |  CAST(SUM(rd) AS BIGINT) AS n_buckets_read,
         |  CAST(SUM(rd * n_rows) AS BIGINT) AS n_rows_read,
         |  CAST(SUM(n_match) AS BIGINT) AS n_rows_matched,
         |  CASE WHEN SUM(n_match) = 0 THEN NULL
         |    ELSE CAST(CAST(SUM(rd * n_rows) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(SUM(n_match) AS BIGINT) AS DOUBLE) END
         |    AS read_amplification
         |FROM v GROUP BY layout""".stripMargin,
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
    // Mirrors the sampled-boundary convention exactly: identical salted
    // md5 sample, identical (i·m) // SPLITS quantile ranks, identical
    // keys-equal-to-a-boundary-go-left assignment.
    "layout_range_split" ->
      s"""WITH dk AS (SELECT DISTINCT l_orderkey FROM lineitem),
         |samp AS (SELECT l_orderkey FROM dk
         |  WHERE substr(md5('rs|' || CAST(l_orderkey AS VARCHAR)), 1, 3) < '$RS_RATE_HEX'),
         |r AS (SELECT l_orderkey, row_number() OVER (ORDER BY l_orderkey) AS rn,
         |    COUNT(*) OVER () AS m FROM samp),
         |b AS (SELECT DISTINCT r.l_orderkey AS bnd
         |  FROM r JOIN (SELECT unnest(range(1, $SPLITS)) AS i) ii
         |    ON r.rn = (ii.i * r.m) // $SPLITS),
         |asg AS (SELECT dk.l_orderkey,
         |    CAST(1 + (SELECT COUNT(*) FROM b WHERE b.bnd < dk.l_orderkey) AS INT)
         |      AS split_id
         |  FROM dk)
         |SELECT split_id, MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi,
         |  COUNT(*) AS n_keys
         |FROM asg GROUP BY split_id""".stripMargin
  )
}
