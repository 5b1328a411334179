package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Third relational wave: non-equi range join, full outer join, exact
  * portable statistics, ordered string aggregation, argmax/argmin,
  * boolean aggregates, regexp scalars, and bitwise scalars.
  *
  * Portability notes (driver hashes bitwise against DuckDB):
  *  - corr/stddev are computed from EXACT decimal power sums cast to
  *    double at the end, with the final arithmetic written identically
  *    on both sides — engine-native corr()/stddev() accumulate doubles
  *    in partition order and would never hash-match.
  *  - string aggregation sorts explicitly (array_sort ∘ collect_list ≡
  *    string_agg ORDER BY): unordered collect is nondeterministic by
  *    partitioning on ANY engine.
  *  - argmax goes through a (value, tiebreak) struct on both sides so
  *    ties cannot make the result partitioning-dependent.
  *
  * Scale notes: the band table in join_range is broadcast (a nested-loop
  * join against 4 rows, never a shuffle of orders); agg_string_concat
  * pre-filters to a small deterministic subset before collect_list —
  * unbounded per-group collect is an anti-pattern at 100 TB.
  */
object RelationalExt2 {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** join_bloom_prune filter design point: k hash functions, bits
    * per BUILD key (m = BITS_PER_KEY·|build| slots total). With k=3
    * and 16 bits/key the fill is 1−e^(−3/16) ≈ 17% ⇒ FPR ≈ 0.17³ ≈
    * 0.5%, independent of scale because m tracks the build count.
    */
  private val BLOOM_K = 3
  private val BLOOM_BITS_PER_KEY = 16

  /** join_size_estimate sketch design point: depth (independent hash
    * rows, min taken across them) × width (counters per row). The CMS
    * inner-product estimator's one-sided error is ≤ e/W·|A|·|B| per row
    * with probability 1−1/e; min over D=5 rows drives the failure odds
    * to e^−5 ≈ 0.7% per (data, seed) draw — and the md5 hash family is
    * FIXED, so for given data the verdict is deterministic.
    */
  private val CMS_D = 5
  private val CMS_W = 8192

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Blocked fuzzy entity matching (the edit-distance tier of entity
    // resolution), via DELETION-NEIGHBORHOOD blocking: each name emits
    // 9 block keys — the digit suffix with position i removed, tagged
    // by i. Two same-length names at levenshtein distance ≤ 1 differ in
    // at most one digit position, so they MUST collide on the key that
    // deletes that position (pigeonhole — the simhash banding argument
    // on strings), and any colliding pair differs ONLY at the deleted
    // position, so blocking recall is exactly 1.0 for distance-1: no
    // declared miss class at all. Block sizes are bounded by the
    // alphabet (≤ 10 names share a deletion key), so candidates are
    // O(n), not O(block²) — a naive prefix block on THIS data (dense
    // sequential ids) degenerates to one block holding the whole table,
    // measured 3.2 s at sf0.01 and quadratic beyond. Output is O(n):
    // per name, how many near-matches and the smallest one.
    "join_fuzzy_block" -> ((s, d) => {
      // r17 (guide §2.3, narrower types): block keys are LONGs computed
      // by integer digit surgery, not strings built by substring+concat.
      // The 9-digit suffix is a value < 10^9; deleting the digit at
      // position i (1-based from the left) is
      //   (id DIV 10^(10-i)) · 10^(9-i) + id % 10^(9-i)  ∈ [0, 10^8),
      // and the position tag becomes i·10^8 — bijective with the old
      // "i:<8 digits>" strings (fixed width ⇒ value ⇔ digit string), so
      // the colliding PAIR SET is identical while the join hashes and
      // ships 8-byte longs instead of ~11-char strings and the Generate
      // does integer arithmetic instead of per-key string allocation.
      // The old post-hoc `levenshtein ≤ 1` filter was VACUOUS (the
      // join_fuzzy_block2 argument, one tier down): a collision on a
      // position-TAGGED key means both names delete the SAME position
      // and agree everywhere else ⇒ they differ in at most that one
      // digit ⇒ distance ≤ 1 by construction. The DuckDB oracle keeps
      // its explicit levenshtein filter, so the equivalence is
      // machine-checked per round.
      // The repartition is load-bearing (guide §2.5, input parallelism):
      // customer at the test SFs is ONE parquet split, and without it
      // the explode → join → partial-aggregate stage — the ~1.5M-row
      // part of the query — runs in a single task while every other
      // core idles. One exchange of the O(n) 8-byte ids buys a
      // cores-wide heavy stage; the count is derived, not a constant.
      val c = Tables.customerShared(s, d)
        .select(substring(col("c_name"), 10, 9).cast("long").as("id"))
        .transform(Tables.spread(_, col("id")))
      def pw(k: Int): Long = Seq.fill(k)(10L).product
      val keys = (1 to 9).map { i =>
        val (hi, lo) = (pw(10 - i), pw(9 - i))
        expr(s"${i}L * 100000000L + (id DIV ${hi}L) * ${lo}L + id % ${lo}L")
      }
      val keyed = c.select(col("id"), explode(array(keys: _*)).as("blk"))
      val l = keyed.select(col("id").as("id_a"), col("blk"))
      val r = keyed.select(col("id").as("id_b"), col("blk"))
      l.join(r, "blk")
        .filter(col("id_a") < col("id_b")) // fixed width ⇒ name order
        .select("id_a", "id_b").distinct() // a pair may share keys
        .groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_near"), min(col("id_b")).as("mn"))
        .select(
          concat(lit("Customer#"), lpad(col("id_a").cast("string"), 9, "0"))
            .as("name"),
          col("n_near"),
          concat(lit("Customer#"), lpad(col("mn").cast("string"), 9, "0"))
            .as("nearest"))
    }),

    // Distance-≤2 tier of the same entity resolution, via deletion
    // neighborhoods of depth 1 and 2. Tagging is asymmetric, and both
    // choices are load-bearing:
    //  - depth-1 keys are UNTAGGED: distance 2 between equal-length
    //    names can be one insert + one delete (a shift), where the two
    //    sides must delete DIFFERENT positions to meet at the same
    //    8-char string — a position tag would structurally hide that
    //    class. Untagged depth-1 also covers single substitutions.
    //  - depth-2 keys are TAGGED with the deleted position pair: the
    //    only class that needs them is two substitutions, where both
    //    names delete the SAME positions, so the tag costs no recall —
    //    and it bounds the block at 10² names (two free digit slots)
    //    where the untagged variant re-expands combinatorially. On
    //    sf0.1's dense zero-heavy ids that is the difference between a
    //    max block of 100 and of 849, and between 15M and 164M
    //    block-pair rows (measured) — the untagged form benched 269 s,
    //    the tagged one ~2 s, for the IDENTICAL verified pair set.
    // Together that covers every cost-≤2 edit script between
    // equal-length strings: recall is exactly 1.0, no declared miss
    // class (GraphSpec asserts equality with the brute-force pair
    // sweep, including a beyond-Hamming shift pair). The verified
    // output itself is ~4M pairs at sf0.1 — dense sequential ids
    // really are that self-similar; the per-name report collapses it
    // back to O(n).
    // Execution never runs levenshtein, because the key design makes
    // verification VACUOUS — candidates are not approximately the
    // radius-2 pairs, they are EXACTLY the radius-2 pairs:
    //  - a tagged depth-2 collision means both names deleted the SAME
    //    positions and everything else agrees position-aligned ⇒ they
    //    differ only at those two slots ⇒ Hamming ≤ 2 ⇒ distance ≤ 2;
    //  - a depth-1 collision means a = S+insert@p, b = S+insert@q for
    //    one 8-char S ⇒ delete@p, insert@q turns a into b ⇒ ≤ 2 edits
    //    (one substitution when p = q);
    //  - conversely every distance-≤2 pair collides (pigeonhole above).
    // The DuckDB oracle keeps its explicit levenshtein filter, so the
    // equivalence is machine-checked per round, and GraphSpec checks it
    // against brute force. With verification gone the whole query runs
    // on the NUMERIC suffix — a (long, long) pair shuffle instead of
    // string pairs, with names rematerialized after the aggregation.
    // (The first cut verified 18-char strings post-hoc: 269 s at sf0.1.
    // Tagging depth-2 keys made it 24 s; this form measures ~3 s.)
    "join_fuzzy_block2" -> ((s, d) => {
      // r17 (guide §2.3, narrower types): LONG block keys via integer
      // digit surgery — the join_fuzzy_block rationale one tier up.
      // Untagged depth-1 keys are the 8-digit deletion value itself
      // (∈ [0, 10^8)); depth-2 keys are the 7-digit two-deletion value
      // tagged (i·10+j)·10^7 (i<j ⇒ tag ≥ 12 ⇒ range [1.2·10^8, 9·10^8),
      // disjoint from depth-1 and distinct per position pair) —
      // bijective with the old "1:<8>"/"2:i,j:<7>" strings (fixed
      // width ⇔ numeric value), so the colliding pair set is identical
      // while the blow-up join hashes longs instead of strings.
      // Same load-bearing repartition as join_fuzzy_block: the one-split
      // customer scan would otherwise put the 15M-row join+aggregate
      // stage on a single core (guide §2.5).
      val c = Tables.customerShared(s, d)
        .select(substring(col("c_name"), 10, 9).cast("long").as("id"))
        .transform(Tables.spread(_, col("id")))
      def pw(k: Int): Long = Seq.fill(k)(10L).product
      val del1 = (1 to 9).map { i =>
        val (hi, lo) = (pw(10 - i), pw(9 - i))
        expr(s"(id DIV ${hi}L) * ${lo}L + id % ${lo}L")
      }
      val del2 = for { i <- 1 to 8; j <- (i + 1) to 9 } yield {
        // delete position j first (yielding an 8-digit value), then
        // position i (i < j keeps its index) — 7 digits + the pair tag
        val (hj, lj) = (pw(10 - j), pw(9 - j))
        val (hi, lo) = (pw(9 - i), pw(8 - i))
        val v1 = s"((id DIV ${hj}L) * ${lj}L + id % ${lj}L)"
        expr(s"${(i * 10 + j).toLong}L * 10000000L + " +
          s"($v1 DIV ${hi}L) * ${lo}L + $v1 % ${lo}L")
      }
      val keyed = c.select(col("id"),
        explode(array(del1 ++ del2: _*)).as("blk"))
      val l = keyed.select(col("id").as("id_a"), col("blk"))
      val r = keyed.select(col("id").as("id_b"), col("blk"))
      l.join(r, "blk")
        .filter(col("id_a") < col("id_b")) // fixed width ⇒ name order
        // pair-dedup on ONE long, not two (guide §2.3): ids < 10^9, so
        // id_a·10^9 + id_b is a bijective pair code < 2^60 — the 15M-row
        // partial aggregate hashes a single 8-byte key and the distinct
        // exchange ships half the bytes; id_a/id_b decode exactly after.
        .select((col("id_a") * lit(1000000000L) + col("id_b")).as("pk"))
        .distinct() // a pair shares many keys
        .groupBy(expr("pk DIV 1000000000L").as("id_a")) // integral DIV: exact at any id width
        .agg(count(lit(1)).as("n_near"),
          min(col("pk") % lit(1000000000L)).as("mn"))
        .select(
          concat(lit("Customer#"), lpad(col("id_a").cast("string"), 9, "0"))
            .as("name"),
          col("n_near"),
          concat(lit("Customer#"), lpad(col("mn").cast("string"), 9, "0"))
            .as("nearest"))
    }),

    // Time-series spine resample: one row per (user, day) over each
    // user's own active span — including zero-activity gap days, which
    // a plain groupBy can never produce. The spine generates from a
    // 2-column per-user aggregate (first/last day), so the explode is
    // O(users·span); the daily totals join back on the (user, day) key.
    // The downstream use is every "daily active / churn / streak"
    // metric that needs explicit gap rows.
    "events_resample_daily" -> ((s, d) => {
      val ev = Tables.eventsShared(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
          col("value"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(25,6)")).cast("double").as("total_value"))
      val spine = ev.groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("total_value"), lit(0.0)).as("total_value"))
    }),

    // Semi-structured props via the Spark 4 VARIANT type: parse once,
    // extract typed paths with variant_get — the open-schema path for
    // event payloads (vs. a rigid from_json schema). VARIANT's binary
    // encoding makes repeated path extraction O(path) instead of
    // re-parsing the JSON text per field; at 100 TB the parse is the
    // dominant cost and it happens exactly once per row here. The
    // oracle extracts the same path with DuckDB's JSON operators —
    // value parity on the typed k, not on any engine's encoding.
    "events_variant_props" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.eventsShared(s, d)
        .select(col("event_type"),
          variant_get(v, "$.k", "int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("k")).as("distinct_k"))
    }),

    // Non-equi RANGE JOIN: orders against a tiny price-band dimension.
    // Broadcast nested-loop — the only sane physical plan for a band
    // predicate; the fact side streams, nothing shuffles.
    "join_range" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("p00_100k", 0.0, 100000.0),
        ("p100_200k", 100000.0, 200000.0),
        ("p200_300k", 200000.0, 300000.0),
        ("p300_up", 300000.0, 1e9)).toDF("band", "lo", "hi")
      Tables.ordersShared(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
    }),

    // The SAME band join as an equi-join on overlap buckets (RangeJoin.
    // banded): the scale path when the band side is too big to
    // broadcast. The oracle is the plain range join — proving the
    // bucketize+residual reformulation is result-preserving (the same
    // contract join_salted proves for salting).
    "join_range_bucketed" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("p00_100k", 0.0, 100000.0),
        ("p100_200k", 100000.0, 200000.0),
        ("p200_300k", 200000.0, 300000.0),
        ("p300_up", 300000.0, 700000.0)).toDF("band", "lo", "hi")
      RangeJoin.banded(Tables.ordersShared(s, d), bands,
        "o_totalprice", "lo", "hi", width = 50000.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
    }),

    // FULL OUTER JOIN with null rows on both sides: high-balance
    // customers vs per-customer order counts.
    "join_full_outer" -> ((s, d) => {
      val cs = Tables.customerShared(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_name"))
      val os = Tables.ordersShared(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      cs.join(os, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("has_customer"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"))
    }),

    // Bloom-filter join pruning — the runtime-filter pattern (Spark's
    // own InjectRuntimeFilter / DPP shape, built explicitly so the
    // filter itself is verifiable): the selective build side (one
    // market segment's customers) condenses to a bit-set of
    // BLOOM_K hash positions per key over m = BLOOM_BITS_PER_KEY·|build|
    // slots, and the probe side tests membership map-side against the
    // broadcast bit-set BEFORE any shuffle toward the exact join — at
    // 100 TB the probe relation crosses the wire at (true matches +
    // measured false positives), not in full. No false negatives BY
    // CONSTRUCTION (a member's positions are all set), so the exact
    // verify join only ever RECEIVES bloom survivors; the query reports
    // the measured FP rate next to the filter's design point
    // (k=3, 16 bits/key ⇒ ~0.5% on uniform keys). m scales WITH the
    // build side — a fixed m saturates to fp→1 at 100× (measured:
    // m=8192 is 66% full at sf0.1 already) — and both engines derive it
    // from the same COUNT so the filters are identical bit-for-bit.
    // Contract: the build side is the SELECTIVE side (runtime-filter
    // regime); the bits relation is O(m) = O(16·|build|) rows and is
    // broadcast — for a build side too big for that, shard the filter
    // by key range (same math per shard) instead of giving up pruning.
    // fp_rate is one IEEE division of two exact longs; NULL when there
    // are no non-members to measure on.
    "join_bloom_prune" -> ((s, d) => {
      def pos(i: Int, key: org.apache.spark.sql.Column,
          m: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(s"bf$i|"), key.cast("string"))),
          1, 8), 16, 10).cast("long") % m
      val hashes = 1 to BLOOM_K
      val build = Tables.customerShared(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k")).distinct()
        .transform(graft.CachePool.persist) // bits + m + exact verify
      val mDf = build.agg((count(lit(1)) * BLOOM_BITS_PER_KEY).as("m"))
        .withColumn("__j", lit(1))
      val bits = build.withColumn("__j", lit(1)).join(broadcast(mDf), "__j")
        .select(explode(array(hashes.map(i =>
          pos(i, col("k"), col("m"))): _*)).as("pos"))
        .distinct()
      val probe = Tables.ordersShared(s, d)
        .select(col("o_custkey").as("k")).distinct()
        .transform(graft.CachePool.persist)
      val pass = probe.withColumn("__j", lit(1)).join(broadcast(mDf), "__j")
        .select(col("k"), explode(array(hashes.map(i =>
          pos(i, col("k"), col("m"))): _*)).as("pos"))
        .join(broadcast(bits), "pos")
        .groupBy("k").agg(count(lit(1)).as("nhit"))
        .filter(col("nhit") === BLOOM_K)
      val passTag = pass.join(build.withColumn("is_member", lit(1L)),
          Seq("k"), "left")
        .agg(count(lit(1)).as("n_pass"),
          coalesce(sum(coalesce(col("is_member"), lit(0L))), lit(0L))
            .as("n_true_members"))
        .withColumn("__j", lit(1))
      probe.agg(count(lit(1)).as("n_probe")).withColumn("__j", lit(1))
        .join(broadcast(passTag), "__j")
        .select(col("n_probe"), col("n_pass"), col("n_true_members"),
          (col("n_pass") - col("n_true_members")).as("n_false_pos"),
          when(col("n_probe") === col("n_true_members"), lit(null))
            .otherwise((col("n_pass") - col("n_true_members")).cast("double") /
              (col("n_probe") - col("n_true_members")).cast("double"))
            .as("fp_rate"))
    }),

    // Join-cardinality estimation from count-min-sketch INNER PRODUCTS —
    // the query-planner primitive: |A ⋈ B| on a key is Σ_k cA(k)·cB(k),
    // and the CMS estimate Σ_j A[d][j]·B[d][j] (min over depth rows)
    // brackets it from above, so two KB-size sketches size a join
    // BEFORE either 100 TB side is shuffled. Both sketches build as one
    // hash agg over per-key counts (O(distinct) rows, never the raw
    // relations), the inner product joins two O(D·W) bounded relations,
    // and the exact check is a key-co-partitioned join of the same
    // per-key counts. est ≥ exact ALWAYS (counters only over-merge);
    // est ≤ exact + e/W·|A|·|B| is the CM theorem, checked as
    // 3·|A|·|B|/W (3 > e) — deterministic here because the md5 hash
    // family is fixed. Σ cA·cB fits a LONG through ~10⁹ shared pairs
    // per key-square; past that, re-run the sums in decimal(38,0).
    "join_size_estimate" -> ((s, d) => {
      def keyCounts(tp: String) = Tables.eventsShared(s, d)
        .filter(col("event_type") === tp)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .transform(graft.CachePool.persist) // sketch build + exact check
      def sketch(kc: DataFrame) = kc
        .select(col("user_id"), col("n"),
          explode(array((0 until CMS_D).map(lit(_)): _*)).as("dd"))
        .select(col("dd"), col("n"),
          (conv(substring(md5(concat(lit("cms"), col("dd").cast("string"),
            lit("|"), col("user_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % CMS_W).as("j"))
        .groupBy("dd", "j").agg(sum("n").as("c"))
      val a = keyCounts("click")
      val b = keyCounts("purchase")
      val tots = a.agg(sum("n").cast("long").as("n_left")).crossJoin(
        b.agg(sum("n").cast("long").as("n_right")))
      val exact = a.select(col("user_id"), col("n").as("na"))
        .join(b.select(col("user_id"), col("n").as("nb")), "user_id")
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long")
          .as("exact_size"))
      val est = sketch(a).withColumnRenamed("c", "ca")
        .join(sketch(b).withColumnRenamed("c", "cb"), Seq("dd", "j"))
        .groupBy("dd").agg(sum(col("ca") * col("cb")).as("ip"))
        .agg(min("ip").cast("long").as("est_size"))
      tots.crossJoin(broadcast(exact)).crossJoin(broadcast(est))
        .select(col("n_left"), col("n_right"), col("exact_size"),
          col("est_size"),
          (col("est_size") >= col("exact_size")).as("overestimate_ok"),
          ((col("est_size") - col("exact_size")).cast("double") <=
            lit(3.0) * col("n_left") * col("n_right") / lit(CMS_W))
            .as("bound_ok"))
    }),

    // Exact portable statistics: corr and sample stddev from decimal
    // power sums; identical double arithmetic on both sides.
    //
    // The decimal→double cast itself must be portable: once the UNSCALED
    // value exceeds 2^53, Spark rounds the decimal once (BigDecimal →
    // double) while DuckDB converts the int128 and divides by 10^scale —
    // two roundings, off by 1 ulp. Both sides therefore take the SAME
    // route explicitly: unscaled integer → double (exact-or-single-
    // rounded in both engines) → divide by 10^scale (identical second
    // rounding). SF-independent, unlike capping the column magnitudes.
    "agg_corr_stats" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      def d2(c: org.apache.spark.sql.Column, scale: Int) = {
        val p = math.pow(10, scale)
        (c * lit(p.toLong)).cast("decimal(38,0)").cast("double") / lit(p)
      }
      Tables.lineitemShared(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          d2(sum(x), 2).as("sx"), d2(sum(y), 2).as("sy"),
          d2(sum(x * x), 4).as("sxx"), d2(sum(y * y), 4).as("syy"),
          d2(sum(x * y), 4).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("stddev_qty"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n"))))
            .as("corr_qty_price"))
    }),

    // Per-group z-score outlier screen — the data-quality gate that
    // catches corrupt loads (a fat-fingered price, a unit mixup) before
    // they poison downstream aggregates. Two passes: exact-decimal
    // moments per group (the agg_corr_stats construction — mean/std are
    // then bitwise-deterministic doubles), broadcast the tiny stats
    // relation back over the fact scan, flag |v − mean| > 3σ. The fact
    // table is read twice but never shuffled with its payload — the
    // stats side is O(groups).
    "profile_outliers" -> ((s, d) => {
      // Moments in integer CENTS at scale 0, not the d2 decimal-scale
      // trick: sum(v²)·10⁴ is ~2e19 at sf0.1 — past the 2^53 window
      // where Spark's one-step decimal→double and DuckDB's two-step
      // (int128→double, then ÷10^scale) conversions agree (the bound
      // Similarity.scala documents). A scale-0 integer sum is converted
      // by ONE correctly-rounded cast in both engines — identical at
      // any magnitude the decimal can hold.
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)").cast("long")
      val stats = Tables.ordersShared(s, d)
        .select(col("o_orderpriority"), cents.as("c"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).cast("double").as("sc"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).cast("double").as("scc"))
        .select(col("o_orderpriority"),
          (col("sc") / lit(100.0) / col("n")).as("mean_price"),
          (sqrt((col("scc") - col("sc") * col("sc") / col("n")) / (col("n") - 1))
            / lit(100.0)).as("std_price"))
      Tables.ordersShared(s, d).select("o_orderpriority", "o_totalprice")
        .join(broadcast(stats), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          max("mean_price").as("mean_price"),
          max("std_price").as("std_price"),
          sum(when(abs(col("o_totalprice") - col("mean_price")) >
            lit(3.0) * col("std_price"), 1L).otherwise(0L)).as("n_outliers"),
          max(abs(col("o_totalprice") - col("mean_price")) / col("std_price"))
            .as("max_abs_z"))
    }),

    // Ordered string aggregation over a small deterministic subset.
    "agg_string_concat" -> ((s, d) => {
      Tables.customerShared(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("c_name"))), "|").as("names"))
    }),

    // argmax / argmin with an explicit tie-break: DuckDB's arg_max can't
    // order by a struct, so both sides use one BIGINT key combining
    // (acctbal in cents, custkey) — monotone in the pair, tie-free.
    "agg_argmax" -> ((s, d) => {
      val key = round(col("c_acctbal") * 100).cast("long") *
        lit(100000000000L) + col("c_custkey")
      Tables.customerShared(s, d)
        .groupBy("c_mktsegment")
        .agg(
          max_by(col("c_name"), key).as("richest"),
          min_by(col("c_name"), key).as("poorest"),
          max(col("c_acctbal")).as("max_bal"))
    }),

    // Boolean aggregates + conditional count.
    "agg_bool" -> ((s, d) => {
      Tables.lineitemShared(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
          expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
          expr("count_if(l_tax = 0)").as("n_taxfree"))
    }),

    // Regexp scalar family.
    "scalar_regexp" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").rlike("^[aeiou]").as("starts_vowel"),
        regexp_replace(col("p_type"), "[A-Z]+", "#").as("type_masked"),
        instr(col("p_name"), "o").as("first_o"),
        expr("left(p_name, 3)").as("name3"),
        expr("right(p_type, 4)").as("type4"))
    }),

    // Approximate percentile with an oracle-checked accuracy bound (same
    // contract shape as agg_approx_distinct): the sketch value must land
    // between the exact 45th and 55th percentiles. With accuracy=1000
    // the rank error is ≤ 0.1%, so the bound has ~50× headroom — and the
    // GK sketch is deterministic, making this stable.
    "agg_approx_percentile" -> ((s, d) => {
      Tables.ordersShared(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"),
          (expr("approx_percentile(o_totalprice, 0.5, 1000)") >=
            expr("percentile(o_totalprice, 0.45)") &&
            expr("approx_percentile(o_totalprice, 0.5, 1000)") <=
              expr("percentile(o_totalprice, 0.55)")).as("approx_ok"))
    }),

    // Third date/time wave: formatting, epoch seconds, ISO week fields,
    // date construction.
    "scalar_date3" -> ((s, d) => {
      val od = col("o_orderdate")
      Tables.ordersShared(s, d).select(
        col("o_orderkey"),
        date_format(od, "yyyy-MM").as("ym"),
        unix_timestamp(od).as("epoch_s"),
        weekday(od).as("dow0"),
        weekofyear(od).as("iso_week"),
        make_date(year(od), month(od), lit(1)).as("month_start_d"))
    }),

    // Map-typed scalar ops, projected to scalars for the driver compare:
    // construct (map_from_arrays, str_to_map), read (element_at), and
    // transform (transform_values) — the dynamic-payload shape the CDC
    // envelope uses, exercised as standalone operators.
    "scalar_map" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("uid"), lit("typ")),
        array(col("user_id").cast("string"), col("event_type")))
      val m2 = transform_values(m, (_, v) => upper(v))
      val sm = expr("str_to_map(concat('id:', event_id, ',val:', value), ',', ':')")
      Tables.eventsShared(s, d).select(
        col("event_id"),
        element_at(m, "uid").cast("long").as("uid_back"),
        element_at(m2, "typ").as("typ_upper"),
        size(map_keys(m)).as("n_keys"),
        element_at(sm, "val").cast("double").as("val_back"))
    }),

    // Multiset semantics: EXCEPT ALL / INTERSECT ALL keep duplicate
    // cardinalities (bag difference/intersection), unlike the set forms.
    "set_except_all" -> ((s, d) => {
      val a = Tables.ordersShared(s, d).select(col("o_custkey").as("custkey"))
      val b = Tables.ordersShared(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.exceptAll(b).groupBy("custkey").agg(count(lit(1)).as("multiplicity"))
    }),
    "set_intersect_all" -> ((s, d) => {
      val a = Tables.ordersShared(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.ordersShared(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.intersectAll(b).groupBy("custkey").agg(count(lit(1)).as("multiplicity"))
    }),

    // Pagination: ORDER BY ... OFFSET/LIMIT with a total tie-broken
    // order (page boundaries are only stable when the sort is total).
    "topk_offset_page" -> ((s, d) => {
      Tables.ordersShared(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20).limit(10)
    }),

    // NULL ordering: NULLS LAST ascending, with nulls manufactured via
    // NULLIF — visible in the result only because of the LIMIT.
    "sort_nulls" -> ((s, d) => {
      Tables.lineitemShared(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("disc_n"))
        .orderBy(col("disc_n").asc_nulls_last, col("l_orderkey"),
          col("l_linenumber"))
        .limit(25)
    }),

    // Higher-order-function surface with scalar outputs: transform /
    // filter / exists / forall / aggregate over the token array.
    "scalar_hof" -> ((s, d) => {
      val tok = split(col("p_name"), " ")
      Tables.part(s, d).select(
        col("p_partkey"),
        size(filter(tok, t => length(t) > 4)).as("n_long_words"),
        exists(tok, t => t.rlike("^[0-9]")).as("any_digit_start"),
        forall(tok, t => t === lower(t)).as("all_lower"),
        aggregate(transform(tok, t => length(t)), lit(0), (acc, x) => acc + x)
          .as("total_chars"))
    }),

    // Explicit CROSS JOIN of two tiny dims (the only scale-sane use).
    "join_cross_dims" -> ((s, d) => {
      Tables.region(s, d).select(col("r_name")).crossJoin(
        Tables.nation(s, d).select(col("n_name")))
        .groupBy("r_name").agg(count(lit(1)).as("n_combos"))
    }),

    // Rank-family completeness: rank / dense_rank (tie-aware, unlike
    // row_number), nth_value, lead — over a deliberately tie-prone
    // ordering (price bucket), so tie semantics are what's verified.
    "window_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(floor(col("o_totalprice") / 10000).asc, col("o_orderkey"))
      Tables.ordersShared(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        nth_value(col("o_orderkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("second_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
    }),

    // CDC observability: LSN gap detection — a hole in the change-log
    // sequence is how replication loss shows up. NOT a global
    // Window.orderBy (that funnels the whole log through one task):
    // LSNs are bucketed, lag runs per bucket in parallel, and bucket
    // BOUNDARIES are stitched from per-bucket min/max aggregates — a
    // relation of |buckets| rows. The oracle is the naive global-lag
    // form, proving the parallel decomposition equivalent. The corpus
    // log is dense, so loss is SIMULATED deterministically (drop every
    // 97th LSN) to make the detector's output non-vacuous.
    "cdc_gap_detect" -> ((s, d) => {
      val BUCKET = 1000L
      val ids = Tables.eventsShared(s, d)
        .filter(col("event_id") % 97 =!= 0)
        .select(col("event_id"), (col("event_id") / BUCKET).cast("long").as("bk"))
      // interior gaps: lag within each bucket (parallel across buckets)
      val wIn = Window.partitionBy("bk").orderBy("event_id")
      val interior = ids
        .withColumn("prev_id", lag(col("event_id"), 1).over(wIn))
        .filter(col("event_id") - col("prev_id") > 1)
        .select(col("prev_id").as("gap_after"), col("event_id").as("gap_before"))
      // boundary gaps: per-bucket extrema (|buckets| rows) lag-joined
      val wBk = Window.orderBy("bk") // tiny: one row per non-empty bucket
      val boundary = ids.groupBy("bk")
        .agg(min(col("event_id")).as("bmin"), max(col("event_id")).as("bmax"))
        .withColumn("prev_max", lag(col("bmax"), 1).over(wBk))
        .filter(col("bmin") - col("prev_max") > 1)
        .select(col("prev_max").as("gap_after"), col("bmin").as("gap_before"))
      interior.unionByName(boundary)
        .withColumn("n_missing", col("gap_before") - col("gap_after") - 1)
    }),

    // Data-quality profiling in ONE pass + UNPIVOT to long form: the
    // per-column summary every ingestion pipeline materializes before
    // trusting a 100 TB drop (wide agg → melt, no per-column scans).
    "profile_orders" -> ((s, d) => {
      val wide = Tables.ordersShared(s, d).agg(
        count(lit(1)).cast("double").as("n_rows"),
        countDistinct(col("o_custkey")).cast("double").as("custkey_distinct"),
        countDistinct(col("o_orderstatus")).cast("double").as("status_distinct"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"),
        sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).cast("double")
          .as("priority_nulls"))
      wide.unpivot(Array.empty, wide.columns.map(col), "metric", "value")
    }),

    // Sliding event-time windows (batch analog of streaming
    // window(ts, 1h, 30m)): each event lands in BOTH covering windows.
    "cdc_window_sliding" -> ((s, d) => {
      Tables.eventsShared(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"))
    }),

    // Forward-fill of sparse updates: CDC deltas often carry only the
    // columns that changed; "last known non-null value per key" is the
    // reconstruction — last(x, ignoreNulls) over the LSN order. One
    // shuffle per key, same shape as latest-state.
    "window_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.eventsShared(s, d)
        .withColumn("sparse_v",
          when(col("event_id") % 3 === 0, col("value")))
        .withColumn("filled_v",
          last(col("sparse_v"), ignoreNulls = true).over(w))
        .select("event_id", "user_id", "sparse_v", "filled_v")
    }),

    // explode_outer: rows with EMPTY arrays survive as a single
    // null-element row (plain explode silently drops them — an easy way
    // to lose documents in a tokenization pipeline).
    "scalar_explode_outer" -> ((s, d) => {
      val longToks = filter(split(col("p_name"), " "), t => length(t) > 7)
      Tables.part(s, d)
        .select(col("p_partkey"), explode_outer(longToks).as("long_word"))
    }),

    // Bitwise scalar family over integer keys.
    "scalar_bitwise" -> ((s, d) => {
      Tables.lineitemShared(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(lit(255L))).as("and255"),
        (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("or_ln"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xor_pk"),
        shiftleft(col("l_orderkey").bitwiseAND(lit(15L)), 2).as("shl"),
        shiftright(col("l_orderkey"), 3).as("shr"),
        expr("CAST(bit_count(l_orderkey) AS INT)").as("popcount"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Identical hash family ('0x'-prefixed md5 slice ≡ Spark's
    // conv(...,16,10)) and the same data-derived m, so the oracle's
    // filter is the SAME filter — false positives and all.
    "join_bloom_prune" -> {
      def posSql(i: Int, key: String) =
        s"('0x' || substr(md5('bf$i|' || CAST($key AS VARCHAR)), 1, 8))::BIGINT % (SELECT m FROM m)"
      val buildArms = (1 to BLOOM_K)
        .map(i => s"SELECT ${posSql(i, "k")} AS pos FROM build")
        .mkString("\n  UNION ALL ")
      val probeArms = (1 to BLOOM_K)
        .map(i => s"SELECT k, ${posSql(i, "k")} AS pos FROM probe")
        .mkString("\n  UNION ALL ")
      s"""WITH build AS (SELECT DISTINCT c_custkey AS k FROM customer
         |  WHERE c_mktsegment = 'BUILDING'),
         |m AS (SELECT $BLOOM_BITS_PER_KEY * COUNT(*) AS m FROM build),
         |bits AS (SELECT DISTINCT pos FROM ($buildArms)),
         |probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
         |pp AS ($probeArms),
         |pass AS (SELECT k FROM pp JOIN bits USING (pos)
         |  GROUP BY k HAVING COUNT(*) = $BLOOM_K),
         |agg AS (SELECT
         |    (SELECT COUNT(*) FROM probe) AS n_probe,
         |    (SELECT COUNT(*) FROM pass) AS n_pass,
         |    (SELECT COUNT(*) FROM pass WHERE k IN (SELECT k FROM build))
         |      AS n_true_members)
         |SELECT n_probe, n_pass, n_true_members,
         |  n_pass - n_true_members AS n_false_pos,
         |  CASE WHEN n_probe = n_true_members THEN NULL
         |    ELSE CAST(n_pass - n_true_members AS DOUBLE) /
         |      CAST(n_probe - n_true_members AS DOUBLE) END AS fp_rate
         |FROM agg""".stripMargin
    },
    // Same fixed md5 hash family as the Spark side, so the sketches —
    // and therefore the estimate and both verdicts — are identical.
    "join_size_estimate" ->
      s"""WITH a AS (SELECT user_id, COUNT(*) AS n FROM events
         |    WHERE event_type = 'click' GROUP BY user_id),
         |b AS (SELECT user_id, COUNT(*) AS n FROM events
         |    WHERE event_type = 'purchase' GROUP BY user_id),
         |dd AS (SELECT unnest(generate_series(0, ${CMS_D - 1})) AS dd),
         |sa AS (SELECT dd,
         |    ('0x' || substr(md5('cms' || CAST(dd AS VARCHAR) || '|' ||
         |      CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % $CMS_W AS j,
         |    CAST(SUM(n) AS BIGINT) AS c
         |  FROM a CROSS JOIN dd GROUP BY 1, 2),
         |sb AS (SELECT dd,
         |    ('0x' || substr(md5('cms' || CAST(dd AS VARCHAR) || '|' ||
         |      CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % $CMS_W AS j,
         |    CAST(SUM(n) AS BIGINT) AS c
         |  FROM b CROSS JOIN dd GROUP BY 1, 2),
         |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_size FROM (
         |    SELECT sa.dd, SUM(sa.c * sb.c) AS ip
         |    FROM sa JOIN sb ON sa.dd = sb.dd AND sa.j = sb.j
         |    GROUP BY sa.dd)),
         |ex AS (SELECT CAST(COALESCE(SUM(a.n * b.n), 0) AS BIGINT)
         |    AS exact_size FROM a JOIN b USING (user_id)),
         |tot AS (SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM a) AS n_left,
         |    (SELECT CAST(SUM(n) AS BIGINT) FROM b) AS n_right)
         |SELECT n_left, n_right, exact_size, est_size,
         |  est_size >= exact_size AS overestimate_ok,
         |  CAST(est_size - exact_size AS DOUBLE) <=
         |    3.0 * n_left * n_right / $CMS_W AS bound_ok
         |FROM tot, ex, est""".stripMargin,
    "join_fuzzy_block" -> {
      val arms = (1 to 9).map { i =>
        s"SELECT c_name, '$i:' || substr(sfx, 1, ${i - 1}) || substr(sfx, ${i + 1}) AS blk FROM c"
      }.mkString("\n  UNION ALL ")
      s"""WITH c AS (SELECT c_name, substr(c_name, 10, 9) AS sfx FROM customer),
         |k AS ($arms),
         |cand AS (SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
         |  FROM k a JOIN k b ON a.blk = b.blk AND a.c_name < b.c_name),
         |v AS (SELECT * FROM cand WHERE levenshtein(name_a, name_b) <= 1)
         |SELECT name_a AS name, COUNT(*) AS n_near,
         |  'Customer#' || lpad(CAST(MIN(CAST(substr(name_b, 10, 9) AS BIGINT)) AS VARCHAR),
         |    9, '0') AS nearest
         |FROM v GROUP BY name_a""".stripMargin
    },
    "join_fuzzy_block2" -> {
      val arms1 = (1 to 9).map { i =>
        s"SELECT c_name, '1:' || substr(sfx, 1, ${i - 1}) || substr(sfx, ${i + 1}) AS blk FROM c"
      }
      val arms2 = for { i <- 1 to 8; j <- (i + 1) to 9 } yield
        s"SELECT c_name, '2:$i,$j:' || substr(sfx, 1, ${i - 1}) || substr(sfx, ${i + 1}, ${j - i - 1}) || substr(sfx, ${j + 1}) AS blk FROM c"
      val arms = (arms1 ++ arms2).mkString("\n  UNION ALL ")
      s"""WITH c AS (SELECT c_name, substr(c_name, 10, 9) AS sfx FROM customer),
         |k AS ($arms),
         |cand AS (SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
         |  FROM k a JOIN k b ON a.blk = b.blk AND a.c_name < b.c_name),
         |v AS (SELECT * FROM cand WHERE levenshtein(name_a, name_b) <= 2)
         |SELECT name_a AS name, COUNT(*) AS n_near,
         |  'Customer#' || lpad(CAST(MIN(CAST(substr(name_b, 10, 9) AS BIGINT)) AS VARCHAR),
         |    9, '0') AS nearest
         |FROM v GROUP BY name_a""".stripMargin
    },
    "events_resample_daily" ->
      """WITH ev AS (SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day, value
        |  FROM events),
        |daily AS (SELECT user_id, day, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM ev GROUP BY 1),
        |spine AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |      INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span)
        |SELECT s.user_id, s.day,
        |  COALESCE(n_events, 0) AS n_events,
        |  COALESCE(total_value, 0.0) AS total_value
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,
    "events_variant_props" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS INT)) AS INT) AS max_k,
        |  COUNT(DISTINCT CAST(props->>'$.k' AS INT)) AS distinct_k
        |FROM events GROUP BY event_type""".stripMargin,
    "join_range" ->
      """SELECT band, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('p00_100k', 0.0, 100000.0),
        |             ('p100_200k', 100000.0, 200000.0),
        |             ('p200_300k', 200000.0, 300000.0),
        |             ('p300_up', 300000.0, 1e9)) b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,
    "join_range_bucketed" ->
      """SELECT band, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('p00_100k', 0.0, 100000.0),
        |             ('p100_200k', 100000.0, 200000.0),
        |             ('p200_300k', 200000.0, 300000.0),
        |             ('p300_up', 300000.0, 700000.0)) b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  c_custkey IS NOT NULL AS has_customer,
        |  COALESCE(cnt, 0) AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS cnt
        |                 FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey""".stripMargin,
    "agg_corr_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(x) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS sx,
        |    CAST(CAST(SUM(y) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100 AS sy,
        |    CAST(CAST(SUM(x * x) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS sxx,
        |    CAST(CAST(SUM(y * y) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS syy,
        |    CAST(CAST(SUM(x * y) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000 AS sxy
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |        FROM lineitem) t
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  (sxy - sx * sy / n) /
        |    sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
        |FROM s""".stripMargin,
    "profile_outliers" ->
      """WITH st AS (
        |  -- int128→double via the exact decimal STRING: DuckDB's direct
        |  -- hugeint cast is a two-part conversion that lands 1 ulp off
        |  -- the correctly-rounded value for sums past 2^63 (measured on
        |  -- this data's 5-LOW group); string parsing is correctly
        |  -- rounded and matches Spark's BigDecimal→double exactly.
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) AS sc,
        |    CAST(CAST(SUM(c * c) AS VARCHAR) AS DOUBLE) AS scc
        |  FROM (SELECT o_orderpriority,
        |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |        FROM orders) t
        |  GROUP BY o_orderpriority),
        |m AS (SELECT o_orderpriority, sc / 100.0 / n AS mean_price,
        |    sqrt((scc - sc * sc / n) / (n - 1)) / 100.0 AS std_price
        |  FROM st)
        |SELECT o.o_orderpriority, COUNT(*) AS n,
        |  MAX(mean_price) AS mean_price, MAX(std_price) AS std_price,
        |  CAST(SUM(CASE WHEN ABS(o_totalprice - mean_price) > 3.0 * std_price
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MAX(ABS(o_totalprice - mean_price) / std_price) AS max_abs_z
        |FROM orders o JOIN m USING (o_orderpriority)
        |GROUP BY o.o_orderpriority""".stripMargin,
    "agg_string_concat" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer WHERE c_custkey % 97 = 0
        |GROUP BY c_mktsegment""".stripMargin,
    "agg_argmax" ->
      """SELECT c_mktsegment,
        |  arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000000 + c_custkey) AS richest,
        |  arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000000 + c_custkey) AS poorest,
        |  MAX(c_acctbal) AS max_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_positive_qty,
        |  bool_or(l_discount > 0.09) AS any_deep_discount,
        |  CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "scalar_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_matches(p_name, '^[aeiou]') AS starts_vowel,
        |  regexp_replace(p_type, '[A-Z]+', '#', 'g') AS type_masked,
        |  CAST(strpos(p_name, 'o') AS INT) AS first_o,
        |  left(p_name, 3) AS name3,
        |  right(p_type, 4) AS type4
        |FROM part""".stripMargin,
    "agg_approx_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  TRUE AS approx_ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "scalar_date3" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS dow0,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_start_d
        |FROM orders""".stripMargin,
    "scalar_map" ->
      """SELECT event_id,
        |  user_id AS uid_back,
        |  upper(event_type) AS typ_upper,
        |  CAST(2 AS INT) AS n_keys,
        |  value AS val_back
        |FROM events""".stripMargin,
    "window_rank_dense" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
        |    ORDER BY CAST(FLOOR(o_totalprice / 10000) AS BIGINT), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY CAST(FLOOR(o_totalprice / 10000) AS BIGINT), o_orderkey)""".stripMargin,
    "cdc_gap_detect" ->
      """SELECT prev_id AS gap_after, event_id AS gap_before,
        |  event_id - prev_id - 1 AS n_missing
        |FROM (SELECT event_id, lag(event_id, 1) OVER (ORDER BY event_id) AS prev_id
        |      FROM events WHERE event_id % 97 <> 0) t
        |WHERE event_id - prev_id > 1""".stripMargin,
    "set_except_all" ->
      """SELECT custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY custkey""".stripMargin,
    "topk_offset_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,
    "sort_nulls" ->
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n
        |FROM lineitem
        |ORDER BY disc_n ASC NULLS LAST, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin,
    "scalar_hof" ->
      """SELECT p_partkey,
        |  CAST(len(list_filter(string_split(p_name, ' '), t -> length(t) > 4)) AS INT) AS n_long_words,
        |  list_aggregate(list_transform(string_split(p_name, ' '), t -> regexp_matches(t, '^[0-9]')), 'bool_or') AS any_digit_start,
        |  list_aggregate(list_transform(string_split(p_name, ' '), t -> t = lower(t)), 'bool_and') AS all_lower,
        |  CAST(list_reduce(list_prepend(0, list_transform(string_split(p_name, ' '), t -> CAST(length(t) AS INT))), (a, x) -> a + x) AS INT) AS total_chars
        |FROM part""".stripMargin,
    "join_cross_dims" ->
      """SELECT r_name, COUNT(*) AS n_combos
        |FROM region CROSS JOIN nation
        |GROUP BY r_name""".stripMargin,
    "profile_orders" ->
      """SELECT 'n_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM orders
        |UNION ALL SELECT 'custkey_distinct', CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) FROM orders
        |UNION ALL SELECT 'status_distinct', CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) FROM orders
        |UNION ALL SELECT 'price_min', MIN(o_totalprice) FROM orders
        |UNION ALL SELECT 'price_max', MAX(o_totalprice) FROM orders
        |UNION ALL SELECT 'priority_nulls', CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM orders""".stripMargin,
    "cdc_window_sliding" ->
      """WITH w AS (
        |  SELECT event_type,
        |    unnest([CAST(FLOOR(epoch(ts)) AS BIGINT) // 1800 * 1800,
        |            CAST(FLOOR(epoch(ts)) AS BIGINT) // 1800 * 1800 - 1800]) AS s0
        |  FROM events)
        |SELECT TIMESTAMP '1970-01-01 00:00:00' + s0 * INTERVAL 1 SECOND AS window_start,
        |  event_type, COUNT(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,
    "window_fill_forward" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 3 = 0 THEN value END AS sparse_v,
        |  last_value(CASE WHEN event_id % 3 = 0 THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
        |FROM events""".stripMargin,
    "scalar_explode_outer" ->
      """SELECT p_partkey, unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS long_word
        |FROM (SELECT p_partkey,
        |        list_filter(string_split(p_name, ' '), t -> length(t) > 7) AS l
        |      FROM part) t""".stripMargin,
    "scalar_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS and255,
        |  l_orderkey | l_linenumber AS or_ln,
        |  xor(l_orderkey, l_partkey) AS xor_pk,
        |  (l_orderkey & 15) << 2 AS shl,
        |  l_orderkey >> 3 AS shr,
        |  CAST(bit_count(l_orderkey) AS INT) AS popcount
        |FROM lineitem""".stripMargin
  )
}
