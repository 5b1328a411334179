package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Mining}
import graft.sources.Tables

/** Semantic assertions for the sequence/affinity-mining operators and
  * the prefix-filter set-similarity join — each checked against an
  * independent formulation of the same relation (brute force, the
  * algebraic identity, or an invariant of the definition), not against
  * the implementation's own plan.
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("dedup_jaccard_prefix equals the brute-force all-pairs join (recall 1.0 by construction)") {
    // Brute force: every doc pair, exact jaccard on the same distinct
    // 3-gram shingles the operator uses. 500 docs at sf0.001 → 125k
    // pairs, fine for a test, impossible at corpus scale — which is
    // exactly the gap prefix filtering closes WITHOUT losing pairs.
    val sh = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(0), size(split(col("text"), " ")) - lit(3)),
          i => concat_ws(" ", split(col("text"), " ")(i),
            split(col("text"), " ")(i + 1), split(col("text"), " ")(i + 2))))
          .as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = Dedup.queries("dedup_jaccard_prefix")(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === brute)
    assert(prefix.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }

  test("transition matrix: per-from probabilities sum to 1 and transitions = events - users") {
    val m = Mining.queries("events_transition_matrix")(spark, sfDir)
      .transform(graft.CachePool.persist)
    val sums = m.groupBy("from_event").agg(sum("prob").as("p")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"${r.getString(0)} prob mass ${r.getDouble(1)}"))
    // Every user's n-event sequence yields n−1 transitions.
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val total = m.agg(sum("n_transitions")).head().getLong(0)
    assert(total === expected)
  }

  test("basket pairs: array expansion equals the item self-join identity") {
    val viaArrays = Mining.queries("basket_part_pairs")(spark, sfDir)
      .collect().map(_.toSeq).toList
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val viaJoin = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(25)
      .collect().map(_.toSeq).toList
    assert(viaArrays === viaJoin) // ordered compare: the top-k tie order is part of the contract
    assert(viaArrays.size === 25)
  }

  test("asof tolerance: matches are in-window clicks; stale matches are NULL, not the unbounded match") {
    val tol = Mining.queries("asof_tolerance")(spark, sfDir)
      .transform(graft.CachePool.persist)
    // Window containment: every non-null match lies in [pid − 200, pid).
    val bad = tol.filter(col("last_click").isNotNull &&
      !(col("last_click") >= col("purchase_id") - 200 &&
        col("last_click") < col("purchase_id"))).count()
    assert(bad === 0L)
    // Cross-check against the unbounded as-of: equal when the unbounded
    // match is within tolerance, NULL when it is older.
    val unbounded = graft.operators.RelationalExt
      .queries("asof_click_purchase")(spark, sfDir)
      .withColumnRenamed("last_click", "last_click_any")
    val joined = tol.join(unbounded, Seq("purchase_id", "user_id"))
      .transform(graft.CachePool.persist)
    val mismatchNear = joined.filter(
      col("last_click_any") >= col("purchase_id") - 200 &&
        !(col("last_click") === col("last_click_any"))).count()
    val mismatchStale = joined.filter(
      col("last_click_any") < col("purchase_id") - 200 &&
        col("last_click").isNotNull).count()
    assert(mismatchNear === 0L)
    assert(mismatchStale === 0L)
    // The tolerance must actually bite somewhere at this SF, or the
    // query is indistinguishable from the unbounded one.
    val stale = joined.filter(col("last_click").isNull &&
      col("last_click_any").isNotNull).count()
    assert(stale > 0L, "expected at least one stale click beyond tolerance")
  }

  test("bpe pairs: exactly 30 rows in (n desc, pair) order with positive counts") {
    val rows = graft.operators.TextAnalysis.queries("text_bpe_pairs")(spark, sfDir)
      .collect()
    assert(rows.length === 30)
    val ns = rows.map(_.getLong(2))
    assert(ns.forall(_ > 0))
    assert(ns.sameElements(ns.sortBy(-_)), "rows must be sorted by n desc")
  }

  test("decay score equals the brute-force per-user sum, bit-exactly") {
    val got = Mining.queries("events_decay_score")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // Independent recomputation of the integer-unit definition: each
    // event is worth 2^(40 − min(age/1000, 40)) units of 2^-40.
    val events = Tables.events(spark, sfDir).select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val m = es.map(_._2).max
      val units = es.map { case (_, id) =>
        1L << (40 - math.min((m - id) / 1000L, 40L)).toInt
      }.sum
      u -> ((es.length.toLong, units, units.toDouble / math.pow(2.0, 40)))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (u, e) =>
      assert(got(u) === e, s"user $u") // doubles compare exactly: same
      // long → double conversion + same division on both paths
    }
  }

  test("skipgram pairs equal the brute-force window-2 co-occurrence top-40") {
    val got = graft.operators.TextAnalysis.queries("text_skipgram_pairs")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    val texts = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0))
    val counts = collection.mutable.Map.empty[(Int, String, String), Long]
    for (t <- texts; w = t.split(" ", -1); o <- 1 to 2; i <- 0 until w.length - o)
      counts((o, w(i), w(i + o))) = counts.getOrElse((o, w(i), w(i + o)), 0L) + 1
    val expected = counts.toList
      .map { case ((o, a, b), n) => (o, a, b, n) }
      .sortBy { case (o, a, b, n) => (-n, o, a, b) }
      .take(40)
    assert(got === expected)
  }

  test("dim stats: one row per dimension with grid-exact means and consistent bounds") {
    val rows = graft.operators.Similarity.queries("ann_dim_stats")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    assert(rows.keySet === (0L until vecs.head.length).toSet)
    val Q = 1073741824.0
    for ((dim, (n, mean, mn, mx, v)) <- rows) {
      val vals = vecs.map(_(dim.toInt))
      assert(n === vals.length.toLong)
      // bit-exact against the same integer-grid mean formula
      val gridMean = vals.map(x => math.floor(x * Q + 0.5).toLong).sum
        .toDouble / Q / vals.length.toDouble
      assert(mean === gridMean, s"dim $dim mean")
      assert(mn === vals.min && mx === vals.max, s"dim $dim bounds")
      assert(v >= -1e-12 && mean >= mn && mean <= mx, s"dim $dim variance/range")
    }
  }

  test("covariance row bound: loud fail-fast at the LONG-grid overflow edge") {
    import graft.operators.Similarity
    // bound is inclusive at 2^23 − 1 (n·2^40 = 2^63 − 2^40 still fits)
    Similarity.covarianceRowBound(Similarity.COV_MAX_ROWS)
    Similarity.covarianceRowBound(1L)
    val e = intercept[IllegalArgumentException] {
      Similarity.covarianceRowBound(Similarity.COV_MAX_ROWS + 1)
    }
    assert(e.getMessage.contains("integer-grid bound"),
      "overflow must name the bound, not wrap silently")
    // and the gated query still constructs + runs under the bound
    assert(graft.operators.Similarity.queries("ann_covariance")(spark, sfDir)
      .count() > 0)
    // sharded bound sits COV_SHARDS× higher and trips the same way
    Similarity.covarianceShardBound(
      Similarity.COV_MAX_ROWS * Similarity.COV_SHARDS)
    intercept[IllegalArgumentException] {
      Similarity.covarianceShardBound(
        Similarity.COV_MAX_ROWS * Similarity.COV_SHARDS + 1)
    }
  }

  test("sharded covariance merge is BIT-identical to the flat grid form") {
    // shard-and-merge re-associates the same integer sums; both cast
    // paths (LONG→double, scale-0 decimal→double) are single correctly-
    // rounded casts — so every cov cell must match to the last bit
    def canon(n: String) = graft.operators.Similarity.queries(n)(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val flat = canon("ann_covariance")
    val sharded = canon("ann_covariance_sharded")
    assert(flat.keySet === sharded.keySet)
    assert(flat.nonEmpty)
    flat.foreach { case (k, v) =>
      assert(sharded(k) === v, s"cell $k diverged")
    }
  }

  test("containment: sound (true containment >= threshold) and complete vs the indexed candidate set") {
    val got = graft.operators.Dedup.queries("dedup_containment")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // Brute-force shingle sets (the operator's own definition, recomputed
    // independently in Scala).
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
      .map { case (id, w) =>
        id -> w.sliding(3).map(_.mkString(" ")).toArray.distinct.toSet
      }.toMap
    // Soundness: every emitted direction meets the true threshold.
    for ((a, b, c) <- got) {
      val trueC = (docs(a) & docs(b)).size.toDouble / docs(a).size
      assert(c === trueC && c >= 0.8, s"pair ($a,$b)")
    }
    // Completeness relative to the documented DF-cap heuristic: every
    // pair sharing >= MIN_SHARED sub-cap shingles whose containment
    // meets the threshold must be emitted.
    val df = docs.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val rare: Set[String] = df.collect { case (g, n) if n <= 50 => g }.toSet
    val gotSet = got.map(p => (p._1, p._2)).toSet
    val ids = docs.keys.toArray.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val shared = docs(a) & docs(b)
      if ((shared & rare).size >= 3) {
        if (shared.size.toDouble / docs(a).size >= 0.8)
          assert(gotSet.contains((a, b)), s"missing contained pair ($a in $b)")
        if (shared.size.toDouble / docs(b).size >= 0.8)
          assert(gotSet.contains((b, a)), s"missing contained pair ($b in $a)")
      }
    }
  }

  test("containment catches a verbatim-quoted chunk that jaccard misses") {
    // The synthetic corpus's near-dups are symmetric mutations, so the
    // asymmetric case containment exists for — a short doc quoted whole
    // inside a much longer one — is proven on a constructed corpus: doc
    // 2 is tokens 10..19 of doc 1 verbatim.
    import spark.implicits._
    val long = (0 until 40).map(i => s"tok$i")
    val docs = Seq(
      (1L, long),
      (2L, long.slice(10, 20)),
      (3L, (100 until 140).map(i => s"tok$i")))
    val sh = docs.map { case (id, w) =>
      (id, w.sliding(3).map(_.mkString(" ")).toSeq.distinct)
    }.toDF("doc_id", "sh")
    val got = graft.operators.Dedup.containmentPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, 1L, 1.0)), // 2 fully inside 1, never the reverse
      s"got ${got.toSeq}")
    val j = 8.0 / (38 + 8 - 8) // shared shingles / union
    assert(j < 0.5, "the caught pair must be invisible to the jaccard family")
  }

  test("pmi ratio equals the brute-force collocation statistic, bit-exactly") {
    val got = graft.operators.TextAnalysis.queries("text_pmi_ratio")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(got.size === 30)
    val texts = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0))
    val uni = collection.mutable.Map.empty[String, Long]
    val pair = collection.mutable.Map.empty[(String, String), Long]
    for (t <- texts; w = t.split(" ", -1)) {
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      for (i <- 0 until w.length - 1)
        pair((w(i), w(i + 1))) = pair.getOrElse((w(i), w(i + 1)), 0L) + 1
    }
    val n = uni.values.sum
    val expected = pair.toList.collect { case ((a, b), np) if np >= 5 =>
      (a, b, np, np.toDouble * n.toDouble / (uni(a).toDouble * uni(b).toDouble))
    }.sortBy { case (a, b, _, r) => (-r, a, b) }.take(30)
    assert(got === expected)
  }

  test("burst days: every flagged day is > 2 std over the user's own mean; spikes are caught") {
    val burst = Mining.queries("events_burst_days")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(burst.nonEmpty, "expected at least one burst day at sf0.001")
    // Independent daily rollup.
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val byUser = daily.groupBy(_._1)
    for ((u, day, c, mean, z) <- burst) {
      val cs = byUser(u).map(_._3.toDouble)
      val m = cs.sum / cs.length
      val sd = math.sqrt(cs.map(x => (x - m) * (x - m)).sum / cs.length)
      assert(math.abs(mean - m) < 1e-9, s"user $u mean")
      assert(c.toDouble > m + 2.0 * sd - 1e-9, s"user $u day $day not a burst")
      assert(z > 2.0)
    }
    // And no flagged-worthy day is missed (same definition, brute force).
    val flagged = burst.map(b => (b._1, b._2)).toSet
    for ((u, rows) <- byUser) {
      val cs = rows.map(_._3.toDouble)
      val m = cs.sum / cs.length
      val v = cs.map(x => (x - m) * (x - m)).sum / cs.length
      if (v > 0) {
        val sd = math.sqrt(v)
        rows.foreach { case (_, day, c) =>
          if ((c.toDouble - m) / sd > 2.0 + 1e-9)
            assert(flagged.contains((u, day)), s"missed burst: user $u day $day")
        }
      }
    }
  }

  test("events_top_paths equals the brute-force prefix formulation") {
    // Independent formulation: collect EVERY user's full ordered event
    // sequence (no window, no TopKPerKey), slice the first 5 in Scala,
    // count paths, take the same deterministically-ordered top 20.
    val brute = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (_, rows) =>
        rows.sortBy(_.getLong(1)).take(5).map(_.getString(2)).mkString(">")
      }
      .groupBy(identity).map { case (p, ps) => (p, ps.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Mining.queries("events_top_paths")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === brute)
    assert(got.nonEmpty)
    // prefix rule: no reported path exceeds 5 steps
    assert(got.forall(_._1.split('>').length <= 5))
  }
}
