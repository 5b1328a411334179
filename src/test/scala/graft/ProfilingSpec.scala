package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling
import graft.sources.Tables

/** Semantic assertions for the profiling/anomaly/composition operators —
  * each checked against an invariant of the definition or an independent
  * brute-force formulation, not against the implementation's own plan.
  */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("zipf spectrum: bands partition the vocabulary and counts land inside their octave") {
    val rows = operators.TextAnalysis.queries("text_zipf_spectrum")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute-force term counts
    val occ = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sfDir).select("text").collect()
      .foreach(_.getString(0).split(" ", -1).foreach(t =>
        occ.updateWith(t)(c => Some(c.getOrElse(0L) + 1))))
    val wantBands = occ.values.groupBy(n => 64 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, ns) => (b.toInt, ns.size.toLong, ns.sum) }
    assert(rows.map(r => (r._1, r._2, r._3)).toSet === wantBands.toSet)
    assert(rows.map(_._2).sum === occ.size.toLong, "bands partition the vocab")
    val tot = occ.values.sum
    assert(rows.map(_._3).sum === tot)
    rows.foreach { case (_, _, _, s) => assert(s > 0.0 && s <= 1.0) }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, "occ shares sum to 1")
  }

  test("unigram surprise equals the brute-force octave cross-entropy per source") {
    val got = operators.TextAnalysis.queries("text_unigram_surprise")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val occ = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._2.foreach(t => occ.updateWith(t)(c => Some(c.getOrElse(0L) + 1))))
    def bitlen(n: Long) = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val corpusBits = bitlen(occ.values.sum)
    for ((src, ds) <- docs.groupBy(_._1)) {
      val toks = ds.flatMap(_._2)
      val sumBits = toks.map(t => (corpusBits - bitlen(occ(t))).toLong).sum
      val (nT, sB, bpt) = got(src)
      assert(nT === toks.length.toLong, s"$src n_tokens")
      assert(sB === sumBits, s"$src sum_bits")
      assert(math.abs(bpt - sumBits.toDouble / toks.length) < 1e-15)
    }
  }

  test("dup-ngram coverage equals a brute-force per-token covered-set recompute") {
    val got = operators.TextAnalysis.queries("text_dup_ngram_coverage")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // brute force: mark every token index under a corpus-duplicated 8-gram
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, _, t) <- docs; i <- 0 to t.length - 8)
      occ.updateWith(t.slice(i, i + 8).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val bySource = docs.groupBy(_._2)
    for ((src, ds) <- bySource) {
      var tokens = 0L; var covered = 0L; var dupDocs = 0L
      for ((_, _, t) <- ds) {
        tokens += t.length
        val mask = Array.fill(t.length)(false)
        for (i <- 0 to t.length - 8; if occ(t.slice(i, i + 8).mkString(" ")) > 1;
             j <- i until i + 8) mask(j) = true
        val c = mask.count(identity)
        covered += c; if (c > 0) dupDocs += 1
      }
      val (nD, nT, cov, dd, rate) = got(src)
      assert(nD === ds.length.toLong, s"$src n_docs")
      assert(nT === tokens, s"$src n_tokens")
      assert(cov === covered, s"$src covered_tokens")
      assert(dd === dupDocs, s"$src n_dup_docs")
      assert(math.abs(rate - covered.toDouble / tokens) < 1e-15, s"$src coverage")
    }
    // non-vacuous: the corpus has real duplicated-substring exposure
    assert(got.values.exists(_._3 > 0))
  }

  test("histogram buckets partition the table: counts sum to |orders|, ranges nest in bucket bounds") {
    val h = Profiling.queries("profile_histogram")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val total = h.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total === Tables.orders(spark, sfDir).count())
    val bad = h.filter(col("min_price") < col("bucket_lo") ||
      col("max_price") >= col("bucket_lo") + 50000.0).count()
    assert(bad === 0, "every order's price must fall inside its bucket")
    h.unpersist()
  }

  test("2-D histogram partitions lineitem: counts and revenue reconcile with direct totals") {
    val h = Profiling.queries("profile_histogram2d")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val li = Tables.lineitem(spark, sfDir)
    assert(h.agg(sum("n_items")).collect()(0).getLong(0) === li.count())
    val wantRev = li
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val gotRev = h.agg(sum("revenue")).collect()(0).getDouble(0)
    assert(math.abs(gotRev - wantRev) <= 1e-6 * wantRev)
    // grid keys live in their domains: quantity 1..50, discount 0..10%
    assert(h.filter(col("q_band") < 0 || col("q_band") > 5).count() === 0)
    assert(h.filter(col("disc_pct") < 0 || col("disc_pct") > 100).count() === 0)
    h.unpersist()
  }

  test("bitmap WAU is bit-for-bit the distinct-expansion WAU on every report day") {
    val bm = Profiling.queries("events_weekly_active_bitmap")(spark, sfDir)
      .select(col("report_day"), col("wau"))
    val ex = Profiling.queries("events_weekly_active")(spark, sfDir)
      .select(col("report_day"), col("wau").as("want"))
    val j = bm.join(ex, Seq("report_day"), "full_outer").persist()
    assert(j.filter(col("wau").isNull || col("want").isNull).count() === 0,
      "both formulations must cover identical report days")
    assert(j.filter(col("wau") =!= col("want")).count() === 0,
      "popcounted bitmap union must be EXACT, not approximate")
    j.unpersist()
  }

  test("MAD anomaly screen: flags agree with a collected recomputation, zero-MAD guard honored") {
    val m = Profiling.queries("events_anomaly_mad")(spark, sfDir).collect()
    assert(m.nonEmpty)
    val med = m.head.getAs[Double]("med")
    val mad = m.head.getAs[Double]("mad")
    assert(m.forall(r => r.getAs[Double]("med") == med &&
      r.getAs[Double]("mad") == mad), "median/MAD are global")
    m.foreach { r =>
      val expect =
        if (mad == 0.0) null
        else java.lang.Boolean.valueOf(
          math.abs(r.getAs[Long]("n").toDouble - med) > 3.0 * 1.4826 * mad)
      assert(r.getAs[java.lang.Boolean]("is_anomaly") === expect,
        s"day ${r.getAs[java.sql.Date]("day")}")
    }
    // MAD must be no larger than the moment-based spread it robustifies
    val counts = m.map(_.getAs[Long]("n").toDouble)
    val mean = counts.sum / counts.length
    val sd = math.sqrt(counts.map(c => (c - mean) * (c - mean)).sum /
      counts.length)
    assert(mad <= sd + 1e-9, s"MAD $mad vs stddev $sd")
  }

  test("interarrival: per-user gap count is n_events - 1 and every max >= avg > 0") {
    val ia = Profiling.queries("events_interarrival")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val joined = ia.join(perUser, "user_id")
    assert(joined.filter(col("n_gaps") =!= col("n_events") - 1).count() === 0)
    // users with exactly one event have no gap row at all
    assert(ia.join(perUser.filter(col("n_events") === 1), "user_id").count() === 0)
    assert(ia.filter(col("max_gap_us") < col("avg_gap_us")).count() === 0)
    // gaps are non-negative always; strict positivity only holds for
    // users whose min/max timestamps actually differ (a regenerated
    // corpus may legally produce all-tied timestamps for some user —
    // the invariant must not be data-dependent)
    assert(ia.filter(col("avg_gap_us") < 0.0).count() === 0)
    val advancing = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg((unix_micros(max("ts")) > unix_micros(min("ts"))).as("adv"))
      .filter(col("adv"))
    assert(ia.join(advancing, "user_id")
      .filter(col("avg_gap_us") <= 0.0).count() === 0,
      "a user whose timestamps advance must have a positive mean gap")
    ia.unpersist()
  }

  test("anomaly z-scores: mean of z over days is ~0 and flag agrees with |z|>2") {
    val a = Profiling.queries("events_anomaly_days")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val meanZ = a.agg(avg("zscore")).collect()(0).getDouble(0)
    assert(math.abs(meanZ) < 1e-9, s"z-scores must center at 0, got $meanZ")
    assert(a.filter(col("is_anomaly") =!= (abs(col("zscore")) > 2.0)).count() === 0)
    a.unpersist()
  }

  test("gap islands tile each user's active days: day counts add up and islands don't touch") {
    val isl = Profiling.queries("window_gap_islands")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val daySum = isl.agg(sum("n_days")).collect()(0).getLong(0)
    val distinctDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(daySum === distinctDays, "islands must cover every active day exactly once")
    // within an island, span = n_days - 1; adjacent islands are separated
    assert(isl.filter(datediff(col("island_end"), col("island_start"))
      =!= col("n_days") - 1).count() === 0)
    val touching = isl.as("x").join(isl.as("y"),
      col("x.user_id") === col("y.user_id") &&
        (datediff(col("y.island_start"), col("x.island_end")) === 1))
    assert(touching.count() === 0, "islands separated by <2 days would be one island")
    isl.unpersist()
  }

  test("gini concentration: a single-source language scores simpson=1, uniform sources score 1/k") {
    import spark.implicits._
    val docs = (
      (1 to 10).map(i => (i.toLong, "t", "zz", "onlysource")) ++
      (11 to 22).map(i => (i.toLong, "t", "yy", s"src${i % 4}"))
    ).toDF("doc_id", "text", "lang", "source")
    // same aggregation pipeline as the named query, on a controlled corpus
    val bySrc = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val g = bySrc.groupBy("lang")
      .agg(sum(col("n") * col("n")).as("sumsq"), sum("n").as("nd"))
      .withColumn("simpson",
        col("sumsq").cast("double") / (col("nd") * col("nd")).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g("zz") === 1.0)
    assert(math.abs(g("yy") - 0.25) < 1e-12) // 4 sources × 3 docs → Σp² = 4·(1/4)²
  }

  test("split TV distance is 0 for identical mixtures and 1 for disjoint supports") {
    // exact integer form: Σ|a·B − b·A| / (2AB)
    def tv(pairs: Seq[(Long, Long)]): Double = {
      val ta = pairs.map(_._1).sum; val tb = pairs.map(_._2).sum
      pairs.map { case (a, b) => math.abs(a * tb - b * ta) }.sum.toDouble /
        (2.0 * ta * tb)
    }
    assert(tv(Seq((10L, 20L), (30L, 60L))) === 0.0)
    assert(tv(Seq((10L, 0L), (0L, 7L))) === 1.0)
    // the named query emits one row with a TV in [0, 1]
    val row = Profiling.queries("text_split_divergence")(spark, sfDir).collect()(0)
    val d = row.getAs[Double]("tv_distance")
    assert(d >= 0.0 && d <= 1.0)
    assert(row.getAs[Long]("n_train") > row.getAs[Long]("n_test"),
      "train share (~90%) must dominate test (~5%)")
  }

  test("weighted mean discount lies inside the discount range and differs from the plain mean") {
    val wa = Profiling.queries("agg_weighted_avg")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val bounds = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(min("l_discount").as("lo"), max("l_discount").as("hi"),
        avg("l_discount").as("plain"))
    val j = wa.join(bounds, "l_returnflag").collect()
    j.foreach { r =>
      val w = r.getAs[Double]("wavg_discount")
      assert(w >= r.getAs[Double]("lo") && w <= r.getAs[Double]("hi"))
    }
    // weighting by price must move at least one group off the plain mean
    assert(j.exists(r =>
      math.abs(r.getAs[Double]("wavg_discount") - r.getAs[Double]("plain")) > 1e-9))
    wa.unpersist()
  }

  test("drawdown is nonnegative, zero for monotone users, bounded by the value range") {
    val dd = Profiling.queries("window_drawdown")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(dd.filter(col("max_drawdown") < 0.0).count() === 0)
    val range = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg((max("value") - min("value")).as("span"))
    assert(dd.join(range, "user_id")
      .filter(col("max_drawdown") > col("span")).count() === 0,
      "a drawdown cannot exceed the user's total value range")
    dd.unpersist()
  }

  test("pareto: top decile share is a proper fraction and beats uniform") {
    val row = Profiling.queries("events_power_pareto")(spark, sfDir).collect()(0)
    val share = row.getAs[Double]("top_decile_share")
    val users = row.getAs[Long]("n_users")
    val k = row.getAs[Long]("top_decile_users")
    assert(k === (users + 9) / 10)
    assert(share > 0.0 && share <= 1.0)
    // the top-ranked decile is by definition at least its uniform share
    assert(share >= k.toDouble / users.toDouble - 1e-12)
    assert(row.getAs[Long]("top_decile_events") <= row.getAs[Long]("total_events"))
  }

  test("weekly actives dominate daily actives and the window drains past the tail") {
    val wa = Profiling.queries("events_weekly_active")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(wa.filter(col("dau") > col("wau")).count() === 0,
      "a day's actives are a subset of its trailing week's actives")
    assert(wa.filter(col("wau") <= 0).count() === 0)
    val activeDays = Tables.events(spark, sfDir)
      .select(to_date(col("ts"))).distinct().count()
    // report days = active days plus the ≤6 drain days past the tail
    val n = wa.count()
    assert(n >= activeDays && n <= activeDays + 6)
    // drain rows (no same-day activity) have dau = 0 and stickiness 0
    assert(wa.filter(col("dau") === 0 && col("stickiness") =!= 0.0).count() === 0)
    wa.unpersist()
  }

  test("value bands are ordered (p50 <= p95) and day counts partition the table") {
    val vb = Profiling.queries("events_value_bands")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(vb.filter(col("p50_value") > col("p95_value")).count() === 0)
    assert(vb.agg(sum("n_events")).collect()(0).getLong(0) ===
      Tables.events(spark, sfDir).count())
    vb.unpersist()
  }

  test("per-source dup rate is consistent with the global exact-dup census") {
    val dr = Profiling.queries("text_dedup_rate_by_source")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(dr.filter(col("n_unique") > col("n_docs")).count() === 0)
    assert(dr.filter(col("dup_rate") < 0.0 || col("dup_rate") >= 1.0).count() === 0)
    assert(dr.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sfDir).count())
    dr.unpersist()
  }

  test("novelty: the first doc scores 1.0 and novel counts sum to the distinct-bigram census") {
    val nv = Profiling.queries("text_ngram_novelty")(spark, sfDir)
      .transform(df => { df.persist(); df })
    val firstDoc = nv.agg(min("doc_id")).collect()(0).getLong(0)
    assert(nv.filter(col("doc_id") === firstDoc)
      .collect()(0).getAs[Double]("novelty") === 1.0,
      "every bigram of the earliest doc is first seen there")
    // Brute-force recomputation in driver memory (sf0.001): a novel
    // OCCURRENCE is one whose bigram's global min doc_id is this doc.
    val occ = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().flatMap { r =>
        val t = r.getSeq[String](1)
        t.zip(t.drop(1)).map(p => (r.getLong(0), p._1 + " " + p._2))
      }
    val owner = occ.groupBy(_._2).map { case (bg, xs) => bg -> xs.map(_._1).min }
    val expected = occ.groupBy(_._1).map { case (doc, xs) =>
      doc -> (xs.size.toLong, xs.count(x => owner(x._2) == doc).toLong)
    }
    val got = nv.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    nv.unpersist()
  }

  test("table stats: one row per profiled column, keys are unique and dense") {
    val st = Profiling.queries("profile_table_stats")(spark, sfDir)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(st.keySet === Set("o_orderkey", "o_custkey", "o_totalprice"))
    val nOrders = Tables.orders(spark, sfDir).count()
    st.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nOrders)
      assert(r.getAs[Long]("n_nulls") === 0L)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
    // o_orderkey is the primary key: distinct count equals row count
    assert(st("o_orderkey").getAs[Long]("n_distinct") === nOrders)
  }

  test("CUSUM telescopes to zero at the last day and flags exactly the |max| rows") {
    val cp = Profiling.queries("events_changepoint")(spark, sfDir)
      .transform(df => { df.persist(); df })
    // n·Σ_{j≤n} c_j − n·Σc = 0: the full-range cumulative deviation
    // telescopes away, so the LAST day's statistic is exactly 0.
    val last = cp.orderBy(col("day").desc).limit(1)
      .collect()(0).getAs[Long]("cusum_scaled")
    assert(last === 0L)
    val maxAbs = cp.agg(max(abs(col("cusum_scaled")))).collect()(0).getLong(0)
    assert(cp.filter(col("is_peak") =!=
      (abs(col("cusum_scaled")) === maxAbs)).count() === 0)
    assert(cp.filter(col("is_peak")).count() >= 1)
    cp.unpersist()
  }

  test("repetition ratio stays in (0,1] and distinct <= total per source") {
    val cr = Profiling.queries("text_compress_ratio")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(cr.filter(col("n_distinct") > col("n_bigrams")).count() === 0)
    assert(cr.filter(col("distinct_ratio") <= 0.0 ||
      col("distinct_ratio") > 1.0).count() === 0)
    assert(cr.count() === Tables.documents(spark, sfDir)
      .select("source").distinct().count(),
      "every source has at least one 2-token doc in the corpus")
    cr.unpersist()
  }

  test("op mix partitions each day's events: insert+update+delete = total") {
    val m = graft.pipeline.CdcQueries.queries("cdc_op_mix")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(m.filter(col("n_insert") + col("n_update") + col("n_delete")
      =!= col("n_total")).count() === 0)
    val total = m.agg(sum("n_total")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sfDir).count())
    m.unpersist()
  }

  test("LSH bucket balance conserves the corpus: sizes x counts sum to |embeddings|") {
    val bal = graft.operators.Similarity.queries("ann_bucket_balance")(spark, sfDir)
    val mass = bal.agg(sum(col("bucket_size") * col("n_buckets")))
      .collect()(0).getLong(0)
    val corpus = Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") >= graft.operators.Similarity.N_QUERIES).count()
    assert(mass === corpus, "every corpus vector must land in exactly one bucket")
    assert(bal.filter(col("bucket_size") <= 0).count() === 0)
  }

  test("near-dup triangle census matches a brute-force count and wedge identity") {
    val row = graft.operators.Dedup.queries("dedup_pair_triangles")(spark, sfDir)
      .collect()(0)
    val pairs = graft.operators.Dedup.queries("dedup_ngram_jaccard")(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getAs[Long]("n_edges") === pairs.length.toLong)
    // brute force in driver memory (sf0.001: pair set is small)
    val es = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val tri = (for {
      (a, b) <- pairs
      c <- nodes if b < c && es.contains((b, c)) && es.contains((a, c))
    } yield 1L).sum
    assert(row.getAs[Long]("n_triangles") === tri)
    val degs = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).values.map(_.size.toLong)
    assert(row.getAs[Long]("n_wedges") === degs.map(d => d * (d - 1) / 2).sum)
  }

  test("daily funnel: stage counts nest and cohorts cover every viewing user") {
    val f = Profiling.queries("events_funnel_daily")(spark, sfDir)
      .transform(df => { df.persist(); df })
    // monotone stages: purchased ⊆ clicked ⊆ viewers, per cohort
    assert(f.filter(col("n_purchased") > col("n_clicked") ||
      col("n_clicked") > col("n_viewers")).count() === 0)
    // every user with a view lands in exactly one cohort
    val viewers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(f.agg(sum("n_viewers")).collect()(0).getLong(0) === viewers)
    // rate fields agree with their integer numerators
    assert(f.filter(col("view_click_rate") =!=
      col("n_clicked").cast("double") / col("n_viewers").cast("double"))
      .count() === 0)
    f.unpersist()
  }

  test("length bands: p50 <= p95, inside [min,max], docs partition by source") {
    val b = Profiling.queries("text_length_bands")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(b.filter(col("p50_chars") > col("p95_chars")).count() === 0)
    val mm = Tables.documents(spark, sfDir).groupBy("source")
      .agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
    assert(b.join(mm, "source")
      .filter(col("p50_chars") < col("mn") || col("p95_chars") > col("mx"))
      .count() === 0)
    assert(b.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sfDir).count())
    b.unpersist()
  }

  test("repeat runs match a brute-force scan of every document") {
    val got = Profiling.queries("text_repeat_run")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.size === docs.length)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      var runs = 0L
      var maxRun = 0L
      var cur = 0L
      var prev: String = null
      toks.foreach { t =>
        if (prev == null || t != prev) { runs += 1; cur = 1 } else cur += 1
        if (cur > maxRun) maxRun = cur
        prev = t
      }
      assert(got(id) === ((runs, maxRun)), s"doc $id")
    }
  }

  test("bigram commonness: every doc's avg df is >= 1 and a duplicated doc pushes df up") {
    val c = Profiling.queries("text_bigram_commonness")(spark, sfDir)
      .transform(df => { df.persist(); df })
    assert(c.filter(col("avg_bigram_df") < 1.0).count() === 0,
      "a bigram's df counts at least its own occurrence")
    val nDocs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(c.count() === nDocs, "exactly one score row per scorable doc")
    c.unpersist()
  }

  test("rfm: cells partition the users, quintile indices stay in 0..4") {
    val cells = Profiling.queries("events_rfm")(spark, sfDir).collect()
    assert(cells.nonEmpty)
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(cells.map(_.getLong(3)).sum === nUsers,
      "every user lands in exactly one (r,f,m) cell")
    for (c <- cells; i <- 0 to 2)
      assert(c.getInt(i) >= 0 && c.getInt(i) <= 4,
        s"quintile index out of range: $c")
    // boundaries are a pure function of the data: re-evaluation agrees
    val again = Profiling.queries("events_rfm")(spark, sfDir).collect()
    assert(cells.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("theta set algebra: exact counts reconcile with direct distinct queries") {
    import graft.operators.RelationalExt
    val rows = RelationalExt.queries("agg_theta_set_ops")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey"), col("o_orderpriority"))
    val a = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct()
    val b = o.filter(col("o_orderpriority") === "2-HIGH")
      .select("o_custkey").distinct()
    val inter = a.join(b, Seq("o_custkey"), "left_semi").count()
    assert(rows("union")._1 === a.unionByName(b).distinct().count())
    assert(rows("intersect")._1 === inter)
    assert(rows("a_not_b")._1 === a.count() - inter)
    // k=256 sketches with the fixed library seed: the 4-sigma bound is
    // a deterministic verdict and must hold
    assert(rows.values.forall(_._2), s"sketch bound violated: $rows")
  }

  test("sequential funnel matches a brute per-user greedy replay") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val T = 48L * 3600L * 1000000L
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val got = graft.operators.RelationalExt
      .queries("events_funnel_sequential")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.lang.Long]("signup_us")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("click_us")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("purchase_us")).map(_.longValue),
          r.getAs[Int]("reached_step")))).toMap
    assert(got.keySet === ev.keySet.toSet)
    for ((u, rows) <- ev) {
      val sorted = rows.toSeq.sortBy(t => (t._3, t._2))
      val s1 = sorted.filter(_._4 == "signup").map(_._3).minOption
      val c = s1.flatMap(a => sorted.filter(t => t._4 == "click" &&
        t._3 > a && t._3 <= a + T).map(_._3).minOption)
      val p = c.flatMap(a => sorted.filter(t => t._4 == "purchase" &&
        t._3 > a && t._3 <= a + T).map(_._3).minOption)
      val reach = Seq(s1, c, p).count(_.isDefined)
      assert(got(u) === ((s1, c, p, reach)), s"user $u greedy replay")
    }
    CachePool.releaseAll()
  }
}
