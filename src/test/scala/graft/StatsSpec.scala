package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats
import graft.sources.Tables

/** Semantic assertions for the distribution-statistics and growth-
  * accounting operators — each checked against an independent
  * formulation (Spark's own builtin aggregates, or a definitional
  * invariant), never against the implementation's plan.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("survival curve matches a brute-force Kaplan-Meier recompute") {
    val got = Stats.queries("events_survival_curve")(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("dy"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val fd = rows.map(_._2).min
      val purchases = rows.filter(_._3 == "purchase").map(_._2)
      if (purchases.nonEmpty)
        (java.time.temporal.ChronoUnit.DAYS.between(fd, purchases.min).toInt, true)
      else
        (java.time.temporal.ChronoUnit.DAYS.between(fd, rows.map(_._2).max).toInt, false)
    }.toSeq
    val offsets = perUser.map(_._1).distinct.sorted
    assert(got.keySet === offsets.toSet)
    var surv = 1.0
    for (l <- offsets) {
      val atRisk = perUser.count(_._1 >= l).toLong
      val events = perUser.count(p => p._1 == l && p._2).toLong
      val h = events.toDouble / atRisk
      surv *= (1.0 - h)
      val (gAr, gEv, gH, gS) = got(l)
      assert(gAr === atRisk, s"l=$l at_risk")
      assert(gEv === events, s"l=$l events")
      assert(math.abs(gH - h) < 1e-12, s"l=$l hazard")
      assert(math.abs(gS - surv) < 1e-12, s"l=$l survival")
    }
    // survival is monotone non-increasing from 1-h0
    val ss = offsets.map(got(_)._4)
    assert(ss.zip(ss.tail).forall { case (a, b) => b <= a + 1e-15 })
    assert(got.size >= 3, "curve must be non-degenerate at this SF")
  }

  test("ratio-delta readout matches a brute-force per-user delta method") {
    val row = Stats.queries("events_ab_ratio_delta")(spark, sfDir)
      .collect().head
    // brute model: sessionize each user by the 30-min gap on event_id
    // order, then the textbook delta-method ratio variance per arm
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(2).toInstant.getNano / 1000L,
        r.getString(3), r.getDouble(4)))
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val gaps = sorted.map(_._3).toSeq.sliding(2)
        .count { w => w.size == 2 && w(1) - w(0) > 1800L * 1000000L }
      val y = sorted.filter(_._4 == "purchase")
        .map(e => math.floor(e._5 * 100 + 0.5).toLong).sum
      (u, gaps.toLong + 1L, y)
    }.toSeq
    def arm(v: Int) = perUser.filter(p => (p._1 % 2 + 2) % 2 == v)
    def moments(xs: Seq[(Long, Long, Long)]) = {
      val n = xs.size.toDouble
      val sy = xs.map(_._3).sum.toDouble; val sn = xs.map(_._2).sum.toDouble
      val syy = xs.map(p => BigInt(p._3) * BigInt(p._3)).sum.toDouble
      val snn = xs.map(p => BigInt(p._2) * BigInt(p._2)).sum.toDouble
      val syn = xs.map(p => BigInt(p._3) * BigInt(p._2)).sum.toDouble
      val r = sy / sn
      val varY = (syy - sy * sy / n) / (n - 1)
      val covYN = (syn - sy * sn / n) / (n - 1)
      val varN = (snn - sn * sn / n) / (n - 1)
      val meanN = sn / n
      (n.toLong, r, (varY - 2 * r * covYN + r * r * varN) / (n * meanN * meanN))
    }
    val (nc, rc, vc) = moments(arm(0))
    val (nt, rt, vt) = moments(arm(1))
    def ok(a: Double, b: Double) =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    assert(row.getLong(0) == nc && row.getLong(1) == nt)
    assert(ok(row.getDouble(2), rc), s"ratio_ctl ${row.getDouble(2)} vs $rc")
    assert(ok(row.getDouble(3), rt), s"ratio_trt ${row.getDouble(3)} vs $rt")
    assert(ok(row.getDouble(4), rt - rc))
    assert(ok(row.getDouble(5), math.sqrt(vc + vt)))
    assert(ok(row.getDouble(6), (rt - rc) * (rt - rc) / (vc + vt)))
    assert(row.getBoolean(7) ==
      ((rt - rc) * (rt - rc) / (vc + vt) > 3.841458820694124))
    // the variance must be positive and finite at this SF — a degenerate
    // readout here would mean the guards mask a broken moment pipeline
    assert(vc > 0 && vt > 0 && !row.isNullAt(5))
  }

  test("weighted median matches a brute-force sorted-cumulation per group") {
    val got = Stats.queries("agg_weighted_median")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        new java.math.BigDecimal(r.getDouble(2))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()))
    for ((flag, fr) <- rows.groupBy(_._1)) {
      val byQ = fr.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byQ.map(_._2).sum
      var cum = 0L
      val median = byQ.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      val (nQ, totW, med) = got(flag)
      assert(nQ === byQ.size.toLong, s"$flag distinct values")
      assert(totW === total, s"$flag total weight")
      assert(med === median, s"$flag median")
    }
  }

  test("welch t-test matches a brute-force recompute of moments and statistic") {
    val r = Stats.queries("events_ab_value_ttest")(spark, sfDir).collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    // brute force: per-user purchase revenue in cents, split by parity
    val perUser = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.filter(_._2 == "purchase")
          .map(e => math.rint(e._3 * 100).toLong).sum
      }
    val byVar = perUser.groupBy(_._1 % 2)
    def stats(v: Long) = {
      val xs = byVar(v).map(_._2.toDouble / 100).toArray
      val n = xs.length; val m = xs.sum / n
      (n.toLong, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (bnA, bmA, bvA) = stats(0); val (bnB, bmB, bvB) = stats(1)
    assert(nA === bnA); assert(nB === bnB)
    assert(math.abs(r.getDouble(2) - bmA) < 1e-9, "mean_a")
    assert(math.abs(r.getDouble(3) - bmB) < 1e-9, "mean_b")
    assert(math.abs(r.getDouble(4) - bvA) < 1e-6, "var_a")
    assert(math.abs(r.getDouble(5) - bvB) < 1e-6, "var_b")
    val se2 = bvA / bnA + bvB / bnB
    val t2 = (bmA - bmB) * (bmA - bmB) / se2
    assert(math.abs(r.getDouble(6) - t2) / math.max(t2, 1e-12) < 1e-6, "t_stat2")
    assert(r.getDouble(7) > math.min(bnA, bnB) / 2.0,
      "welch df must be of the order of the sample sizes")
    assert(r.getBoolean(8) === (r.getDouble(6) > 3.841458820694124))
  }

  test("attribution: segment ownership recomputed by a per-user replay") {
    val r = Stats.queries("events_attribution")(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2)))
    var nP = 0L; var nAttr = 0L; var nSingle = 0L; var clicksTot = 0L
    for ((_, rows) <- ev.groupBy(_._1)) {
      var segClicks = List.empty[Long] // click event_ids since last purchase
      for ((_, eid, tp) <- rows.sortBy(_._2)) tp match {
        case "purchase" =>
          nP += 1
          if (segClicks.nonEmpty) {
            nAttr += 1; clicksTot += segClicks.length
            if (segClicks.length == 1) nSingle += 1
          }
          segClicks = Nil
        case "click" => segClicks ::= eid
        case _ => ()
      }
    }
    assert(r.getLong(0) === nP)
    assert(r.getLong(1) === nAttr)
    assert(r.getLong(2) === nSingle)
    assert(r.getLong(3) === clicksTot)
    assert(math.abs(r.getDouble(4) - nAttr.toDouble / nP) < 1e-15)
    assert(nAttr > 0 && nAttr < nP, "slice must exercise both branches")
  }

  test("bitmap distinct equals the engine's exact countDistinct per group") {
    val got = Stats.queries("agg_bitmap_distinct")(spark, sfDir)
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("want_users"))
    val joined = got.join(want, "event_type").persist()
    assert(joined.filter(col("n_users") =!= col("want_users")).count() === 0,
      "bitmap popcount sum must be EXACT, not approximate")
    // buckets can't outnumber members, and 64 buckets can't undercount
    assert(joined.filter(col("n_buckets") > col("n_users")).count() === 0)
    assert(joined
      .filter(col("n_users") > col("n_buckets") * 64).count() === 0)
    joined.unpersist()
  }

  test("OLS slope/intercept match Spark's builtin regr_* aggregates") {
    val got = Stats.queries("agg_regr_slope")(spark, sfDir)
    val want = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("w_slope"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("w_icpt"))
    val rows = got.join(want, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, ws) = (r.getAs[Double]("slope"), r.getAs[Double]("w_slope"))
      val (i, wi) = (r.getAs[Double]("intercept"), r.getAs[Double]("w_icpt"))
      // builtin uses a different (streaming) update order — tolerance,
      // not equality; the decimal-power-sum route is the exact one
      assert(math.abs(s - ws) <= 1e-6 * math.max(1.0, math.abs(ws)),
        s"slope $s vs builtin $ws")
      assert(math.abs(i - wi) <= 1e-6 * math.max(1.0, math.abs(wi)),
        s"intercept $i vs builtin $wi")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("skewness/kurtosis match Spark's builtin aggregates") {
    val got = Stats.queries("agg_skewness")(spark, sfDir)
    val want = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("w_skew"),
        kurtosis(col("l_quantity")).as("w_kurt"))
    val rows = got.join(want, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, ws) = (r.getAs[Double]("skewness"), r.getAs[Double]("w_skew"))
      val (k, wk) =
        (r.getAs[Double]("excess_kurtosis"), r.getAs[Double]("w_kurt"))
      assert(math.abs(s - ws) <= 1e-6 * math.max(1.0, math.abs(ws)),
        s"skewness $s vs builtin $ws")
      // Spark's kurtosis() is already the EXCESS form
      assert(math.abs(k - wk) <= 1e-6 * math.max(1.0, math.abs(wk)),
        s"kurtosis $k vs builtin $wk")
    }
  }

  test("lifecycle: news total distinct users; churn = resurrections + users; actives match weekly census") {
    val lc = Stats.queries("events_lifecycle")(spark, sfDir).persist()
    val ev = Tables.events(spark, sfDir)
    val nUsers = ev.select("user_id").distinct().count()
    val totals = lc.agg(
      sum("n_new").as("tn"), sum("n_retained").as("tr"),
      sum("n_resurrected").as("ts"), sum("n_churned").as("tc")).collect()(0)
    // every user is born exactly once
    assert(totals.getAs[Long]("tn") === nUsers)
    // every resurrection was preceded by a churn, and every user's final
    // week emits exactly one more churn: churned = resurrected + users
    assert(totals.getAs[Long]("tc") === totals.getAs[Long]("ts") + nUsers)
    // n_active(wk) is exactly that week's distinct-user census
    val census = ev
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct().groupBy("wk").agg(count(lit(1)).as("want_active"))
    assert(lc.join(census, "wk")
      .filter(col("n_active") =!= col("want_active")).count() === 0)
    // churn-only weeks (beyond the last active week) carry zero actives
    assert(lc.join(census, Seq("wk"), "left_anti")
      .filter(col("n_active") =!= 0).count() === 0)
    lc.unpersist()
  }

  test("hour-of-day: 24 buckets at most, events total the table") {
    val h = Stats.queries("events_hour_of_day")(spark, sfDir).persist()
    assert(h.count() <= 24)
    assert(h.filter(col("hr") < 0 || col("hr") > 23).count() === 0)
    assert(h.agg(sum("n_events")).collect()(0).getLong(0) ===
      Tables.events(spark, sfDir).count())
    assert(h.filter(col("n_users") > col("n_events")).count() === 0)
    h.unpersist()
  }

  test("stickiness: dau <= mau28, ratio in (0,1], brute-force window check") {
    val st = Stats.queries("events_stickiness")(spark, sfDir).persist()
    assert(st.filter(col("dau") > col("mau28")).count() === 0)
    assert(st.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0)
      .count() === 0)
    // brute force one day: mau28 = distinct users in [day-27, day]
    val probe = st.orderBy(col("day").desc).limit(1).collect()(0)
    val day = probe.getAs[java.sql.Date]("day")
    val brute = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .filter(col("d") <= lit(day) && col("d") >= date_sub(lit(day), 27))
      .select("user_id").distinct().count()
    assert(probe.getAs[Long]("mau28") === brute,
      s"mau28 for $day: brute-force $brute")
    st.unpersist()
  }

  test("cohort LTV: cells reconcile with total revenue, cum telescopes, offset 0 everywhere") {
    val ltv = Stats.queries("events_cohort_ltv")(spark, sfDir).persist()
    // revenue cells partition the event value total exactly
    val want = Tables.events(spark, sfDir)
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val got = ltv.agg(sum("revenue")).collect()(0).getDouble(0)
    assert(math.abs(got - want) <= 1e-6 * math.abs(want))
    // every cohort starts at offset 0 (its members are active that week)
    val cohorts = ltv.select("cohort_week").distinct().count()
    assert(ltv.filter(col("week_offset") === 0).count() === cohorts)
    // cum at the max offset equals the cohort's total revenue / size
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cohort_week")
    val last = ltv
      .withColumn("mx", max("week_offset").over(w))
      .filter(col("week_offset") === col("mx"))
    val bad = last
      .join(ltv.groupBy("cohort_week")
        .agg(sum("revenue").as("tot"), max("n_cohort_users").as("n")),
        "cohort_week")
      .filter(abs(col("cum_ltv_per_user") - col("tot") / col("n")) > 1e-6)
    assert(bad.count() === 0, "cumulative sum must telescope to the total")
    ltv.unpersist()
  }

  test("winsorized mean: clamp counts near 5% per tail, value inside the clamp bounds and the raw range") {
    val wm = Stats.queries("agg_winsorized_mean")(spark, sfDir).persist()
    val raw = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"),
        avg("o_totalprice").as("plain_mean"))
    val j = wm.join(raw, "o_orderpriority").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val n = r.getAs[Long]("n")
      // at most ~5% strictly outside each interpolated bound
      assert(r.getAs[Long]("n_below") <= 0.06 * n + 1)
      assert(r.getAs[Long]("n_above") <= 0.06 * n + 1)
      val m = r.getAs[Double]("winsorized_mean")
      assert(m >= r.getAs[Double]("mn") && m <= r.getAs[Double]("mx"))
      // robust and plain means agree to within the tail mass they differ by
      val pm = r.getAs[Double]("plain_mean")
      assert(math.abs(m - pm) <= 0.25 * pm,
        s"winsorized $m vs plain $pm diverge implausibly")
    }
    wm.unpersist()
  }

  test("ab readout: variants partition users, srm components agree, conversion census ties out") {
    val ab = Stats.queries("events_ab_readout")(spark, sfDir).persist()
    assert(ab.count() <= 2)
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(ab.agg(sum("n_users")).collect()(0).getLong(0) === nUsers)
    // each variant's (obs − total/2) is the negation of the other's, so
    // the two χ² components are identical by symmetry
    val comps = ab.select("srm_component").collect().map(_.getDouble(0))
    if (comps.length == 2) assert(comps(0) === comps(1))
    // converted count per variant ties out against a direct census
    val want = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("pmod(user_id, 2)").as("variant"), col("user_id"))
      .distinct().groupBy("variant").agg(count(lit(1)).as("want_conv"))
    assert(ab.join(want, "variant")
      .filter(col("n_converted") =!= col("want_conv")).count() === 0)
    ab.unpersist()
  }

  test("watermark policy: retention monotone in delay, zero-delay row ties out to the disorder census") {
    val wp = Stats.queries("events_watermark_policy")(spark, sfDir).persist()
    assert(wp.count() === 6)
    val rows = wp.orderBy("delay_us").collect()
    // bigger delay can only retain more
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_retained") <= b.getAs[Long]("n_retained"))
    }
    // delay 0 retains exactly the rows out_of_order does NOT flag late
    val oo = Stats.queries("events_out_of_order")(spark, sfDir)
      .agg(sum("n_events").as("n"), sum("n_late").as("late")).collect()(0)
    val zero = rows.head
    assert(zero.getAs[Long]("delay_us") === 0L)
    assert(zero.getAs[Long]("n_events") === oo.getAs[Long]("n"))
    assert(zero.getAs[Long]("n_retained") ===
      oo.getAs[Long]("n") - oo.getAs[Long]("late"))
    wp.unpersist()
  }

  test("lag percentiles: ordered p50<=p95<=p99<=max, census ties out") {
    val lp = Stats.queries("events_lag_percentiles")(spark, sfDir).persist()
    assert(lp.filter(col("p50_us") > col("p95_us") ||
      col("p95_us") > col("p99_us") ||
      col("p99_us") > col("max_lateness_us").cast("double")).count() === 0)
    assert(lp.filter(col("p50_us") < 0.0).count() === 0)
    assert(lp.agg(sum("n_events")).collect()(0).getLong(0) ===
      Tables.events(spark, sfDir).count())
    lp.unpersist()
  }

  test("naive forecast: bias bounded by absolute error, evaluated days cover the overlap") {
    val fc = Stats.queries("events_forecast_naive")(spark, sfDir).persist()
    assert(fc.filter(abs(col("bias_total")) > col("abs_err_total")).count() === 0)
    assert(fc.filter(col("dow") < 1 || col("dow") > 7).count() === 0)
    // each evaluated day needs BOTH itself and day-7 present
    val days = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day")).distinct().persist()
    val overlap = days.as("a")
      .join(days.as("b"), col("a.day") === date_add(col("b.day"), 7)).count()
    assert(fc.agg(sum("n_days")).collect()(0).getLong(0) === overlap)
    days.unpersist(); fc.unpersist()
  }

  test("out-of-order: first event is never late, shares bounded, census matches") {
    val oo = Stats.queries("events_out_of_order")(spark, sfDir).persist()
    // n_late <= n_events - 1 (the first arrival has no predecessor)
    assert(oo.filter(col("n_late") > col("n_events") - 1).count() === 0)
    assert(oo.filter(col("late_share") < 0.0 || col("late_share") >= 1.0)
      .count() === 0)
    // per-user event counts must match the raw census
    val census = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("want_n"))
    assert(oo.join(census, "user_id")
      .filter(col("n_events") =!= col("want_n")).count() === 0)
    // independent brute force on one user: count rows whose ts is below
    // the running max in event_id order
    val one = oo.orderBy(col("n_events").desc, col("user_id")).limit(1)
      .collect()(0)
    val uid = one.getAs[Long]("user_id")
    val rows = Tables.events(spark, sfDir)
      .filter(col("user_id") === uid)
      .select(col("event_id"), unix_micros(col("ts")).as("s"))
      .orderBy("event_id").collect()
    var mx = Long.MinValue; var late = 0L
    rows.foreach { r =>
      val t = r.getAs[Long]("s")
      if (t < mx) late += 1
      if (t > mx) mx = t
    }
    assert(one.getAs[Long]("n_late") === late,
      s"user $uid: brute-force late count $late")
    oo.unpersist()
  }

  test("sequential readout: futility line rises to meet efficacy at t=1, bounds exclusive") {
    val rows = Stats.queries("events_ab_sequential")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("day"))
    assert(rows.nonEmpty)
    def fOpt(r: org.apache.spark.sql.Row, c: String): Option[Double] =
      if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
    // the futility bound is active only once the line is positive, and
    // is non-decreasing in information time (the efficacy bound is
    // non-increasing): an experiment that cannot win gets stopped later
    // looks, never earlier ones
    val futs = rows.flatMap(r => fOpt(r, "bound_futility_z2"))
    assert(futs.sliding(2).forall {
      case Array(a, b) => a <= b + 1e-12; case _ => true },
      s"futility bound must be non-decreasing: ${futs.toSeq}")
    // boundaries meet at the final look (t = 1): z_fut(1) = C so
    // fut bound = C^2 = the efficacy bound's 4.09779049 / 1
    val last = rows.last
    assert(math.abs(last.getAs[Double]("bound_futility_z2") -
      last.getAs[Double]("bound_z2")) < 1e-8, "bounds must meet at t=1")
    // mutual exclusivity: futility sits strictly below efficacy for
    // t < 1, so no day can cross both
    rows.foreach { r =>
      val both = !r.isNullAt(r.fieldIndex("crossed")) &&
        r.getAs[Boolean]("crossed") &&
        !r.isNullAt(r.fieldIndex("crossed_futility")) &&
        r.getAs[Boolean]("crossed_futility")
      assert(!both, s"day ${r.getAs[Int]("day")} crossed both bounds")
      // crossed_futility really is z2 < bound_futility_z2
      (fOpt(r, "z2"), fOpt(r, "bound_futility_z2")) match {
        case (Some(z), Some(f)) =>
          assert(r.getAs[Boolean]("crossed_futility") === (z < f))
        case _ =>
          assert(r.isNullAt(r.fieldIndex("crossed_futility")))
      }
    }
    CachePool.releaseAll()
  }

  test("sequential readout: a hopeless experiment crosses futility, never efficacy") {
    // synthetic null-effect corpus (r14 verdict #7 — the fixture corpus
    // only exercises the efficacy side's crossing behavior): 10 arrival
    // days, 80 users/day split evenly by pmod(user_id, 2), conversion
    // EXACTLY 1/2 in both arms every day → z² = 0 at every look. The
    // futility line activates once (C+z_β)·√t > z_β/√t ⇔ t > z_β/(C+z_β)
    // ≈ 0.2937, i.e. from day 2 (t = 0.3) — from there every look must
    // stop for futility, and the efficacy bound must never fire.
    import java.sql.Timestamp
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hopeless").toFile.getAbsolutePath
    var eid = 0L
    val rows = (for {
      day <- 0 until 10
      u <- 0 until 80
      uid = (day * 80 + u).toLong
      ts = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
      // converts iff uid % 4 < 2: exactly half of each parity class
      ev <- Seq(("signup", 1.0)) ++
        (if (uid % 4 < 2) Seq(("purchase", 2.0)) else Nil)
    } yield {
      eid += 1
      (eid, ts, uid, ev._1, ev._2, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Stats.queries("events_ab_sequential")(spark, dir)
      .collect().sortBy(_.getAs[Int]("day"))
    assert(got.length === 10)
    for (r <- got) {
      // balanced arms, identical rates: z² must be exactly 0
      assert(r.getAs[Double]("z2") === 0.0, s"day ${r.getAs[Int]("day")} z2")
      assert(!r.getAs[Boolean]("crossed"),
        s"day ${r.getAs[Int]("day")}: a null effect crossed EFFICACY")
      val day = r.getAs[Int]("day")
      if (day < 2) {
        // t = 0.1, 0.2 — the futility line is still negative: inactive
        assert(r.isNullAt(r.fieldIndex("bound_futility_z2")),
          s"day $day: futility bound active before t ≈ 0.2937")
        assert(r.isNullAt(r.fieldIndex("crossed_futility")))
      } else {
        assert(r.getAs[Boolean]("crossed_futility"),
          s"day $day: hopeless experiment must stop for futility")
      }
    }
    CachePool.releaseAll()
  }

  test("holm step-down: ranks by evidence, gates downstream rejections, ties to the t-test") {
    val rows = Stats.queries("events_ab_holm")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("holm_rank"))
    assert(rows.map(_.getAs[String]("metric")).toSet ===
      Set("revenue_cents", "events_per_user", "purchases_per_user",
        "active_days"))
    val thresholds = Seq(6.23853263690954, 5.731139281939075,
      5.0238861873148934, 3.8414588206941236)
    // rank order: z2 descending, nulls last
    val z2s = rows.map(r => Option(r.getAs[java.lang.Double]("z2"))
      .map(_.doubleValue))
    assert(z2s.collect { case Some(v) => v }.toSeq ===
      z2s.collect { case Some(v) => v }.toSeq.sorted.reverse)
    assert(rows.map(_.getAs[Double]("threshold")).toSeq === thresholds)
    // step-down: rejected_i == AND over j<=i of (z2_j > T_j)
    var gate = true
    for ((r, i) <- rows.zipWithIndex) {
      gate = gate && z2s(i).exists(_ > thresholds(i))
      assert(r.getAs[Boolean]("rejected") === gate,
        s"rank ${i + 1} step-down gate")
    }
    // the revenue metric's z2 is the value-ttest's t2 up to the cents
    // rescale (t2 is scale-invariant mathematically; IEEE only approx)
    val t2 = Stats.queries("events_ab_value_ttest")(spark, sfDir)
      .collect()(0).getAs[Double]("t_stat2")
    val zRev = rows.find(_.getAs[String]("metric") == "revenue_cents")
      .flatMap(r => Option(r.getAs[java.lang.Double]("z2"))).get
    assert(math.abs(zRev - t2) <= 1e-9 * math.max(1.0, t2.abs),
      s"holm revenue z2 $zRev vs ttest t2 $t2")
    CachePool.releaseAll()
  }
}
