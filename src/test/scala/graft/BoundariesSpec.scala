package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boundaries

/** The distributed prefix-sum / exact-quantile helper (r12): proves the
  * range-partitioned two-level scan equals the single-window cumulative
  * it replaced, on random histograms — and that its plan never funnels
  * one task (no partitionless WindowExec anywhere in the tree).
  */
class BoundariesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Deterministic seed sweep (the repo's property-test convention). */
  private def forSeeds(n: Int)(body: Long => Unit): Unit =
    (1 to n).foreach(i => body(0xB0DA1E5L * i + 11))

  private def noPartitionlessWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    val offenders = df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(offenders.isEmpty,
      s"prefix-sum plan contains a single-task window: $offenders")
  }

  test("prefixSum == partitionless-window cumulative on random histograms") {
    forSeeds(10) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(200)
      // distinct keys (histogram precondition), counts ≥ 1
      val rows = rnd.shuffle((0 until n).toList)
        .map(v => (v.toLong * 3 - 17, 1L + rnd.nextInt(5)))
      val hist = rows.toDF("v", "c")
      val got = Boundaries.prefixSum(hist, "v", "c", "cum")
        .orderBy("v").select("v", "cum").as[(Long, Long)].collect().toSeq
      val want = hist.withColumn("cum", sum("c").over(
          Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("v").select("v", "cum").as[(Long, Long)].collect().toSeq
      assert(got == want)
      CachePool.releaseAll()
    }
  }

  test("prefixSum exclusive frame == count strictly below") {
    val hist = Seq((10L, 2L), (20L, 3L), (30L, 5L)).toDF("v", "c")
    val got = Boundaries.prefixSum(hist, "v", "c", "below", inclusive = false)
      .orderBy("v").select("v", "below").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 0L), (20L, 2L), (30L, 5L)))
    CachePool.releaseAll()
  }

  test("quantileArray == rank-extraction over a full sort") {
    forSeeds(10) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(300)
      val values = List.fill(n)(rnd.nextInt(40).toLong) // heavy ties
      val df = values.toDF("m")
      val arr = Boundaries.quantileArray(df, "m", 5, "qb")
        .select("qb").as[Seq[Long]].collect().head
      // reference: boundary_i = sorted(values)[(i*n) div 5 - 1] (rank is
      // 1-based), ranks deduped, per-rank values kept (dups allowed)
      val sorted = values.sorted
      val want = (1 to 4).map(i => i.toLong * n / 5).filter(_ >= 1L)
        .distinct.map(rk => sorted((rk - 1).toInt)).sorted
      assert(arr == want, s"n=$n arr=$arr want=$want")
      CachePool.releaseAll()
    }
  }

  test("quantileArray dedupValues collapses ranks sharing a boundary") {
    // 10 equal values: every rank lands on the same boundary value
    val df = List.fill(10)(7L).toDF("m")
    val arr = Boundaries.quantileArray(df, "m", 5, "qb", dedupValues = true)
      .select("qb").as[Seq[Long]].collect().head
    assert(arr == Seq(7L))
    CachePool.releaseAll()
  }

  test("no partitionless WindowExec anywhere in the helper's plans") {
    val hist = (1 to 100).map(i => (i.toLong, 1L)).toDF("v", "c")
    noPartitionlessWindow(Boundaries.prefixSum(hist, "v", "c", "cum"))
    val vals = (1 to 100).map(_.toLong % 13).toDF("m")
    noPartitionlessWindow(Boundaries.quantileArray(vals, "m", 5, "qb"))
    CachePool.releaseAll()
  }

  test("prefixSumGrouped == per-group window cumulative on random grouped histograms") {
    forSeeds(10) { seed =>
      val rnd = new scala.util.Random(seed)
      val groups = (0 until 1 + rnd.nextInt(5)).map(g => s"g$g")
      val rows = for {
        g <- groups.toList
        v <- rnd.shuffle((0 until 1 + rnd.nextInt(60)).toList)
      } yield (g, v.toLong * 7 - 3, 1L + rnd.nextInt(4))
      val hist = rows.toDF("g", "v", "c")
      val got = Boundaries.prefixSumGrouped(hist, Seq("g"), "v", "c", "cum")
        .orderBy("g", "v").select("g", "v", "cum")
        .as[(String, Long, Long)].collect().toSeq
      val want = hist.withColumn("cum", sum("c").over(
          Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("g", "v").select("g", "v", "cum")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == want)
      CachePool.releaseAll()
    }
  }

  test("quantileValuesGrouped == per-group rank extraction over a full sort") {
    forSeeds(8) { seed =>
      val rnd = new scala.util.Random(seed)
      val groups = (0 until 1 + rnd.nextInt(4)).map(g => s"t$g")
      val data = groups.map(g =>
        g -> List.fill(4 + rnd.nextInt(120))(rnd.nextInt(25).toLong)).toMap
      val df = data.toList.flatMap { case (g, vs) => vs.map(g -> _) }
        .toDF("g", "m")
      val got = Boundaries.quantileValuesGrouped(df, Seq("g"), "m", 4)
        .select("g", "i", "bv").as[(String, Int, Long)].collect().toSet
      val want = (for {
        (g, vs) <- data.toSeq
        sorted = vs.sorted
        i <- 1 to 3
        rk = i.toLong * vs.length / 4 if rk >= 1
      } yield (g, i, sorted((rk - 1).toInt))).toSet
      assert(got == want, s"got=$got want=$want")
      CachePool.releaseAll()
    }
  }

  test("taggedQuantileArrays == one quantileArray per tag") {
    forSeeds(8) { seed =>
      val rnd = new scala.util.Random(seed)
      val parts = (0 until 2 + rnd.nextInt(3)).map { t =>
        val n = 1 + rnd.nextInt(150)
        (s"tag$t", List.fill(n)(rnd.nextInt(30).toLong).toDF("m"), s"arr$t")
      }
      val batched = Boundaries.taggedQuantileArrays(parts, "m", 5)
      for ((tag, df, out) <- parts) {
        val got = batched(tag).select(out).as[Seq[Long]].collect().head
        val want = Boundaries.quantileArray(df, "m", 5, out)
          .select(out).as[Seq[Long]].collect().head
        assert(got == want, s"tag=$tag got=$got want=$want")
      }
      CachePool.releaseAll()
    }
  }

  test("weightedQuantileValuesGrouped == brute sorted-scan model on random inputs") {
    forSeeds(8) { seed =>
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(4)
      val groups = (0 until 1 + rnd.nextInt(4)).map(g => s"w$g")
      // raw (value, weight) rows, NOT pre-histogrammed — the helper must
      // collapse duplicates itself; weights ≥ 1 on a coarse value grid
      // so rank collisions and shared boundaries both occur
      val data = groups.map(g => g -> List.fill(3 + rnd.nextInt(100))(
        (rnd.nextInt(20).toLong, 1L + rnd.nextInt(9)))).toMap
      val df = data.toList.flatMap { case (g, vw) =>
        vw.map { case (v, w) => (g, v, w) } }.toDF("g", "m", "w")
      val got = Boundaries
        .weightedQuantileValuesGrouped(df, Seq("g"), "m", "w", k)
        .select("g", "i", "bv").as[(String, Int, Long)].collect().toSet
      // brute model: per group, walk the sorted value histogram and take
      // the first value whose k·cum ≥ i·W, per quantile index i
      val want = (for {
        (g, vw) <- data.toSeq
        hist = vw.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .toSeq.sortBy(_._1)
        total = hist.map(_._2).sum
        i <- 1 until k
      } yield {
        var cum = 0L
        val bv = hist.collectFirst {
          case (v, w) if { cum += w; cum * k >= i.toLong * total } => v
        }.get
        (g, i, bv)
      }).toSet
      assert(got == want, s"k=$k got=$got want=$want")
      CachePool.releaseAll()
    }
  }

  test("weightedQuantileValuesGrouped at k=2 is the 2·cum ≥ total weighted median") {
    // the agg_weighted_median contract: weight 1+2+3+4 = 10, half = 5,
    // cum reaches 5 exactly at value 30 (1+2+3=6 ≥ 5 ⟹ min v = 30)
    val df = Seq(("f", 10L, 1L), ("f", 20L, 2L), ("f", 30L, 3L),
      ("f", 40L, 4L)).toDF("g", "m", "w")
    val got = Boundaries.weightedQuantileValuesGrouped(df, Seq("g"), "m", "w", 2)
      .select("g", "i", "bv").as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("f", 1, 30L)))
    CachePool.releaseAll()
  }

  test("taggedQuantileArraysRow == one quantileArray per tag (r18 fused row)") {
    // the 1-row all-arrays form must carry, per tag, exactly the array
    // the per-tag Map form (and therefore quantileArray) produces —
    // collect_list over the when()-NULLed shared qv relation skips the
    // other tags' rows and sorts identically
    forSeeds(8) { seed =>
      val rnd = new scala.util.Random(seed)
      val parts = (0 until 2 + rnd.nextInt(3)).map { t =>
        val n = 1 + rnd.nextInt(150)
        (s"tag$t", List.fill(n)(rnd.nextInt(30).toLong).toDF("m"), s"arr$t")
      }
      val row = Boundaries.taggedQuantileArraysRow(parts, "m", 5)
      for ((tag, df, out) <- parts) {
        val got = row.select(out).as[Seq[Long]].collect().head
        val want = Boundaries.quantileArray(df, "m", 5, out)
          .select(out).as[Seq[Long]].collect().head
        assert(got == want, s"tag=$tag got=$got want=$want")
      }
      CachePool.releaseAll()
    }
  }

  test("taggedQuantileArraysRow rejects duplicate output names") {
    val df = (1 to 10).map(_.toLong).toDF("m")
    val e = intercept[IllegalArgumentException] {
      Boundaries.taggedQuantileArraysRow(
        Seq(("t1", df, "a"), ("t2", df, "a")), "m", 5)
    }
    assert(e.getMessage.contains("output names must be distinct"))
  }

  test("taggedQuantileArrays rejects duplicate tags") {
    // duplicate tags would merge rows into one shared histogram while
    // the result map silently keeps only the last entry (r12 advice)
    val df = (1 to 10).map(_.toLong).toDF("m")
    val e = intercept[IllegalArgumentException] {
      Boundaries.taggedQuantileArrays(
        Seq(("t", df, "a"), ("t", df, "b")), "m", 5)
    }
    assert(e.getMessage.contains("tags must be distinct"))
  }

  test("quantileValuesGrouped keeps a NULL-valued group (null-safe rank join)") {
    // r12 advice: the rank-extraction join used null-unsafe equality, so
    // a NULL group's boundaries silently vanished from the output
    val df = (List.fill(8)(Option("g")) ::: List.fill(8)(None))
      .zipWithIndex.map { case (g, i) => (g, (i % 8).toLong) }
      .toDF("g", "m")
    val got = Boundaries.quantileValuesGrouped(df, Seq("g"), "m", 4)
      .select("g", "i", "bv").as[(Option[String], Int, Long)].collect()
    assert(got.count(_._1.isEmpty) == 3,
      s"NULL group must report all 3 quartile boundaries: ${got.toSeq}")
    assert(got.count(_._1.contains("g")) == 3)
    CachePool.releaseAll()
  }

  test("grouped offset keys survive adversarial group values (nulls, empties, separators)") {
    // r12 review: a separator-joined composite key collides (NULL,"x")
    // with ("x",NULL) and "" with NULL because concat_ws drops nulls;
    // the JSON-encoded key must keep every such group's offsets apart
    val rows = Seq(
      (Option("a|b"), Option("c"), 1L, 1L), (Option("a"), Option("b|c"), 1L, 1L),
      (Option(""), Option("x"), 1L, 1L), (None, Option("x"), 1L, 1L),
      (Option("x"), Option(""), 1L, 1L), (Option("x"), None, 1L, 1L),
      (Option("a|b"), Option("c"), 2L, 3L), (None, Option("x"), 5L, 2L))
    val df = rows.toDF("g1", "g2", "v", "c")
    val got = Boundaries.prefixSumGrouped(df, Seq("g1", "g2"), "v", "c", "cum")
      .select("g1", "g2", "v", "cum")
      .as[(Option[String], Option[String], Long, Long)].collect().toSet
    val want = rows.groupBy(r => (r._1, r._2)).flatMap { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._3).map { r => acc += r._4; (r._1, r._2, r._3, acc) }
    }.toSet
    assert(got == want, s"got=$got want=$want")
    CachePool.releaseAll()
  }

  test("grouped plans carry no partitionless window either") {
    val hist = (1 to 90).map(i => (s"g${i % 3}", i.toLong, 1L)).toDF("g", "v", "c")
    noPartitionlessWindow(Boundaries.prefixSumGrouped(hist, Seq("g"), "v", "c", "cum"))
    val vals = (1 to 90).map(i => (s"g${i % 3}", (i % 11).toLong)).toDF("g", "m")
    noPartitionlessWindow(Boundaries.quantileValuesGrouped(vals, Seq("g"), "m", 4))
    CachePool.releaseAll()
  }

  test("empty input: prefixSum yields zero rows, quantileArray an empty array") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "c")
    assert(Boundaries.prefixSum(empty, "v", "c", "cum").count() == 0L)
    val arr = Boundaries.quantileArray(empty.select(col("v").as("m")), "m", 5, "qb")
      .select("qb").as[Seq[Long]].collect().head
    assert(arr.isEmpty)
    CachePool.releaseAll()
  }
}
