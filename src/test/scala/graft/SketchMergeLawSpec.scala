package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalExt

/** Merge-law property tests for the mergeable aggregators.
  *
  * The whole 100 TB argument for the theta / KLL / bitmap families is
  * MERGEABILITY: Spark evaluates an Aggregator as reduce-per-partition
  * then merge-in-arbitrary-tree-order, so the result must not depend on
  * where partition boundaries fall or in what order partials meet.
  * These properties drive the aggregators exactly the way Spark does —
  * zero/reduce per random chunk, merge in shuffled order, finish — and
  * compare against the single-pass sequential evaluation:
  *   - theta: the split-merged estimate must be close to single-pass
  *     (same retained-hash set up to rebuild timing) and the 4σ bound
  *     verdict the query asserts must hold for BOTH.
  *   - KLL: compaction is internally randomized, so estimates can
  *     differ bit-wise — but both must honor the rank bracket the query
  *     asserts (k=400 ⇒ sub-1% rank error; ±3% is many-sigma).
  *   - bitmap: the word encoding is EXACT — popcount after OR-merging
  *     per-chunk words must equal the true distinct count, for any
  *     split, including negative ids (the floor shiftright/pmod pair).
  */
class SketchMergeLawSpec extends AnyFunSuite {

  /** Deterministic sample of a Gen (the EnvelopeSpec convention). */
  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, rng.Seed(seed)).get

  /** Split xs into `k` contiguous chunks at random cut points. */
  private def chunks[A](xs: Vector[A], k: Int, seed: Long): Seq[Vector[A]] = {
    val r = new scala.util.Random(seed)
    val cuts = Vector.fill(math.min(k - 1, xs.length))(r.nextInt(xs.length + 1))
      .sorted
    (0L +: cuts.map(_.toLong) :+ xs.length.toLong).sliding(2).map {
      case Seq(a, b) => xs.slice(a.toInt, b.toInt)
    }.toSeq
  }

  test("property: KLL split-merge honors the rank bracket wherever the cuts fall") {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val agg = new RelationalExt.KllAgg
    val genData = for {
      n <- Gen.choose(500, 4000)
      scale <- Gen.choose(1.0, 1000.0)
      xs <- Gen.listOfN(n, Gen.choose(0.0, scale))
    } yield xs.toVector
    (1 to 6).foreach { i =>
      val xs = sample(genData, i * 7919L)
      def estOf(parts: Seq[Vector[Double]]): Double = {
        val merged = new scala.util.Random(i).shuffle(
          parts.map(p => p.foldLeft(agg.zero)(agg.reduce)))
          .reduceLeft(agg.merge)
        KllDoublesSketch.heapify(Memory.wrap(agg.finish(merged)))
          .getQuantile(0.5)
      }
      val single = estOf(Seq(xs))
      val split = estOf(chunks(xs, 1 + i * 2, i * 31L))
      val sorted = xs.sorted
      def rankOf(v: Double): Double =
        sorted.count(_ <= v).toDouble / sorted.length
      Seq("single" -> single, "split" -> split).foreach { case (tag, est) =>
        val r = rankOf(est)
        assert(r >= 0.47 && r <= 0.53,
          s"sample $i $tag: p50 estimate rank $r outside [0.47, 0.53]")
      }
    }
  }

  test("property: theta split-merge estimate equals single-pass and both pass the 4-sigma verdict") {
    import org.apache.datasketches.theta.Sketches
    import org.apache.datasketches.memory.Memory
    val agg = new RelationalExt.ThetaAgg
    val genData = for {
      n <- Gen.choose(500, 6000)
      space <- Gen.choose(300L, 20000L) // beyond k=256 ⇒ estimation mode
      xs <- Gen.listOfN(n, Gen.choose(0L, space))
    } yield xs.toVector
    (1 to 6).foreach { i =>
      val xs = sample(genData, i * 104729L)
      def estOf(parts: Seq[Vector[Long]]): Double = {
        val merged = new scala.util.Random(i).shuffle(
          parts.map(p => p.foldLeft(agg.zero)(agg.reduce)))
          .reduceLeft(agg.merge)
        Sketches.wrapSketch(Memory.wrap(agg.finish(merged))).getEstimate
      }
      val single = estOf(Seq(xs))
      val split = estOf(chunks(xs, 1 + i * 2, i * 17L))
      val exact = xs.distinct.length.toDouble
      // the query's asserted contract: estimate within 4σ ≈ 25% of exact
      Seq("single" -> single, "split" -> split).foreach { case (tag, est) =>
        assert(math.abs(est - exact) <= 0.25 * exact,
          s"sample $i $tag: estimate $est vs exact $exact breaks the 4σ bound")
      }
      // and split placement must not move the estimate materially: the
      // retained-hash set is a function of the input SET up to rebuild
      // timing (one quickselect pivot), far inside one RSE = 1/√k
      assert(math.abs(split - single) <= 0.0625 * math.max(single, 1.0),
        s"sample $i: split $split vs single $single drifted beyond 1 RSE")
    }
  }

  test("property: bitmap OR-merge popcount is exactly the distinct count for any split") {
    val genData = for {
      n <- Gen.choose(200, 3000)
      space <- Gen.choose(100L, 5000L)
      // negatives included: the floor shiftright/pmod pair must hold
      xs <- Gen.listOfN(n, Gen.choose(-space, space))
    } yield xs.toVector
    def words(part: Vector[Long]): Map[Long, Long] =
      part.groupBy(_ >> 6).view.mapValues(_.foldLeft(0L) { (w, id) =>
        w | (1L << (((id % 64) + 64) % 64).toInt)
      }).toMap
    (1 to 8).foreach { i =>
      val xs = sample(genData, i * 6151L)
      val parts = chunks(xs, 1 + i, i * 13L)
      val merged = parts.map(words).foldLeft(Map.empty[Long, Long]) {
        (acc, m) => m.foldLeft(acc) { case (a, (b, w)) =>
          a.updated(b, a.getOrElse(b, 0L) | w)
        }
      }
      val popcount = merged.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum
      assert(popcount === xs.distinct.length.toLong, s"sample $i")
      // and the single-pass encoding agrees word-for-word
      assert(merged === words(xs), s"sample $i: word drift")
    }
  }

  test("property: SpaceSaving fold honors its guarantees on random skewed streams") {
    import graft.streaming.ChangeLogStream.spaceSavingFold
    val cap = 8
    // zipf-ish: small ids much more frequent than large
    val itemGen: Gen[Long] = Gen.frequency(
      (8, Gen.choose(1L, 4L)), (3, Gen.choose(5L, 20L)), (1, Gen.choose(21L, 200L)))
    for (i <- 0 until 40) {
      val xs = sample(Gen.listOfN(400, itemGen), 7100L + i).toVector
      val fin = spaceSavingFold(Map.empty, xs, cap)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(fin.size <= cap, s"sample $i: capacity exceeded")
      // counts are conserved: Σ estimates == stream length (SpaceSaving
      // total-preservation invariant)
      assert(fin.values.map(_.count).sum === xs.length.toLong)
      fin.foreach { case (u, ce) =>
        assert(ce.count >= exact(u), s"sample $i: undercount of $u")
        assert(ce.count - ce.err <= exact(u), s"sample $i: err bound of $u")
      }
      // any item with true count > N/cap must be tracked
      exact.filter(_._2 > xs.length / cap).keys.foreach(u =>
        assert(fin.contains(u), s"sample $i: guaranteed hitter $u missing"))
      // chunked folding equals one pass for any contiguous batching
      val parts = chunks(xs, 1 + i % 5, 7300L + i)
      val chunked = parts.foldLeft(Map.empty[Long, graft.streaming.CountErr]) {
        (st, p) => spaceSavingFold(st, p, cap)
      }
      assert(chunked === fin, s"sample $i: chunking drift")
    }
  }

  test("property: sessionizer fold is split-invariant — any batching yields the same sessions") {
    import graft.streaming.ChangeLogStream.sessionFold
    val gap = 1800L * 1000000L // 30 min in micros
    // random in-order event times with gaps straddling the threshold
    val deltas: Gen[List[Long]] = Gen.listOfN(60, Gen.oneOf(
      Gen.choose(1L, gap),                 // within-session continuation
      Gen.choose(gap + 1, gap * 4)))       // session break
    for (i <- 0 until 40) {
      val ds = sample(deltas, 4242L + i)
      val times = ds.scanLeft(1_700_000_000_000_000L)(_ + _).toVector
      val (refState, refClosed) = sessionFold(None, times, gap)
      // replay the same times through random contiguous batch splits
      val parts = chunks(times, 1 + i % 6, 9000L + i)
      var st: Option[graft.streaming.SessionAcc] = None
      val closed = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.SessionAcc]
      parts.foreach { p =>
        val (next, c) = sessionFold(st, p, gap)
        st = next; closed ++= c
      }
      assert(closed.toSeq === refClosed, s"sample $i: closed-session drift")
      assert(st === refState, s"sample $i: open-state drift")
      // structural invariants: ids dense from 0, counts/bounds consistent
      assert(refClosed.map(_.sessionId) === refClosed.indices.map(_.toLong))
      refClosed.foreach { s =>
        assert(s.minTs <= s.maxTs && s.n >= 1)
      }
      val all = refClosed ++ refState.toSeq
      assert(all.map(_.n).sum === times.length.toLong, s"sample $i: events lost")
      // marker init (the post-timeout numbering state, n = 0): the same
      // fold must (a) open the first session with the marker's id with
      // NO gap check — the timeout already proved the gap — and (b) stay
      // split-invariant, so the streaming comeback path can't drift.
      val markerId = 5L + i % 3
      val marker = Some(graft.streaming.SessionAcc(
        markerId, times.head - 1, times.head - 1, times.head - 1, 0L))
      val (mState, mClosed) = sessionFold(marker, times, gap)
      val mAll = mClosed ++ mState.toSeq
      assert(mAll.map(_.sessionId) ===
        mAll.indices.map(markerId + _.toLong),
        s"sample $i: marker init must renumber from $markerId")
      assert(mAll.map(t => (t.minTs, t.maxTs, t.n)) ===
        all.map(t => (t.minTs, t.maxTs, t.n)),
        s"sample $i: marker init changed session contents")
      var mSt: Option[graft.streaming.SessionAcc] = marker
      val mChunked = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.SessionAcc]
      parts.foreach { p =>
        val (next, c) = sessionFold(mSt, p, gap)
        mSt = next; mChunked ++= c
      }
      assert(mChunked.toSeq === mClosed && mSt === mState,
        s"sample $i: marker-init split-invariance drift")
    }
  }
}
