package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Semantic checks for the weighted-similarity and graph-partition
  * operators over the document corpus — brute-force recomputation on
  * the small SF, never the implementation's own plan.
  */
class TextPairsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("minhash calibration: counts partition the candidate set, estimator is monotone and bounded") {
    val rows = operators.Dedup.queries("dedup_minhash_error")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // the candidate universe is exactly dedup_minhash_lsh's pre-verify
    // set; that query post-filters at JACCARD_NEAR, so its row count
    // must be <= the calibration's total pairs
    val verified = operators.Dedup.queries("dedup_minhash_lsh")(spark, sfDir).count()
    assert(rows.map(_._2).sum >= verified)
    for ((nMatch, nPairs, est, meanJ, mae) <- rows) {
      assert(nMatch >= 0 && nMatch <= 8)
      assert(nPairs > 0)
      assert(math.abs(est - nMatch / 8.0) < 1e-15)
      assert(meanJ >= 0.0 && meanJ <= 1.0)
      // MAE is consistent with the bucket's own mean in the unmixed
      // buckets we can bound: it can never exceed max(est, 1-est)
      assert(mae <= math.max(est, 1.0 - est) + 1e-12)
    }
    // calibration must be monotone in the estimate on this corpus:
    // higher signature agreement => higher measured jaccard
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, _, _, j1, _), (_, _, _, j2, _)) => assert(j1 <= j2)
      case _ => ()
    }
    // non-vacuous: both a false-positive band bucket (low jaccard) and
    // a true near-dup bucket must exist
    assert(sorted.head._4 < 0.2 && sorted.last._4 > 0.9)
  }

  test("tfidf cosine pairs: Cauchy-Schwarz bound holds, top pair verified by brute force") {
    val top = operators.TextAnalysis
      .queries("text_tfidf_cosine_pairs")(spark, sfDir).collect()
    assert(top.nonEmpty && top.length <= 20)
    assert(top.forall(r => r.getAs[Double]("cosine") > 0.0 &&
      r.getAs[Double]("cosine") <= 1.0 + 1e-12))
    // descending order with deterministic tie-break
    top.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("cosine") >= b.getAs[Double]("cosine"))
    }
    // brute-force the #1 pair's dot product from raw tokens
    val r = top.head
    val (da, db) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50)
    val w = tf.join(df, "t")
      .select(col("doc_id"), col("t"), (col("tf") * (lit(n) / col("df")).cast("long")).as("w"))
    val wa = w.filter(col("doc_id") === da).collect()
      .map(x => x.getAs[String]("t") -> x.getAs[Long]("w")).toMap
    val wb = w.filter(col("doc_id") === db).collect()
      .map(x => x.getAs[String]("t") -> x.getAs[Long]("w")).toMap
    val dot = wa.keysIterator.map(k => wa(k) * wb.getOrElse(k, 0L)).sum
    // dot accumulates in decimal(38,0) (long Σw² wraps ~10⁸ docs) but
    // SHIPS as bigint — the top-20 dot values are provably inside long
    // and DECIMAL(p>18) output columns are driver-hash-fragile
    // (OutputTypeSpec).
    assert(r.getAs[Long]("dot") === dot, s"pair ($da,$db) dot")
  }

  test("keyword search: scores rank correctly and the top hit survives a brute recount") {
    val top = operators.TextAnalysis
      .queries("search_keyword_topk")(spark, sfDir).collect()
    assert(top.length === 10)
    top.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("score"), b.getAs[Long]("score"))
      assert(sa > sb || (sa == sb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    assert(top.forall(r => r.getAs[Long]("n_terms_hit") >= 1 &&
      r.getAs[Long]("n_terms_hit") <= 3))
    // recount the champion's score from raw text
    val champ = top.head.getAs[Long]("doc_id")
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === champ).collect()(0).getAs[String]("text")
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val score = Seq("dup", "spark", "table").map { t =>
      val tfC = text.split(" ").count(_ == t).toLong
      if (tfC == 0) 0L
      else {
        val dfC = docs
          .filter(array_contains(split(col("text"), " "), t)).count()
        tfC * (n / dfC)
      }
    }.sum
    assert(top.head.getAs[Long]("score") === score)
  }

  test("phrase search: matches bounded by docs, occurrences bounded below by matches") {
    val pm = operators.TextAnalysis
      .queries("search_phrase_match")(spark, sfDir).persist()
    assert(pm.filter(col("n_match") > col("n_docs")).count() === 0)
    assert(pm.filter(col("n_occurrences") < col("n_match")).count() === 0)
    assert(pm.agg(sum("n_match")).collect()(0).getLong(0) > 0,
      "the phrase must occur at every SF")
    pm.unpersist()
  }

  test("length bias: correlation valid and within tolerance of the builtin corr on the same grid") {
    import graft.operators.TextAnalysis
    val lb = TextAnalysis.queries("text_quality_length_bias")(spark, sfDir)
      .collect()
    assert(lb.nonEmpty)
    lb.foreach { r =>
      val c = r.getAs[java.lang.Double]("corr_len_quality")
      if (c != null)
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"${r.getString(0)}: $c")
    }
    // independent check on one source via the builtin corr over the
    // identical quantized pairs
    val src = lb.head.getAs[String]("source")
    // the score formula restated from its spec, not imported
    val toks = split(col("text"), " ")
    val score =
      least(lit(1.0), size(toks).cast("double") / 50.0) *
        (lit(0.5) + lit(0.5) *
          (size(array_distinct(toks)).cast("double") / size(toks))) -
        lit(0.1) * (size(filter(toks,
          t => t.isin("a", "the", "of", "and"))).cast("double") / size(toks))
    val want = Tables.documents(spark, sfDir)
      .filter(col("source") === src)
      .select(col("n_chars").cast("double").as("x"),
        floor(score * 1073741824.0 + 0.5).cast("double").as("y"))
      .agg(corr(col("x"), col("y"))).collect()(0).getDouble(0)
    val got = lb.find(_.getAs[String]("source") == src).get
      .getAs[Double]("corr_len_quality")
    assert(math.abs(got - want) < 1e-9, s"$src: power-sum $got vs builtin $want")
  }

  test("source modularity: contributions sum to a valid Q, degree identity 2m holds") {
    val q = operators.Curation
      .queries("text_source_modularity")(spark, sfDir).collect()
    assert(q.nonEmpty)
    val m = q.head.getAs[Long]("m_edges")
    assert(q.forall(_.getAs[Long]("m_edges") === m), "m is global")
    assert(m > 0, "the prefix-8 groups must produce overlap edges")
    // handshake: sum of community degree sums is exactly 2m
    assert(q.map(_.getAs[Long]("deg_sum")).sum === 2 * m)
    // internal edges can't exceed the total
    assert(q.map(_.getAs[Long]("in_edges")).sum <= m)
    val Q = q.map(_.getAs[Double]("q_contrib")).sum
    assert(Q >= -1.0 && Q <= 1.0, s"modularity $Q out of range")
    // brute force: enumerate the clique edges and recompute Q directly
    val fps = Tables.documents(spark, sfDir)
      .select(md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
        .as("fp"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = fps.groupBy(_._1).values.flatMap { g =>
      for (i <- g.indices; j <- (i + 1) until g.length)
        yield (g(i)._2, g(j)._2)
    }.toSeq
    val mB = bySrc.size.toLong
    val inB = bySrc.groupBy(identity).collect {
      case ((a, b), es) if a == b => (a, es.size.toLong)
    }
    val degB = bySrc.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(mB === m, "brute-force edge count")
    // .toSeq first: mapping over the key SET would dedupe sources whose
    // contributions happen to be numerically equal
    val QB = degB.keys.toSeq.map { s =>
      val in = inB.toMap.getOrElse(s, 0L)
      (4L * mB * in - degB(s) * degB(s)).toDouble / (4L * mB * mB).toDouble
    }.sum
    assert(math.abs(Q - QB) < 1e-9, s"Q $Q vs brute $QB")
  }

  test("bpe merges: the distributed rewrite matches a sequential greedy model") {
    // the semantic spec of BPE's merge step is the OBVIOUS sequential
    // scan (left-to-right, a match consumes both tokens); the query
    // implements it distributively via gaps-and-islands parity. Replay
    // all rounds with the sequential model and demand the identical
    // merge table — pair choice (tie order included), counts, token
    // census, compression.
    val got = operators.TextAnalysis.queries("text_bpe_merges")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("merge_round"))
      .map(r => (r.getAs[Int]("merge_round"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("n_pair"),
        r.getAs[Long]("n_tokens_after"), r.getAs[Double]("compression_ratio")))
    assert(got.map(_._1).toSeq === (1 to got.length))
    var docs: Seq[Array[String]] = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0).split(" ", -1))
    val n0 = docs.map(_.length.toLong).sum
    for ((round, w1, w2, nPair, nAfter, ratio) <- got) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(_.sliding(2).foreach {
        case Array(a, b) =>
          counts.update((a, b), counts.getOrElse((a, b), 0L) + 1L)
        case _ => ()
      })
      val ((mw1, mw2), mn) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      assert((mw1, mw2, mn) === ((w1, w2, nPair)), s"round $round pair")
      docs = docs.map { d =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == w1 && d(i + 1) == w2) {
            out += s"$w1 $w2"; i += 2
          } else { out += d(i); i += 1 }
        }
        out.toArray
      }
      val mAfter = docs.map(_.length.toLong).sum
      assert(mAfter === nAfter, s"round $round token census")
      assert(math.abs(ratio - mAfter.toDouble / n0.toDouble) < 1e-15,
        s"round $round compression")
    }
    CachePool.releaseAll()
  }

  test("repetition n-gram screen matches a brute per-doc recompute") {
    // the flag definitions are simple enough to state twice: recompute
    // every doc's top-bigram occupancy and duplicate-trigram fraction
    // from the collected texts, apply the same thresholds, and demand
    // the identical per-source census (flags AND the quantized mean)
    val Q = 1073741824.0
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 4)
    case class Acc(var n: Long = 0, var bi: Long = 0, var tri: Long = 0,
                   var either: Long = 0, var dtSum: Long = 0)
    val bySrc = scala.collection.mutable.Map[String, Acc]()
    for ((src, t) <- docs) {
      val bigrams = t.sliding(2).map(_.mkString("|")).toSeq
      val trigrams = t.sliding(3).map(_.mkString("|")).toSeq
      val tb = bigrams.groupBy(identity).values.map(_.size).max.toDouble /
        bigrams.size
      val dt = (trigrams.size - trigrams.distinct.size).toDouble /
        trigrams.size
      val a = bySrc.getOrElseUpdate(src, Acc())
      a.n += 1
      if (tb > 0.18) a.bi += 1
      if (dt > 0.30) a.tri += 1
      if (tb > 0.18 || dt > 0.30) a.either += 1
      a.dtSum += math.floor(dt * Q + 0.5).toLong
    }
    val got = operators.TextAnalysis
      .queries("text_repetition_ngrams")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_bigram_flagged"),
          r.getAs[Long]("n_trigram_flagged"), r.getAs[Long]("n_flagged"),
          r.getAs[Double]("mean_dup_trigram")))).toMap
    assert(got.keySet === bySrc.keySet.toSet)
    for ((src, a) <- bySrc) {
      val (n, bi, tri, either, mean) = got(src)
      assert((n, bi, tri, either) === ((a.n, a.bi, a.tri, a.either)),
        s"source $src census")
      assert(mean === a.dtSum.toDouble / (a.n.toDouble * Q),
        s"source $src mean")
    }
    CachePool.releaseAll()
  }

  test("bpe rewrite property: random runs over a 2-token alphabet match the sequential model") {
    // adversarial inputs for the gaps-and-islands parity rewrite: long
    // single-token runs make EVERY match overlap its neighbor (w1 = w2,
    // "a a a a" → "a a"+"a a", never three) — the case the corpus replay
    // barely exercises. Deterministic seed; 60 docs of random a/b runs.
    val rnd = new scala.util.Random(7)
    val docs = (0 until 60).map { i =>
      val toks = Seq.fill(2 + rnd.nextInt(14))(
        if (rnd.nextBoolean()) "a" else "b")
      (i.toLong, toks.mkString(" "))
    }
    import spark.implicits._
    val got = operators.TextAnalysis
      .bpeTrain(spark, docs.toDF("doc_id", "text"))
    assert(got.nonEmpty)
    var model: Seq[Array[String]] = docs.map(_._2.split(" ", -1))
    val n0 = model.map(_.length.toLong).sum
    for ((round, w1, w2, nPair, nAfter, ratio) <- got) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      model.foreach(_.sliding(2).foreach {
        case Array(a, b) =>
          counts.update((a, b), counts.getOrElse((a, b), 0L) + 1L)
        case _ => ()
      })
      val ((mw1, mw2), mn) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      assert((mw1, mw2, mn) === ((w1, w2, nPair)), s"round $round pair")
      model = model.map { d =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == w1 && d(i + 1) == w2) {
            out += s"$w1 $w2"; i += 2
          } else { out += d(i); i += 1 }
        }
        out.toArray
      }
      assert(model.map(_.length.toLong).sum === nAfter,
        s"round $round census (overlap parity)")
      assert(math.abs(ratio -
        model.map(_.length.toLong).sum.toDouble / n0.toDouble) < 1e-15)
    }
    CachePool.releaseAll()
  }

  test("bpe pair-delta trainer: bit-identical merge table to the full recount at two SFs + adversarial runs") {
    // the r14 verdict #3 contract: delta-maintained counts must produce
    // EXACTLY the recount trainer's merge table — same winners, same
    // pair counts, same census, same ratios — on two real corpus sizes
    // and on the adversarial single-token-run streams where every match
    // overlaps its neighbor (consecutive kept islands are the hardest
    // delta case: removed and added adjacencies share endpoints).
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val recount = operators.TextAnalysis.bpeTrain(spark, docs)
      val delta = operators.TextAnalysis.bpeTrainDelta(spark, docs)
      assert(delta === recount, s"merge tables diverged at $dir")
      CachePool.releaseAll()
    }
    val rnd = new scala.util.Random(13)
    val runs = (0 until 60).map { i =>
      val toks = Seq.fill(2 + rnd.nextInt(14))(
        if (rnd.nextBoolean()) "a" else "b")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    assert(operators.TextAnalysis.bpeTrainDelta(spark, runs) ===
      operators.TextAnalysis.bpeTrain(spark, runs),
      "merge tables diverged on adversarial single-token runs")
    CachePool.releaseAll()
  }

  test("bpe delta trainer: per-round delta volume is measured, bounded, and a small fraction of a recount") {
    // the r15 verdict #6 directive: the ~0.7%-of-a-full-pass efficiency
    // claim lived in a comment — here it is counted per round. For each
    // round 1..N-1 (the delta sets that feed the NEXT round's pick):
    // delta_rows = the removed+added aggregation inputs; full_rows =
    // the adjacency rows a recount would aggregate that round. Asserts
    // the structural bound (every removed/added adjacency touches a
    // merged island, and a kept island perturbs at most 5 adjacencies:
    // its 2 old pairs + the consumed position's 2 + the merged token's
    // new left/right, double-counted safe) and the efficiency fraction
    // the claim quotes, with headroom for corpus shape.
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val metrics = scala.collection.mutable.Buffer.empty[(Int, Long, Long)]
      val merges = operators.TextAnalysis
        .bpeTrainDelta(spark, docs, Some(metrics))
      assert(metrics.nonEmpty, s"no delta rounds measured at $dir")
      // merges(r) = (round, w1, w2, nPair, nAfter, ratio); metrics row
      // for round r was produced while nPair occurrences merged
      val pairCountByRound = merges.map(m => m._1 -> m._4).toMap
      metrics.foreach { case (r, deltaRows, fullRows) =>
        assert(deltaRows > 0, s"round $r at $dir counted an empty delta")
        assert(deltaRows <= 5L * pairCountByRound(r),
          s"round $r at $dir: delta $deltaRows exceeds the 5x-merged bound")
        assert(deltaRows.toDouble / fullRows.toDouble < 0.10,
          s"round $r at $dir: delta $deltaRows/$fullRows is not a small " +
            "fraction of a recount")
      }
      CachePool.releaseAll()
    }
  }

  test("mixture weights: exact brute recompute, shares normalize, temperature flattens") {
    val per = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> (rs.length.toLong,
          rs.map(_.getString(1).split(" ", -1).length.toLong).sum)
      }
    val tTot = per.values.map(_._2).sum
    val sumSqrt = per.toSeq.sortBy(_._1)
      .map(t => math.sqrt(t._2._2.toDouble)).reduceLeft(_ + _)
    val got = operators.TextAnalysis
      .queries("text_mixture_weights")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet === per.keySet.toSet)
    for ((src, (nd, nt)) <- per) {
      val r = got(src)
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")) === ((nd, nt)))
      assert(r.getAs[Double]("nat_share") === nt.toDouble / tTot.toDouble)
      assert(r.getAs[Double]("temp_share") === math.sqrt(nt.toDouble) / sumSqrt)
      // temperature flattening: a below-pivot source is UPSAMPLED
      val upsampled = r.getAs[Double]("effective_epochs") > 1.0
      val pivot = tTot.toDouble / sumSqrt
      assert(upsampled === (math.sqrt(nt.toDouble) < pivot),
        s"$src: upsampling must flip exactly at the sqrt pivot")
    }
    val sumNat = got.values.map(_.getAs[Double]("nat_share")).sum
    val sumTemp = got.values.map(_.getAs[Double]("temp_share")).sum
    assert(math.abs(sumNat - 1.0) < 1e-12 && math.abs(sumTemp - 1.0) < 1e-12)
    CachePool.releaseAll()
  }

  test("bpe heldout: apply pass replays the sequential model on text the trainer never saw") {
    // train with the sequential greedy model on the train split, apply
    // its merges in order to the held-out split, and demand the query's
    // per-round pair choice, held-out census, and both compression
    // ratios — the no-peeking property: the pair must come from TRAIN
    // counts alone.
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$id".getBytes("UTF-8"))
      md.take(2).map("%02x".format(_)).mkString // first 4 hex chars
    }
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    var train = all.filter(t => splitOf(t._1) < "e666").map(_._2).toSeq
    var held = all.filter(t => splitOf(t._1) >= "e666").map(_._2).toSeq
    assert(train.nonEmpty && held.nonEmpty, "both splits must be populated")
    val tn0 = train.map(_.length.toLong).sum
    val hn0 = held.map(_.length.toLong).sum
    def rewrite(docs: Seq[Array[String]], w1: String, w2: String) =
      docs.map { d =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == w1 && d(i + 1) == w2) {
            out += s"$w1 $w2"; i += 2
          } else { out += d(i); i += 1 }
        }
        out.toArray
      }
    val got = operators.TextAnalysis.queries("text_bpe_heldout")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("merge_round"))
    for (r <- got) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      train.foreach(_.sliding(2).foreach {
        case Array(a, b) =>
          counts.update((a, b), counts.getOrElse((a, b), 0L) + 1L)
        case _ => ()
      })
      val ((w1, w2), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      assert((w1, w2) ===
        ((r.getAs[String]("w1"), r.getAs[String]("w2"))),
        s"round ${r.getAs[Int]("merge_round")}: pair must come from TRAIN counts")
      train = rewrite(train, w1, w2)
      held = rewrite(held, w1, w2)
      assert(held.map(_.length.toLong).sum === r.getAs[Long]("n_tokens_after"),
        s"round ${r.getAs[Int]("merge_round")} held-out census")
      assert(math.abs(r.getAs[Double]("train_compression") -
        train.map(_.length.toLong).sum.toDouble / tn0.toDouble) < 1e-15)
      assert(math.abs(r.getAs[Double]("heldout_compression") -
        held.map(_.length.toLong).sum.toDouble / hn0.toDouble) < 1e-15)
    }
    CachePool.releaseAll()
  }
}
