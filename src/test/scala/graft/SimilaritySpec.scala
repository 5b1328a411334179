package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, VectorOps}
import graft.operators.Similarity
import graft.sources.Tables

/** Semantic checks for the SemDeDup family: the clustered pair search
  * against the brute-force ground truth (subset property — clustering
  * may only LOSE pairs, never invent them) and the internal consistency
  * of the per-cluster report.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("PQ error: assignments are truly nearest, MSE matches a brute recompute") {
    val got = Similarity.queries("ann_pq_error")(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val Q = 1073741824.0
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    // centroids exactly as the query builds them: grid-quantized means
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.view.mapValues { vs =>
      Array.tabulate(64) { d =>
        vs.map(v => math.floor(v._3(d) * Q + 0.5).toLong).sum.toDouble / Q /
          vs.size
      }
    }.toMap
    val m = got.size // number of subspaces, from the report itself
    val sub = 64 / m
    for (s <- 0 until m) {
      val (nV, nC, mse) = got(s)
      assert(nV === vecs.length.toLong)
      assert(nC === byLabel.size.toLong)
      var acc = 0L
      for ((_, _, e) <- vecs) {
        // fold in element order to reproduce the query's exact doubles
        val dists = cents.toSeq.map { case (l, c) =>
          var dsum = 0.0
          for (d <- s * sub until (s + 1) * sub) {
            val dd = e(d) - c(d); dsum += dd * dd
          }
          (dsum, l)
        }
        val best = dists.min._1
        // every candidate distance must be >= the chosen one
        assert(dists.forall(_._1 >= best))
        acc += math.floor(best * Q + 0.5).toLong
      }
      assert(math.abs(mse - acc.toDouble / Q / vecs.length) < 1e-12,
        s"subspace $s mse")
    }
    // PQ at 4 bytes/vec must cost more error than int8's 64 bytes/vec
    assert(got.values.forall(_._3 > 0.0))
  }

  private def brutePairs = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))
    val a = e.select(col("vec_id").as("va"), col("e").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("e").as("eb"))
    a.join(b, col("va") < col("vb"))
      .filter(GraftFunctions.cosineSim(col("ea"), col("eb")) >= 0.45)
      .select("va", "vb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("ann_semdedup report is internally consistent and matches the recall query") {
    val report = Similarity.queries("ann_semdedup")(spark, sfDir).collect()
    assert(report.nonEmpty)
    val nVectors = report.map(_.getLong(1)).sum
    assert(nVectors === Tables.embeddings(spark, sfDir).count(),
      "primary assignment must partition the corpus (each vector once)")
    for (r <- report) {
      assert(r.getLong(3) <= r.getLong(1), "dropped ≤ cluster size")
      assert(r.getLong(4) === r.getLong(1) - r.getLong(3), "kept = size − dropped")
    }
    val recall = Similarity.queries("ann_semdedup_recall")(spark, sfDir)
      .collect().head
    val (nTrue, nCaptured) = (recall.getLong(0), recall.getLong(1))
    // captured ⊆ true: the blocked search can only LOSE pairs
    assert(nCaptured <= nTrue)
    assert(nTrue === brutePairs.size)
    // the distinct-pair count in the report reconciles with the recall row
    assert(report.map(_.getLong(2)).sum === nCaptured,
      "per-cluster pair counts must sum to the distinct captured pairs")
    // multi-probe is the recall lever — at this SF it measures 1.0;
    // assert the design floor rather than the exact value so a corpus
    // regeneration cannot break the test without a real recall loss
    assert(nCaptured.toDouble / nTrue >= 0.8, s"recall $nCaptured/$nTrue")
  }

  test("centroid drift: cohorts partition each label, drift matches a brute-force recomputation") {
    val sfDir = "/root/testdata/sf0.001"
    val drift = Similarity.queries("ann_centroid_drift")(spark, sfDir)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(drift.nonEmpty)
    val perLabel = Tables.embeddings(spark, sfDir)
      .groupBy("label").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("n")).toMap
    drift.foreach { case (l, r) =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === perLabel(l))
      assert(r.getAs[Double]("drift_l2") >= 0.0)
    }
    // brute-force one label end to end on the same 2^30 grid
    val l0 = drift.keys.min
    val rows = Tables.embeddings(spark, sfDir)
      .filter(col("label") === l0)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1)))
    val Q = 1073741824.0
    def centroid(vs: Seq[Seq[Double]]): Seq[Double] =
      vs.transpose.map(c =>
        c.map(v => math.floor(v * Q + 0.5)).sum / Q / c.length)
    val (ea, eb) = rows.partition(_._1 % 2 == 0)
    val (ca, cb) = (centroid(ea.map(_._2).toSeq), centroid(eb.map(_._2).toSeq))
    val want = math.sqrt(ca.zip(cb)
      .map { case (x, y) => math.floor((x - y) * (x - y) * Q + 0.5) }
      .sum / Q)
    assert(math.abs(drift(l0).getAs[Double]("drift_l2") - want) < 1e-12,
      s"label $l0 drift")
  }

  test("graph tier: topk is well-formed, recall bounded, beam curve monotone") {
    // the search result is the standard top-k shape over CORPUS vectors
    val topk = Similarity.queries("ann_graph_topk")(spark, sfDir).collect()
    val byQ = topk.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to 5),
        s"q=$q ranks")
      // ranks ordered by descending cosine (vec_id tiebreak)
      val ordered = rows.sortBy(_.getAs[Int]("rn"))
        .map(r => (r.getAs[Double]("cosine"), r.getAs[Long]("vec_id")))
      assert(ordered.sliding(2).forall {
        case Array((c1, v1), (c2, v2)) => c1 > c2 || (c1 == c2 && v1 < v2)
        case _ => true
      }, s"q=$q ordering")
      assert(rows.forall(_.getAs[Long]("vec_id") >= 10), s"q=$q corpus-only")
    }
    // recall per query is a hit fraction over the exact top-5
    val rec = Similarity.queries("ann_graph_recall")(spark, sfDir).collect()
    assert(rec.length === 10)
    assert(rec.forall { r =>
      val v = r.getAs[Double]("recall"); v >= 0.0 && v <= 1.0 })
    // the operating-point curve: widening the beam may only score MORE
    // candidates and find at-least-as-many of the true neighbors (the
    // visited set at beam b is a superset of... NOT guaranteed in
    // general graph search, but holds measured on this corpus — a
    // regression here means the frontier discipline broke)
    val curve = Similarity.queries("ann_graph_beam_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("beam_width"))
    assert(curve.map(_.getAs[Int]("beam_width")).toSeq === Seq(2, 4, 8, 16))
    val cands = curve.map(_.getAs[Long]("candidates_scored"))
    assert(cands.sliding(2).forall { case Array(a, b) => a < b; case _ => true },
      s"candidates must grow with beam: ${cands.toSeq}")
    val recalls = curve.map(_.getAs[Double]("recall"))
    assert(recalls.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      s"recall regressed along the beam curve: ${recalls.toSeq}")
    assert(recalls.last >= 0.9,
      s"beam-16 recall collapsed at sf0.001: ${recalls.last} " +
        "(measured 1.0 at r13 HEAD)")
    CachePool.releaseAll()
  }
}
