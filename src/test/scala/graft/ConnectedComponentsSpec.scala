package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The pointer-jumping shortcut in connectedComponents must cut rounds
  * on high-diameter graphs (chains are the worst case) while producing
  * exactly the labels plain min-propagation produces.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: shortcut halves+ rounds, output identical") {
    val n = 32
    val docs = (0L until n.toLong).toDF("doc_id")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")

    val (plainLabels, plainRounds) =
      Dedup.connectedComponents(docs, chain, shortcut = false)
    val plain = labelsOf(plainLabels)
    val (fastLabels, fastRounds) =
      Dedup.connectedComponents(docs, chain, shortcut = true)
    val fast = labelsOf(fastLabels)
    CachePool.releaseAll()

    // one component: every node labeled with the chain head
    assert(plain === (0L until n.toLong).map(_ -> 0L).toMap)
    assert(fast === plain, "shortcut changed the fixpoint")
    // plain propagation moves the min one hop per round (≈ diameter
    // rounds); pointer jumping doubles reach per round (≈ log₂ diameter)
    assert(plainRounds >= n - 2, s"plain rounds=$plainRounds")
    assert(fastRounds * 2 <= plainRounds,
      s"shortcut did not at least halve rounds: $fastRounds vs $plainRounds")
  }

  test("forest + singletons: components labeled by their min, one round extra max") {
    val docs = (0L to 9L).toDF("doc_id")
    // two components {0,1,2}, {5,6,7,8} and singletons 3,4,9
    val edges = Seq((1L, 2L), (0L, 1L), (6L, 5L), (7L, 8L), (6L, 7L))
      .toDF("src", "dst")
    val (labels, _) = Dedup.connectedComponents(docs, edges)
    val got = labelsOf(labels)
    CachePool.releaseAll()
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 9L))
  }

  test("cluster-size histogram reconciles with the labels and the corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Dedup.queries("dedup_cluster_sizes")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val labels = Dedup.queries("dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(1))
    val want = labels.groupBy(identity).values.map(_.length)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.map(r => (r._1.toInt, r._2.toInt)).toMap === want)
    assert(rows.map(_._3).sum === labels.length.toLong,
      "per-size doc counts must partition the corpus")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, "doc shares sum to 1")
    assert(rows.exists(_._1 > 1), "corpus must contain a real dup family")
    CachePool.releaseAll()
  }
}
