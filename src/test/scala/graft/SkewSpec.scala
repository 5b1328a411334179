package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical proof of the join_salted pattern: a 100%-hot key occupies
  * ONE shuffle partition unsalted (the straggler that kills a 1000-
  * executor job) and SALT-many partitions salted. join_salted's oracle
  * already proves result preservation; this proves the balance.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("salting spreads a hot join key across shuffle partitions") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a real shuffle join: AQE has its OWN broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // test data is tiny: AQE would merge the salted partitions right
    // back (at real scale they exceed the advisory size and stay apart)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val SALT = 8
      // every fact row has the same key: worst-case skew. The key must
      // be DATA-DEPENDENT (pmod(id,1)+1 ≡ 1) — a literal key would be
      // constant-folded into the dim filter and the join would plan as
      // a cartesian with a 1-row side, dodging the shuffle entirely
      val hot = spark.range(20000)
        .select((pmod(col("id"), lit(1L)) + 1L).as("k"), col("id").as("v"))
      val dim = spark.range(5).select(col("id").as("k"), (col("id") * 10).as("d"))

      def partitionsUsed(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(spark_partition_id()).count().count()

      val unsalted = hot.join(dim, Seq("k"))
      assert(partitionsUsed(unsalted) === 1L,
        "unsalted: the hot key must collapse into a single partition (the straggler)")

      val saltedDim = dim.withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
      val saltedFact = hot.withColumn("salt", pmod(col("v"), lit(SALT)).cast("int"))
      val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      val used = partitionsUsed(salted)
      assert(used > 1L, s"salted: hot key must spread, used=$used")
      assert(salted.count() === unsalted.count(), "salting must not change rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("join_bloom_prune: no false negatives, counts reconcile exactly") {
    import graft.sources.Tables
    val sfDir = "/root/testdata/sf0.001"
    val row = graft.operators.RelationalExt2.queries("join_bloom_prune")(
      spark, sfDir).collect().head
    val (nProbe, nPass, nTrue, nFalse) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // Ground truth membership, computed with a plain exact semi-join.
    val build = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    val probe = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k")).distinct()
    val exactMembers = probe.join(build, Seq("k"), "left_semi").count()
    assert(nProbe === probe.count())
    // A Bloom filter NEVER loses a member: every true member passes.
    assert(nTrue === exactMembers,
      s"false negative: $nTrue passed members vs $exactMembers true members")
    assert(nFalse === nPass - nTrue)
    assert(nPass >= nTrue)
    assert(nPass <= nProbe)
  }

  test("join_size_estimate: exact size matches brute force, sketch estimate brackets it") {
    import graft.sources.Tables
    val sfDir = "/root/testdata/sf0.001"
    val row = graft.operators.RelationalExt2.queries("join_size_estimate")(
      spark, sfDir).collect().head
    val (nL, nR, exact, est) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // brute force: count the actual join output
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clicks = ev.filter(_._2 == "click").map(_._1)
    val buys = ev.filter(_._2 == "purchase").map(_._1)
    val buyCount = buys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val trueSize = clicks.map(k => buyCount.getOrElse(k, 0L)).sum
    assert(nL === clicks.length.toLong)
    assert(nR === buys.length.toLong)
    assert(exact === trueSize, "exact_size must equal the real join cardinality")
    assert(est >= exact, "CMS inner product can only over-count")
    assert(row.getBoolean(4) && row.getBoolean(5), "both verdicts must hold")
    assert(trueSize > 0, "slice must be non-vacuous")
  }
}
