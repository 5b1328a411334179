package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.sources.Tables

/** Semantic checks for the curation operators beyond the DuckDB oracle:
  * the cap rule's invariants against an independent computation.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("split leakage: exactly the eval docs sharing a train fingerprint, recomputed independently") {
    val got = Curation.queries("text_split_leakage")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set("val", "test"))
    // independent recompute from raw text + the split formula
    val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 4)
    val docs = Tables.documents(spark, sfDir).select(
      md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))).as("fp"),
      when(h < "e666", "train").when(h < "f333", "val").otherwise("test").as("sp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val trainFps = docs.collect { case (fp, "train") => fp }.toSet
    for (s <- Seq("val", "test")) {
      val mine = docs.filter(_._2 == s)
      val leaked = mine.count(d => trainFps.contains(d._1))
      assert(got(s)._1 === mine.length.toLong, s"$s n_docs")
      assert(got(s)._2 === leaked.toLong, s"$s n_leaked")
      assert(math.abs(got(s)._3 - leaked.toDouble / mine.length) < 1e-15)
    }
    // the screen must be non-vacuous on this corpus: some leakage exists
    assert(got.values.exists(_._2 > 0), "expected nonzero leakage to screen")
  }

  test("text_domain_cap: every source keeps exactly min(n_docs, cap), kept set is hash-determined") {
    val rows = Curation.queries("text_domain_cap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totals = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === totals.keySet,
      "every source must appear in the cap report")
    for (r <- rows) {
      val (src, nDocs, nKept, nDropped) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDocs === totals(src))
      assert(nKept === math.min(nDocs, 15L), s"source $src cap rule")
      assert(nDropped === nDocs - nKept)
      assert(r.getLong(5) <= r.getLong(4), s"source $src kept_chars > total_chars")
    }
    // Determinism: the kept set is a pure function of doc_id, so a
    // second evaluation (fresh plan) must produce byte-identical rows.
    val again = Curation.queries("text_domain_cap")(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("dedup savings: redundant strictly less than total, shares in [0,1), global docs conserved") {
    val sv = Curation.queries("text_dedup_savings")(spark, sfDir).persist()
    assert(sv.filter(col("redundant_chars") > col("total_chars")).count() === 0)
    assert(sv.filter(col("n_redundant") > col("n_docs")).count() === 0)
    assert(sv.filter(col("savings_share") < 0.0 || col("savings_share") > 1.0)
      .count() === 0)
    val docs = Tables.documents(spark, sfDir)
    assert(sv.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    assert(sv.agg(sum("total_chars")).collect()(0).getLong(0) ===
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // global redundant docs = docs − distinct fingerprints
    val nFp = docs
      .select(md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))))
      .distinct().count()
    assert(sv.agg(sum("n_redundant")).collect()(0).getLong(0) ===
      docs.count() - nFp)
    sv.unpersist()
  }

  test("cross-source dups: pairs are ordered, shared counts bounded by per-source fingerprints, nonempty at every SF") {
    val dups = Curation.queries("text_cross_source_dups")(spark, sfDir)
      .persist()
    // the prefix-8 key is chosen precisely because it bites at sf0.001
    assert(dups.count() > 0, "the overlap radar must fire on this corpus")
    assert(dups.filter(col("source_a") >= col("source_b")).count() === 0,
      "pairs must be canonically ordered, each counted once")
    // n_shared(a,b) cannot exceed either side's distinct fingerprints
    val perSource = Tables.documents(spark, sfDir)
      .select(md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
        .as("fp"), col("source"))
      .distinct()
      .groupBy("source").agg(count(lit(1)).as("n_fp"))
    val aBad = dups
      .join(perSource.withColumnRenamed("source", "source_a"), "source_a")
      .filter(col("n_shared") > col("n_fp")).count()
    val bBad = dups
      .join(perSource.withColumnRenamed("source", "source_b"), "source_b")
      .filter(col("n_shared") > col("n_fp")).count()
    assert(aBad === 0 && bBad === 0)
    dups.unpersist()
  }
}
