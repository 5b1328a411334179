package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the pigeonhole claim behind `dedup_simhash_banded`: with a
  * 64-bit fingerprint cut into 4×16-bit segments and HAMMING ≤ 3, any
  * qualifying pair agrees on ≥ 1 whole segment, so the segment
  * equi-join must surface EXACTLY the pair set the all-pairs scan
  * finds — no more (both verify exact hamming), no fewer (pigeonhole).
  * The oracle checks each query against DuckDB independently; this spec
  * checks them against EACH OTHER, so a banding refactor that silently
  * drops pairs fails here even before the oracle runs.
  */
class SimhashSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"banded segment join == all-pairs hamming scan at $sf") {
      val dir = s"/root/testdata/$sf"
      val pairs = operators.Dedup.queries("dedup_simhash_pairs")(spark, dir)
      val banded = operators.Dedup.queries("dedup_simhash_banded")(spark, dir)
      assert(banded.except(pairs).count() === 0,
        "banded surfaced a pair the exhaustive scan does not contain")
      assert(pairs.except(banded).count() === 0,
        "banded MISSED a pair — pigeonhole guarantee broken")
    }
  }

  test("exact duplicate docs collide at hamming 0 (pairs nonempty at sf0.01)") {
    // the corpus contains exact duplicates (dedup_exact finds
    // n_copies > 1), and identical text ⇒ identical fingerprint —
    // so the near-dup query must return rows, not a trivially-empty set
    val banded = operators.Dedup.queries("dedup_simhash_banded")(
      spark, "/root/testdata/sf0.01")
    assert(banded.count() > 0)
  }
}
