package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-join reformulation: `fact.v BETWEEN band.lo AND band.hi` as an
  * EQUI-join on overlap buckets + residual predicate.
  *
  * A range predicate alone forces a nested-loop join — fine when one
  * side is 4 rows (join_range broadcasts it), catastrophic when both
  * sides are large: every fact row probes every band. Bucketizing is
  * the classic fix: cut the value domain into fixed-width buckets, tag
  * each fact row with its bucket, explode each band to every bucket it
  * overlaps, and equi-join on the bucket id — hash-partitionable at any
  * scale, with the exact range check kept as a residual filter.
  * Cost: O(|fact| + Σ band-widths/width) join input instead of
  * |fact|·|bands| comparisons. Width tunes duplication vs selectivity.
  *
  * Composition of built-ins (SURVEY §7.4 preference (a)) — no custom
  * physical operator needed, and Catalyst/AQE keep optimizing the plan.
  */
object RangeJoin {

  /** @param v     fact column joined into [lo, hi) bands
    * @param width bucket width in value units (same scale as v/lo/hi)
    */
  def banded(fact: DataFrame, bands: DataFrame, v: String,
      lo: String, hi: String, width: Double): DataFrame = {
    val fb = fact.withColumn("__bucket",
      floor(col(v) / width).cast("long"))
    val bb = bands.withColumn("__bucket",
      explode(sequence(floor(col(lo) / width).cast("long"),
        floor(col(hi) / width).cast("long"))))
    fb.join(bb, "__bucket")
      .filter(col(v) >= col(lo) && col(v) < col(hi))
      .drop("__bucket")
  }
}
