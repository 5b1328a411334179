package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, written to be
  * bitwise-reproducible against the DuckDB oracle: every element is
  * widened float→double (exact), products/sums fold sequentially in
  * element order starting at 0.0 (IEEE: 0.0 + x == x), so Spark's
  * `aggregate` HOF and DuckDB's `list_reduce` produce identical doubles.
  *
  * The HOF forms stay inside Tungsten codegen'd projections and need no
  * shuffle; at 100 TB a cosine scan is embarrassingly parallel. A custom
  * codegen Expression over primitive arrays is the planned fast path
  * (graft.functions.expressions); these are the semantic reference.
  */
object VectorOps {

  def asDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; inputs are array<float> columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(norm2(ad)) * sqrt(norm2(bd)))
  }

  /** Sign-bit LSH bucket over fixed axis-aligned dims (1-based). An
    * axis-aligned variant of random-hyperplane LSH — portable because
    * both engines just test element signs.
    */
  def signBucket(a: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex.map { case (d, i) =>
      when(element_at(a, d) > 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  // ---- DuckDB oracle SQL fragments (same math, same fold order) ----

  /** `a`/`b` must be DOUBLE[] expressions in scope. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def norm2Sql(a: String): String =
    s"list_reduce(list_transform($a, x -> x * x), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)})))"

  def signBucketSql(a: String, dims: Seq[Int]): String =
    dims.zipWithIndex.map { case (d, i) =>
      s"(CASE WHEN $a[$d] > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
