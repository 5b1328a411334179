package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Output-schema allowlist: every query's RESULT columns must use
  * driver-hash-proven types only.
  *
  * Why this spec exists: the driver's correctness gate hashes the Spark
  * result (written to parquet, re-read) against the DuckDB oracle
  * result (fetched natively), and some types render differently across
  * those two paths even when the VALUES are byte-identical —
  * round 6's `layout_compaction_plan` (documented in
  * tools/check_oracle.py) and round 10's `text_tfidf_cosine_pairs`
  * (the only DECIMAL(38,0) output column ever shipped; judge-verified
  * value-exact at sf0.01 and sf0.1, yet hash-red on the board). The
  * local pre-flight CANNOT catch this class — check_oracle.py compares
  * declared types and exact values, both of which matched — so the
  * only repo-side defense is to keep hash-fragile types out of output
  * schemas entirely. Wide decimals remain fine (and load-bearing) as
  * intermediate ACCUMULATORS; only the shipped cell must be cast down.
  *
  * The allowlist below is exactly the set the 280 green queries of
  * round 10 already ship. DECIMAL(p>18) (INT128-backed), INTERVAL,
  * BINARY, and nested types are rejected.
  */
class OutputTypeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def allowed(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType                        => true
    case StringType                                    => true
    case DateType | TimestampType | TimestampNTZType   => true
    case BooleanType                                   => true
    case d: DecimalType                                => d.precision <= 18
    case _                                             => false
  }

  test("every query ships only driver-hash-proven column types") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // Schema resolution only — the plan is built, never executed.
        val schema = fn(spark, sfDir).schema
        schema.fields.collect {
          case f if !allowed(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(
      offenders.isEmpty,
      s"""Queries ship driver-hash-FRAGILE output column types:
         |  ${offenders.mkString("\n  ")}
         |The driver's value hash renders these inconsistently between
         |its parquet-read and oracle-fetch paths even when values are
         |exact — see text_tfidf_cosine_pairs (round 10) and
         |layout_compaction_plan (round 6, tools/check_oracle.py).
         |Keep wide-decimal ACCUMULATORS, but cast the shipped cell to
         |BIGINT/DOUBLE/DECIMAL(p<=18) in BOTH the Spark select and the
         |oracle's outer SELECT.""".stripMargin)
  }
}
