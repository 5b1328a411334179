package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema drift beyond missing columns (cdc_schema_evolution covers
  * those): a CDC table's shape changes over a pipeline's lifetime and
  * re-writing 100 TB of history is not an option. Two mechanisms, each
  * with its real limits stated:
  *  - ADDED columns: parquet `mergeSchema` unions the schemas; old
  *    files surface NULLs.
  *  - TYPE WIDENING (int → long): mergeSchema REFUSES conflicting
  *    types (verified), so the portable path is explicit per-epoch
  *    casts unioned by name — exactly what a catalog with schema
  *    versions automates.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("mergeSchema unions added columns; old files surface NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve1").toString + "/t"
    Seq((1L, 10L), (2L, 20L)).toDF("key", "value")
      .write.mode("append").parquet(dir)
    Seq((3L, 30L, "x")).toDF("key", "value", "props")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq === Seq("key", "props", "value"))
    val rows = merged.orderBy("key")
      .select($"key", $"value", coalesce($"props", lit("-")))
      .as[(Long, Long, String)].collect().toSeq
    assert(rows === Seq((1L, 10L, "-"), (2L, 20L, "-"), (3L, 30L, "x")))
  }

  test("type widening needs explicit casts: mergeSchema refuses int vs long") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve2").toString
    val (v1, v2) = (s"$dir/v1", s"$dir/v2")
    Seq((1L, 10), (2L, 20)).toDF("key", "value").write.parquet(v1) // INT epoch
    Seq((3L, 3000000000L)).toDF("key", "value").write.parquet(v2)  // LONG epoch

    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(v1, v2).collect()
    }
    assert(e.getMessage.contains("CANNOT_MERGE_SCHEMAS") ||
      e.getMessage.contains("Failed merging schemas"), e.getMessage)

    // the migration path: per-epoch reads, explicit widen, union by name
    val widened = spark.read.parquet(v1)
      .withColumn("value", col("value").cast("long"))
      .unionByName(spark.read.parquet(v2))
    val rows = widened.orderBy("key").as[(Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 10L), (2L, 20L), (3L, 3000000000L)))
  }
}
