package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that `layout_zorder` is not just a report: write the SAME rows
  * in a Z-ordered layout and an unordered layout, then count the parquet
  * row groups whose (l_partkey, l_suppkey) zone maps intersect a 2-D box
  * predicate. The Z-ordered layout must let a min/max pruner (parquet
  * row-group stats, Delta/Iceberg file skipping) discard most of the
  * data; the unordered layout can discard nothing. This is the I/O
  * mechanism the 100 TB design leans on — measured on real footers, not
  * asserted from theory.
  */
class LayoutSkipSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** row groups whose [min,max] boxes intersect the query box, over all
    * parquet files under `dir` — exactly the work a zone-map pruner does.
    */
  private def overlapping(dir: String, loP: Long, hiP: Long,
      loS: Long, hiS: Long): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          def range(col: String): (Long, Long) = {
            val st = block.getColumns.asScala
              .find(_.getPath.toDotString == col).get.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long],
              st.genericGetMax.asInstanceOf[java.lang.Long])
          }
          val (minP, maxP) = range("l_partkey")
          val (minS, maxS) = range("l_suppkey")
          if (!(maxP < loP || minP > hiP) && !(maxS < loS || minS > hiS))
            overlap += 1
        }
      } finally reader.close()
    }
    (overlap, total)
  }

  test("z-ordered layout prunes most row groups for a 2-D box; unordered prunes none") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val Array(mp, ms) = li.agg(max("l_partkey") + 1L, max("l_suppkey") + 1L)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray

    val base = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    val bits = graft.operators.Layout.ZBITS
    val z = graft.operators.Layout.morton(
      expr(s"(l_partkey * ${1L << bits}) div $mp"),
      expr(s"(l_suppkey * ${1L << bits}) div $ms"))
    // Z-ordered: range-partition by the Morton code, sort within files —
    // what OPTIMIZE ZORDER materializes. Unordered: hash repartition of
    // the same rows into the same file count.
    li.withColumn("z", z)
      .repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .drop("z").write.parquet(s"$base/zorder")
    li.repartition(16).write.parquet(s"$base/plain")

    // box: bottom eighth of BOTH key ranges — the 2-D selective scan a
    // single-column sort cannot serve from one narrow run of files
    val (loP, hiP) = (0L, mp / 8)
    val (loS, hiS) = (0L, ms / 8)
    val (zHit, zTotal) = overlapping(s"$base/zorder", loP, hiP, loS, hiS)
    val (pHit, pTotal) = overlapping(s"$base/plain", loP, hiP, loS, hiS)

    assert(pHit === pTotal,
      s"unordered layout must overlap everywhere ($pHit/$pTotal)")
    assert(zHit <= zTotal / 4,
      s"z-order must prune >= 3/4 of row groups, got $zHit/$zTotal")

    // layout must never change SEMANTICS: both layouts answer the box
    // query with identical row sets
    def boxRows(dir: String) = spark.read.parquet(dir)
      .filter(col("l_partkey").between(loP, hiP) &&
        col("l_suppkey").between(loS, hiS))
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .collect().map(_.toSeq).toSet
    assert(boxRows(s"$base/zorder") === boxRows(s"$base/plain"))
  }

  test("skipping-gain report: both layouts cover every match, z-order never amplifies more than linear") {
    val rows = graft.operators.Layout
      .queries("layout_skipping_gain")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet === Set("zorder", "linear"))
    val matched = rows.values.map(_.getAs[Long]("n_rows_matched")).toSet
    assert(matched.size === 1, "the predicate's answer is layout-independent")
    assert(matched.head > 0, "the box predicate must select something")
    rows.values.foreach { r =>
      // zone-map pruning is conservative: reads must cover the answer
      assert(r.getAs[Long]("n_rows_read") >= r.getAs[Long]("n_rows_matched"))
      assert(r.getAs[Long]("n_buckets_read") <= r.getAs[Long]("n_buckets"))
    }
    assert(rows("zorder").getAs[Double]("read_amplification") <=
      rows("linear").getAs[Double]("read_amplification"),
      "the whole point: z-order reads no more than the linear layout")
  }
}
