package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional third arg (local iteration only; the driver passes two):
    // comma-separated name prefixes — run only matching queries.
    val (sfDir, outDir) = (args(0), args(1))
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(','); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Name order groups each family's queries contiguously (shared
    // persisted intermediates get reused while hot), and the family
    // boundary release bounds the peak cache footprint to one family —
    // the same policy Bench uses, for the same reason: carrying every
    // family's MEMORY_AND_DISK blocks to the end raises the late-run
    // memory floor for no reuse benefit.
    // r18: q<digits> queries collapse into one "q" release window (the
    // Bench.group convention) so the shared fact-table persists serve
    // the whole contiguous TPC-H block instead of being rebuilt per
    // query — see Bench.scala's family() note.
    def family(name: String): String = {
      val fam = name.takeWhile(_ != '_')
      if (fam.length > 1 && fam.head == 'q' && fam.tail.forall(_.isDigit)) "q"
      else fam
    }
    var prevFamily: String = null
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only(kv._1)).foreach { case (name, fn) =>
      if (prevFamily != null && family(name) != prevFamily) CachePool.releaseAll()
      prevFamily = family(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    CachePool.releaseAll()
    spark.stop()
  }
}
