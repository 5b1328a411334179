package graft

import org.apache.spark.sql.SparkSession

/** Local smoke harness mirroring the driver's t1 check: run
  * `SparkEntry.entry` on sf0.001 and require rows > 0. Pass a query name
  * as args(0) to print that query's formatted physical plan instead
  * (plan-inspection loop for shuffle/pushdown tuning).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.nonEmpty) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    } else {
      val n = SparkEntry.entry(spark).count()
      println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))
    }
    spark.stop()
  }
}
