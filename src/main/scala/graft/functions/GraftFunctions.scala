package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expressions.{ArrayIntersectSize, CosineSimilarity, L2DistanceSq}

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths to the same registry entry:
  *  - `GraftFunctions.register(spark)` — imperative, used inside query
  *    closures (idempotent; Verify/Bench own session construction).
  *  - `GraftExtensions` via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    — the deployment path when the user owns the builder.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression, (String, String))] = Seq(
    ("cosine_sim", (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)),
      ("cosine_sim(a, b)", "cosine similarity of two array<double> vectors")),
    ("array_intersect_size", (es: Seq[Expression]) => ArrayIntersectSize(es(0), es(1)),
      ("array_intersect_size(a, b)",
        "count of a's elements contained in b (array<string>), hash-probe codegen")),
    ("l2_dist_sq", (es: Seq[Expression]) => L2DistanceSq(es(0), es(1)),
      ("l2_dist_sq(a, b)",
        "squared L2 distance of two array<double> vectors, codegen loop")))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Column-API entry points (require register() on the session). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def arrayIntersectSize(a: Column, b: Column): Column =
    call_function("array_intersect_size", a, b)
  def l2DistSq(a: Column, b: Column): Column = call_function("l2_dist_sq", a, b)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder, (usage, doc)) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", null, name, usage, doc),
        builder))
    }
    // whole-operator surface: top-k-per-key strategy + the automatic
    // row_number-filter rewrite that targets it
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RankLimitRewrite)
  }
}
