package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: top-k rows per key.
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(o))` then `filter(rn <= k)` — shuffles EVERY row to its key's
  * partition and fully sorts each group before discarding all but k.
  * This operator keeps a bounded k-heap per key on each input partition
  * (map side), so the exchange moves at most k·|keys-per-partition| rows
  * and nothing is ever globally sorted — the same partial/final shape as
  * aggregation, applied to top-k. At 100 TB with k=5 this is the
  * difference between shuffling the corpus and shuffling the answer.
  *
  * Semantics match the window formulation exactly when the ordering is
  * total (tie-broken), which every graft query guarantees.
  */
case class TopKPerKeyLogical(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** Shared per-partition bounded top-k (used map-side and reduce-side —
  * top-k is idempotent: topk(topk(x) ∪ topk(y)) == topk(x ∪ y)).
  */
private[plans] object BoundedTopK {
  def perKey(iter: Iterator[InternalRow], keys: Seq[Expression],
      order: Seq[SortOrder], k: Int, output: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val ord = new LazilyGeneratedOrdering(order, output)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
    iter.foreach { row =>
      val buf = heaps.getOrElseUpdate(keyProj(row).copy(),
        mutable.ArrayBuffer.empty[InternalRow])
      if (buf.length < k) {
        buf += row.copy()
        if (buf.length == k) buf.sortInPlace()(ord)
      } else if (ord.compare(row, buf.last) < 0) {
        buf(k - 1) = row.copy()
        buf.sortInPlace()(ord)
      }
    }
    heaps.valuesIterator.flatMap(b => b.sortInPlace()(ord).iterator)
  }
}

case class PartialTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(BoundedTopK.perKey(_, keys, order, k, child.output))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

case class FinalTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(BoundedTopK.perKey(_, keys, order, k, child.output))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(keys, order, k, child) =>
      FinalTopKExec(keys, order, k,
        PartialTopKExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User API: `TopK.perKey(df, Seq("key"), Seq($"x".desc, $"id".asc), 5)`. */
object TopK {

  def installed(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  def perKey(df: DataFrame, keyCols: Seq[String], orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    installed(spark)
    val child = GraftShim.analyzed(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${child.output.map(_.name)}"))
    val keys = keyCols.map(attr)
    val order = orderSpec.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftShim.ofRows(spark, TopKPerKeyLogical(keys, order, k, child))
  }
}
