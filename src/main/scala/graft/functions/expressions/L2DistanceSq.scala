package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst squared-L2-distance kernel over two `array<double>`
  * columns, with whole-stage codegen — the fast path for the PQ
  * encode/ADC scoring loops (ann_pq_error, ann_ivfadc_topk), replacing
  * the interpreted higher-order-function fold
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`.
  *
  * Numerics are IDENTICAL to that fold and to the DuckDB oracle's
  * `list_reduce(list_transform(...), +)`: one sequential pass adding
  * (x−y)² in element order from 0.0. Same adds in the same order →
  * bitwise-equal doubles, so swapping this in cannot change results.
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // ragged inputs or a NULL element → NULL (the zip_with reference
  // pads with null and the fold poisons); codegen needs a real isNull
  // slot for those paths
  override def nullable: Boolean = true

  override def prettyName: String = "l2_dist_sq"

  /** True when a child's STATIC type admits null elements. When false
    * for both, the branch-free `toDoubleArray` fast path is sound (and
    * is what the PQ hot loops compile to — codebook literals carry
    * containsNull = false); when true, the fold's null-poisoning must
    * be honored element-by-element: `toDoubleArray` would NPE on a
    * GenericArrayData null or silently read 0.0 from UnsafeArrayData —
    * either way diverging from the HOF/oracle semantics.
    */
  private def mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else if (!mayHaveNullElements) {
      val xs = x.toDoubleArray(); val ys = y.toDoubleArray()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = xs(i) - ys(i); acc += d * d; i += 1
      }
      java.lang.Double.valueOf(acc)
    } else {
      var acc = 0.0
      var i = 0
      var poisoned = false
      while (i < n && !poisoned) {
        if (x.isNullAt(i) || y.isNullAt(i)) poisoned = true
        else { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
      }
      if (poisoned) null else java.lang.Double.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc"); val dd = ctx.freshName("dd")
      val i = ctx.freshName("i")
      if (!mayHaveNullElements) {
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |double[] $x = $a.toDoubleArray();
           |double[] $y = $b.toDoubleArray();
           |if ($x.length != $y.length) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $x.length; $i++) {
           |    double $dd = $x[$i] - $y[$i];
           |    $acc += $dd * $dd;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      } else {
        val n = ctx.freshName("n")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true;
           |      break;
           |    }
           |    double $dd = $a.getDouble($i) - $b.getDouble($i);
           |    $acc += $dd * $dd;
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = $acc;
           |  }
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
