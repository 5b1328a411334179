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

  // ragged inputs → NULL (the zip_with reference pads with null and the
  // fold poisons); codegen needs a real isNull slot for that path
  override def nullable: Boolean = true

  override def prettyName: String = "l2_dist_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length) null
    else {
      var acc = 0.0
      var i = 0
      while (i < x.length) {
        val d = x(i) - y(i); acc += d * d; i += 1
      }
      java.lang.Double.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val acc = ctx.freshName("acc"); val dd = ctx.freshName("dd")
      val i = ctx.freshName("i")
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
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
