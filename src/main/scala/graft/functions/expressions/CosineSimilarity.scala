package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst cosine-similarity kernel over two `array<double>`
  * columns, with whole-stage codegen (`doGenCode`) — the fast path for
  * the ANN/dedup distance computations, replacing the interpreted
  * higher-order-function fold (VectorOps.cosine) in hot loops.
  *
  * Numerics are IDENTICAL to VectorOps.cosine and the DuckDB oracle:
  * one sequential pass accumulating dot/normL/normR in element order,
  * then dot / (sqrt(na) * sqrt(nb)). Same adds in the same order →
  * bitwise-equal doubles, so swapping this in cannot change results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
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

  // can return NULL for ragged inputs even when both children are
  // non-nullable (and codegen needs a real isNull slot for that path)
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length) {
      // ragged input → NULL, matching the HOF reference (zip_with pads
      // with null and the fold poisons) instead of silently truncating
      null
    } else {
      val n = x.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    $dot += $x[$i] * $y[$i];
         |    $na += $x[$i] * $x[$i];
         |    $nb += $y[$i] * $y[$i];
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
