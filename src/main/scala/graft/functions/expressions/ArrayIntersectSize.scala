package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst kernel: |{x ∈ a : x ∈ b}| over two `array<string>`
  * columns, with whole-stage codegen.
  *
  * Replaces the interpreted higher-order form
  * `size(filter(a, x -> array_contains(b, x)))` in the dedup verify path:
  * the HOF probes b linearly per element of a — O(|a|·|b|) interpreted
  * calls per pair — while this kernel builds one hash set of b and probes
  * it, O(|a|+|b|) inside codegen. Semantics are IDENTICAL to the HOF
  * (null elements never match, duplicates in a each count), so swapping
  * it in cannot change results against the DuckDB oracle.
  */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "array_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < xb.numElements()) {
      if (!xb.isNullAt(i)) set.add(xb.getUTF8String(i))
      i += 1
    }
    var c = 0
    i = 0
    while (i < xa.numElements()) {
      if (!xa.isNullAt(i) && set.contains(xa.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>();
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) $set.add($b.getUTF8String($i));
         |}
         |int $c = 0;
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if (!$a.isNullAt($j) && $set.contains($a.getUTF8String($j))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
