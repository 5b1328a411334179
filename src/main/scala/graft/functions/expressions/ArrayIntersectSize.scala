package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  // a NULL b → 0, so only a null left makes the result null
  override def nullable: Boolean = left.nullable

  override def prettyName: String = "array_intersect_size"

  // NULL semantics mirror the HOF exactly, which is asymmetric:
  //   a NULL → NULL (size(filter(NULL, ...)) is NULL)
  //   b NULL → 0    (array_contains(NULL, x) is NULL per element, the
  //                  filter drops everything, size([]) = 0)
  // The default null-intolerant BinaryExpression eval would return NULL
  // for b NULL, so eval/codegen are written out explicitly.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else {
      val b = right.eval(input)
      if (b == null) Integer.valueOf(0)
      else {
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
        Integer.valueOf(c)
      }
    }
  }

  // Raw java.util.HashSet (no generic type arguments): Janino's generics
  // support is partial, and a generic declaration that fails to compile
  // would silently drop the whole stage to the interpreted path —
  // defeating the kernel. Raw add/contains take Object, so no casts are
  // needed; this matches Spark's own codegen convention.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val set = ctx.freshName("set")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  ${rightGen.code}
         |  if (!${rightGen.isNull}) {
         |    java.util.HashSet $set = new java.util.HashSet();
         |    for (int $i = 0; $i < ${rightGen.value}.numElements(); $i++) {
         |      if (!${rightGen.value}.isNullAt($i)) $set.add(${rightGen.value}.getUTF8String($i));
         |    }
         |    int $c = 0;
         |    for (int $j = 0; $j < ${leftGen.value}.numElements(); $j++) {
         |      if (!${leftGen.value}.isNullAt($j) && $set.contains(${leftGen.value}.getUTF8String($j))) $c++;
         |    }
         |    ${ev.value} = $c;
         |  }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
