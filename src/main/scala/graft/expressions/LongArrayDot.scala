package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<long>` columns, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the hot kernel of embedding similarity (cosine over
  * quantized vectors — `Dedup.embeddingDupPairsLsh` / `annTopK`): it runs
  * once per candidate PAIR, so on an all-pairs or LSH-bucketed join it
  * executes O(n²)·dim times. The `zip_with`+`aggregate` higher-order
  * formulation allocates an intermediate array and interprets two
  * lambdas per pair (HOFs are not codegen'd); this expression compiles
  * to a tight primitive loop over the unsafe array data — no
  * allocation, no virtual calls — and benches ~15× faster at sf0.1.
  *
  * Inputs must be non-null-element arrays (quantized vectors are, by
  * construction); lengths may differ, the shorter prefix is used.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
