package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** `dot_double(a, b)` — dot product of two double arrays, as a native
  * Catalyst expression WITH codegen.
  *
  * Why it exists: higher-order functions (`aggregate`/`zip_with`) are
  * interpreted — no whole-stage codegen, a lambda-dispatch per element —
  * and the dot product is the inner loop of every similarity operator
  * (brute-force top-k scores |corpus|·|queries| pairs, LSH verification
  * scores every candidate). This is SURVEY.md §7.4's "(b) custom
  * Catalyst Expression" tier: a tight primitive-array loop inside the
  * codegen'd stage, no allocation, no virtual calls.
  *
  * Semantics match `aggregate(zip_with(a, b, _*_), 0.0, _+_)` for
  * equal-length non-null arrays: strict left-to-right double summation
  * (bit-identical across engines/partitionings). Length mismatch
  * truncates to the shorter array; null input → null.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point (no function registration needed). The
    * defensive casts pin the input type contract (array<double>)
    * without an ExpectsInputTypes mixin (private[sql] in Spark 4).
    */
  def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProduct(
      GraftSqlShim.expression(a.cast("array<double>")),
      GraftSqlShim.expression(b.cast("array<double>"))))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "dot_double")

  /** SQL builder — the same array<double> casts as the Column path:
    * without them, `dot_double(array(1,2), ...)` on int arrays would
    * call `ArrayData.getDouble` on misaligned storage (silent garbage
    * or a runtime ClassCastException instead of an analysis-time error).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(
      Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
    case other => throw new IllegalArgumentException(
      s"dot_double expects 2 arguments, got ${other.size}")
  }
}
