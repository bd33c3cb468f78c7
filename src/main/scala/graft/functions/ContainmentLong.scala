package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `containment_long(sub, sup)` — |sub ∩ sup| / |sub| over two long
  * arrays treated as sets: the asymmetric near-dup verifier
  * ([[graft.ext.Dedup.containmentHashes]]), as a native expression.
  *
  * Same rationale as [[JaccardLong]]: this sits in the candidate-pair
  * verification inner loop, where the built-in
  * `size(array_intersect)/size(array_distinct)` formulation allocates
  * two intermediate arrays per pair and runs the generic boxed-element
  * set machinery. Here both cardinalities come from one primitive-long
  * hash-set pass per array, no intermediates.
  *
  * Set semantics match the built-ins on inputs with duplicates (both
  * cardinalities are over distinct values). Null elements are IGNORED —
  * this intentionally diverges from the `size(array_distinct(sub))`
  * formulation, which counts a null member into the denominator; null
  * elements never occur in shingle-hash arrays, so the parity spec
  * ([[graft.ext.Dedup.containmentHashesHof]]) agrees on every real
  * input. Empty `sub` → 0.0, matching the `when(size > 0, ...)` guard
  * this replaces.
  */
case class ContainmentLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "containment_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ContainmentLong.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = " +
      s"graft.functions.ContainmentLong$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentLong =
    copy(left = newLeft, right = newRight)
}

object ContainmentLong {

  def compute(sub: ArrayData, sup: ArrayData): Double = {
    val ss = new java.util.HashSet[java.lang.Long]()
    var i = 0
    val ns = sup.numElements()
    while (i < ns) {
      if (!sup.isNullAt(i)) ss.add(sup.getLong(i))
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var inter = 0L
    var j = 0
    val nb = sub.numElements()
    while (j < nb) {
      if (!sub.isNullAt(j)) {
        val v: java.lang.Long = sub.getLong(j)
        if (seen.add(v) && ss.contains(v)) inter += 1
      }
      j += 1
    }
    if (seen.size > 0) inter.toDouble / seen.size else 0.0
  }

  def containment(sub: Column, sup: Column): Column =
    GraftSqlShim.column(ContainmentLong(
      GraftSqlShim.expression(sub.cast("array<long>")),
      GraftSqlShim.expression(sup.cast("array<long>"))))

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ContainmentLong].getName, "containment_long")

  /** SQL builder — same array<long> casts as the Column path (see
    * DotProduct.builder for why the casts matter).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      ContainmentLong(
        org.apache.spark.sql.catalyst.expressions.Cast(
          a, ArrayType(LongType)),
        org.apache.spark.sql.catalyst.expressions.Cast(
          b, ArrayType(LongType)))
    case other => throw new IllegalArgumentException(
      s"containment_long expects 2 arguments, got ${other.size}")
  }
}
