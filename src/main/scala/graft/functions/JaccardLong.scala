package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `jaccard_long(a, b)` — Jaccard similarity of two long arrays treated
  * as sets, as a native expression: one hash pass over each array.
  *
  * This is the verification inner loop of MinHash dedup — every LSH
  * candidate pair pays one Jaccard over its shingle-hash arrays. The
  * built-in `size(array_intersect)/size(array_union)` formulation
  * allocates two intermediate arrays per pair and runs the generic
  * (boxed-element) set machinery; this computes both cardinalities with
  * primitive-long hash sets and no intermediate arrays.
  *
  * Set semantics match the built-ins on inputs WITH duplicates too:
  * both cardinalities are over distinct values, and null elements are
  * ignored (shingle-hash arrays are distinct and non-null by
  * construction; the guard keeps parity exact anyway — the built-ins
  * treat null as a set member, which never occurs here, and ExtSpec
  * pins parity on real inputs). Empty union → 0.0, matching the
  * `when(union > 0, ...)` guard this replaces.
  */
case class JaccardLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardLong.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = " +
      s"graft.functions.JaccardLong$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLong =
    copy(left = newLeft, right = newRight)
}

object JaccardLong {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[java.lang.Long]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) sa.add(a.getLong(i))
      i += 1
    }
    val sb = new java.util.HashSet[java.lang.Long]()
    var inter = 0L
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val v: java.lang.Long = b.getLong(j)
        if (sb.add(v) && sa.contains(v)) inter += 1
      }
      j += 1
    }
    val union = sa.size.toLong + sb.size.toLong - inter
    if (union > 0) inter.toDouble / union else 0.0
  }

  def jaccard(a: Column, b: Column): Column =
    GraftSqlShim.column(JaccardLong(
      GraftSqlShim.expression(a.cast("array<long>")),
      GraftSqlShim.expression(b.cast("array<long>"))))

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[JaccardLong].getName, "jaccard_long")

  /** SQL builder — same array<long> casts as the Column path (see
    * DotProduct.builder for why the casts matter).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      JaccardLong(
        org.apache.spark.sql.catalyst.expressions.Cast(
          a, ArrayType(LongType)),
        org.apache.spark.sql.catalyst.expressions.Cast(
          b, ArrayType(LongType)))
    case other => throw new IllegalArgumentException(
      s"jaccard_long expects 2 arguments, got ${other.size}")
  }
}
