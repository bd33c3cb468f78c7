package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multiplicity statistics over string arrays as native expressions —
  * the inner loops of the repetition quality filters.
  *
  * The HOF formulations are quadratic AND interpreted:
  * `array_max(transform(array_distinct(ws), w -> size(filter(ws, ...))))`
  * is O(n·d) lambda dispatches per row, and `array_distinct` on
  * non-primitive element types is itself a linear scan per element.
  * Both of these are O(n) hash passes in a tight loop. Null handling
  * mirrors each HOF spec: [[topCount]] IGNORES null elements (the
  * spec's `x === w` comparison never matches null, so null
  * multiplicity must not win the max); [[distinctCount]] counts at
  * most ONE null member (`array_distinct` keeps a single null). The
  * tokenizers here never produce null elements, so the distinction is
  * defensive. Null ARRAY input → null output for both.
  */
object ArrayCounts {

  private def countsMax(arr: ArrayData): Long = {
    val m = new java.util.HashMap[UTF8String, Long]()
    var mx = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // skip nulls: the HOF spec's `x === w` comparison never counts a
      // null element, so null multiplicity must not win the max
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = m.merge(s, 1L, (a, b) => a + b)
        if (c > mx) mx = c
      }
      i += 1
    }
    mx
  }

  private def distinct(arr: ArrayData): Long = {
    val m = new java.util.HashSet[UTF8String]()
    // null slots must not reach getUTF8String (unsafe storage returns
    // an empty-string view there, conflating NULL with "") — track the
    // null member separately; array_distinct keeps exactly one null
    var sawNull = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else m.add(arr.getUTF8String(i))
      i += 1
    }
    m.size.toLong + (if (sawNull) 1L else 0L)
  }

  private def entropyNats(arr: ArrayData): Double = {
    // TreeMap: the c·ln(c) fold must run in a DETERMINISTIC element
    // order (double addition is order-sensitive) — binary UTF8 order
    // here, matching SQL engines' default binary collation so an
    // oracle's `list(cnt ORDER BY key)` folds the same sequence
    val m = new java.util.TreeMap[UTF8String, Long]()
    var n = 0L
    var i = 0
    val sz = arr.numElements()
    while (i < sz) {
      if (!arr.isNullAt(i)) {
        m.merge(arr.getUTF8String(i), 1L, (a, b) => a + b)
        n += 1L
      }
      i += 1
    }
    if (n == 0L) 0.0
    else {
      // H = ln(n) - (Σ c·ln c)/n — one division, no per-element p=c/n
      var s = 0.0
      val it = m.values().iterator()
      while (it.hasNext) {
        val c = it.next().toDouble
        s += c * math.log(c)
      }
      math.log(n.toDouble) - s / n
    }
  }

  /** Public entry points referenced from generated code. */
  def computeTop(arr: ArrayData): Long = countsMax(arr)
  def computeDistinct(arr: ArrayData): Long = distinct(arr)
  def computeEntropy(arr: ArrayData): Double = entropyNats(arr)

  def topCount(a: Column): Column =
    GraftSqlShim.column(TopCount(
      GraftSqlShim.expression(a.cast("array<string>"))))

  def distinctCount(a: Column): Column =
    GraftSqlShim.column(DistinctCount(
      GraftSqlShim.expression(a.cast("array<string>"))))

  def entropyOf(a: Column): Column =
    GraftSqlShim.column(ArrayEntropy(
      GraftSqlShim.expression(a.cast("array<string>"))))

  import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}

  val topInfo = new ExpressionInfo(classOf[TopCount].getName,
    "array_top_count")
  val topBuilder: Seq[Expression] => Expression = {
    case Seq(a) => TopCount(Cast(a, ArrayType(StringType)))
    case other => throw new IllegalArgumentException(
      s"array_top_count expects 1 argument, got ${other.size}")
  }

  val distinctInfo = new ExpressionInfo(classOf[DistinctCount].getName,
    "array_distinct_count")
  val distinctBuilder: Seq[Expression] => Expression = {
    case Seq(a) => DistinctCount(Cast(a, ArrayType(StringType)))
    case other => throw new IllegalArgumentException(
      s"array_distinct_count expects 1 argument, got ${other.size}")
  }

  val entropyInfo = new ExpressionInfo(classOf[ArrayEntropy].getName,
    "array_entropy")
  val entropyBuilder: Seq[Expression] => Expression = {
    case Seq(a) => ArrayEntropy(Cast(a, ArrayType(StringType)))
    case other => throw new IllegalArgumentException(
      s"array_entropy expects 1 argument, got ${other.size}")
  }
}

/** `array_top_count(arr)` — the multiplicity of the most frequent
  * element (0 for an empty array).
  */
case class TopCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "array_top_count"
  override protected def nullSafeEval(input: Any): Any =
    ArrayCounts.computeTop(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayCounts$$.MODULE$$.computeTop($c)")
  override protected def withNewChildInternal(
      newChild: Expression): TopCount = copy(child = newChild)
}

/** `array_entropy(arr)` — Shannon entropy (nats) of the element
  * multiplicity distribution; 0 for an empty array, nulls ignored.
  * One hash-count pass per row plus a sorted fold (determinism note in
  * [[ArrayCounts]]).
  */
case class ArrayEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_entropy"
  override protected def nullSafeEval(input: Any): Any =
    ArrayCounts.computeEntropy(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayCounts$$.MODULE$$.computeEntropy($c)")
  override protected def withNewChildInternal(
      newChild: Expression): ArrayEntropy = copy(child = newChild)
}

/** `array_distinct_count(arr)` — the number of distinct elements. */
case class DistinctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "array_distinct_count"
  override protected def nullSafeEval(input: Any): Any =
    ArrayCounts.computeDistinct(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayCounts$$.MODULE$$.computeDistinct($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DistinctCount = copy(child = newChild)
}
