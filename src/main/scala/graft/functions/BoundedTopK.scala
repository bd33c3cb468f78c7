package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bounded_top_k(score, id, k)` — the `k` best `(score, id)` pairs of a
  * group, ordered by score DESC then id ASC, as an array of structs in
  * rank order.
  *
  * Why it exists: ranking "top k per query" with
  * `Window.partitionBy(query).orderBy(score desc)` + `row_number` routes
  * EVERY scored row of one query to a single reducer, which then sorts
  * the lot — at 100 TB corpus × few queries that is a handful of
  * reducers each sorting the whole corpus. This aggregate keeps the
  * ranking in ordinary hash aggregation: the partial (map-side) buffer
  * holds at most `k` entries per group, partials merge associatively,
  * and the final buffer is the exact global top-k — O(k) memory per
  * task, no global sort, no single-reducer stage.
  *
  * The buffer is a MULTISET (counted tree map): duplicate (score, id)
  * input rows each occupy a rank slot, exactly as `row_number` over the
  * same order would rank them. The order is total (score desc, id asc —
  * `java.lang.Double.compare` on the score, so -0.0/0.0 and NaN are
  * handled consistently), making the result independent of partitioning
  * and merge order: same answer on any cluster layout, bit-identical to
  * the window+row_number formulation it replaces — including on inputs
  * with duplicated rows.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Buf] {

  require(k > 0, s"bounded_top_k needs k > 0, got $k")

  def this(score: Expression, id: Expression, k: Expression) =
    this(score, id, BoundedTopK.extractK(k))

  override def children: Seq[Expression] = Seq(score, id)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))

  override def createAggregationBuffer(): BoundedTopK.Buf =
    new BoundedTopK.Buf(
      mutable.TreeMap.empty[(Double, Long), Int](BoundedTopK.ord), 0)

  /** Insert keeping only the `k` best occurrences. */
  private def add(buf: BoundedTopK.Buf, v: (Double, Long)): Unit =
    if (buf.n < k) {
      buf.m.updateWith(v) { c => Some(c.getOrElse(0) + 1) }
      buf.n += 1
    } else {
      val last = buf.m.last
      if (BoundedTopK.ord.compare(v, last._1) < 0) {
        if (last._2 == 1) buf.m -= last._1
        else buf.m.update(last._1, last._2 - 1)
        buf.m.updateWith(v) { c => Some(c.getOrElse(0) + 1) }
      }
    }

  override def update(buf: BoundedTopK.Buf, input: InternalRow): BoundedTopK.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: BoundedTopK.Buf, other: BoundedTopK.Buf): BoundedTopK.Buf = {
    other.m.foreach { case (v, c) =>
      var i = 0
      while (i < c) { add(buf, v); i += 1 }
    }
    buf
  }

  /** Rank-ordered array of (id, score) structs. */
  override def eval(buf: BoundedTopK.Buf): Any = {
    val out = Array.newBuilder[Any]
    buf.m.foreach { case ((s, i), c) =>
      var j = 0
      while (j < c) { out += (InternalRow(i, s): Any); j += 1 }
    }
    new GenericArrayData(out.result())
  }

  override def serialize(buf: BoundedTopK.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreach { case ((s, i), c) =>
      out.writeDouble(s)
      out.writeLong(i)
      out.writeInt(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val id = in.readLong()
      val c = in.readInt()
      buf.m.update((s, id), c)
      buf.n += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_top_k"
}

object BoundedTopK {
  /** Counted tree multiset: entry → multiplicity, with the total
    * occurrence count tracked (`n` ≤ k by construction).
    */
  final class Buf(val m: mutable.TreeMap[(Double, Long), Int], var n: Int)

  /** Total order: score desc, id asc. */
  val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  private[functions] def extractK(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"bounded_top_k k must be an integer literal, got $other")
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BoundedTopK].getName, "bounded_top_k")

  /** SQL builder — casts pin the (double, long) input contract so a
    * mistyped call is an analysis error, not misaligned reads.
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(score, id, k) => new BoundedTopK(
      Cast(score, DoubleType), Cast(id, LongType), k)
    case args => throw new IllegalArgumentException(
      s"bounded_top_k expects 3 args (score, id, k), got ${args.size}")
  }

  /** Column-API entry point. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftSqlShim.column(BoundedTopK(
      GraftSqlShim.expression(score.cast("double")),
      GraftSqlShim.expression(id.cast("long")), k).toAggregateExpression())
}
