package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `bounded_min_k(value, k)` — the `k` smallest values of a group under
  * Spark's own type ordering (struct values compare field-by-field, the
  * same total order `orderBy` on those columns produces), as an array
  * in ascending order.
  *
  * Why it exists: every report-shaped check needs BOTH an aggregate
  * (violation count) and a bounded sample of offending keys. As two
  * statements that is two actions per check — a `sum` job plus a
  * TakeOrdered job — and at a hundred checks per package the fixed
  * per-action latency, not compute, dominates the validation wall
  * (PLANS.md round 11). This aggregate makes the sample AN AGGREGATE,
  * so count + sample fuse into ONE hash-agg pass: the partial buffer
  * holds at most `k` values per group, partials merge associatively,
  * and the final buffer is the exact global min-k — O(k) memory per
  * task, no sort, bit-identical to `orderBy(...).limit(k)` on the same
  * columns (multiset semantics: duplicated values occupy ranks exactly
  * as `limit` would keep them).
  *
  * Values are snapshotted through an UnsafeProjection at update time
  * (the evaluated input may alias a reused row buffer), so the buffer
  * owns its bytes; serialization is the UnsafeRow byte image.
  */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinK.Buf] {

  require(k > 0, s"bounded_min_k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinK =
    copy(child = newChildren(0))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val valueOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  /** Rows sorted by their single field's value ordering. */
  @transient private[functions] lazy val rowOrd: Ordering[UnsafeRow] =
    (x: UnsafeRow, y: UnsafeRow) =>
      valueOrd.compare(x.get(0, child.dataType), y.get(0, child.dataType))

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  private def newBuf(): BoundedMinK.Buf =
    new BoundedMinK.Buf(mutable.TreeMap.empty[UnsafeRow, Int](rowOrd), 0)

  override def createAggregationBuffer(): BoundedMinK.Buf = newBuf()

  /** Insert keeping only the `k` smallest occurrences. */
  private def add(buf: BoundedMinK.Buf, v: UnsafeRow): Unit =
    if (buf.n < k) {
      buf.m.updateWith(v) { c => Some(c.getOrElse(0) + 1) }
      buf.n += 1
    } else {
      val last = buf.m.last
      if (rowOrd.compare(v, last._1) < 0) {
        if (last._2 == 1) buf.m -= last._1
        else buf.m.update(last._1, last._2 - 1)
        buf.m.updateWith(v) { c => Some(c.getOrElse(0) + 1) }
      }
    }

  override def update(buf: BoundedMinK.Buf, input: InternalRow): BoundedMinK.Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, proj(InternalRow(v)).copy())
    buf
  }

  override def merge(buf: BoundedMinK.Buf, other: BoundedMinK.Buf): BoundedMinK.Buf = {
    other.m.foreach { case (v, c) =>
      var i = 0
      while (i < c) { add(buf, v); i += 1 }
    }
    buf
  }

  /** Ascending array of the k smallest values. */
  override def eval(buf: BoundedMinK.Buf): Any = {
    val out = Array.newBuilder[Any]
    buf.m.foreach { case (r, c) =>
      var j = 0
      while (j < c) {
        out += InternalRow.copyValue(r.get(0, child.dataType))
        j += 1
      }
    }
    new GenericArrayData(out.result())
  }

  override def serialize(buf: BoundedMinK.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (r, c) =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeInt(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinK.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newBuf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rb = new Array[Byte](len)
      in.readFully(rb)
      val r = new UnsafeRow(1)
      r.pointTo(rb, len)
      val c = in.readInt()
      buf.m.update(r, c)
      buf.n += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BoundedMinK =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType)
  override def prettyName: String = "bounded_min_k"
}

object BoundedMinK {
  /** Counted tree multiset: value row → multiplicity, total count `n`
    * ≤ k by construction.
    */
  final class Buf(val m: mutable.TreeMap[UnsafeRow, Int], var n: Int)

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BoundedMinK].getName, "bounded_min_k")

  val builder: Seq[Expression] => Expression = {
    case Seq(value, k) => BoundedMinK(value, BoundedTopK.extractK(k))
    case args => throw new IllegalArgumentException(
      s"bounded_min_k expects 2 args (value, k), got ${args.size}")
  }

  /** Column-API entry point. */
  def minK(value: Column, k: Int): Column =
    GraftSqlShim.column(BoundedMinK(
      GraftSqlShim.expression(value), k).toAggregateExpression())
}
