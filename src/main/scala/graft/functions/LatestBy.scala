package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `latest_by(payload, version_array)` — the payload of a group's row
  * with the lexicographically greatest `array<long>` version vector.
  * The general argmax-by-version aggregate behind CDC last-writer-wins
  * compaction ([[graft.ext.Cdc.lastWriterWins]]).
  *
  * Why it exists: Spark's own `max_by` (and `max(struct(...))`) carry a
  * struct-typed aggregation buffer, which HashAggregate cannot hold in
  * its mutable UnsafeRow state — the plan silently degrades to
  * SortAggregate, paying a per-partition sort of the ENTIRE change log
  * by key before any combining happens. This TypedImperativeAggregate
  * keeps the argmax in (Object)HashAggregate: O(1) buffer per group
  * (one version vector + one payload row), map-side partials absorb
  * per-key churn before the shuffle, merge is associative — the shape a
  * 100 TB change log needs.
  *
  * Determinism: the version vector must totally order each group's rows
  * (append a unique change id as the last element); version ties keep
  * the first-seen payload, which is partitioning-dependent — uniqueness
  * is the caller's contract, same as `row_number` tie-breaking. Rows
  * with a null version (or any null element, which long-array
  * extraction rejects) are ignored; a null PAYLOAD with a valid version
  * still competes (a tombstone may be the latest fact).
  */
case class LatestBy(
    payload: Expression,
    version: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestBy.Buf] {

  override def children: Seq[Expression] = Seq(payload, version)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestBy =
    copy(payload = newChildren(0), version = newChildren(1))

  override def createAggregationBuffer(): LatestBy.Buf =
    new LatestBy.Buf(null, null)

  private def considered(buf: LatestBy.Buf, v: Array[Long],
      p: Any): LatestBy.Buf = {
    if (buf.version == null || LatestBy.compare(v, buf.version) > 0) {
      buf.version = v
      buf.payload = p
    }
    buf
  }

  override def update(buf: LatestBy.Buf, input: InternalRow): LatestBy.Buf = {
    val vRaw = version.eval(input)
    if (vRaw == null) buf
    else {
      val arr = vRaw.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val v = new Array[Long](n)
      var i = 0
      var hasNull = false
      while (i < n && !hasNull) {
        if (arr.isNullAt(i)) hasNull = true
        else { v(i) = arr.getLong(i); i += 1 }
      }
      if (hasNull) buf // a null version element cannot be ordered — skip
      else {
        // copy: the evaluated payload may alias a reused UnsafeRow
        val p = InternalRow.copyValue(payload.eval(input))
        considered(buf, v, p)
      }
    }
  }

  override def merge(buf: LatestBy.Buf, other: LatestBy.Buf): LatestBy.Buf =
    if (other.version == null) buf
    else considered(buf, other.version, other.payload)

  override def eval(buf: LatestBy.Buf): Any = buf.payload

  /** (payload) wrapped in a single-field row so one UnsafeProjection
    * handles any payload type, nested or not.
    */
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](payload.dataType))

  override def serialize(buf: LatestBy.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.version == null) out.writeInt(-1)
    else {
      out.writeInt(buf.version.length)
      buf.version.foreach(out.writeLong)
      val row = serProj(InternalRow(buf.payload))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LatestBy.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) createAggregationBuffer()
    else {
      val v = Array.fill(n)(in.readLong())
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      new LatestBy.Buf(v, InternalRow.copyValue(row.get(0, payload.dataType)))
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): LatestBy =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): LatestBy =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType
  override def prettyName: String = "latest_by"
}

object LatestBy {
  /** One version vector + one payload value — O(1) per group. */
  final class Buf(var version: Array[Long], var payload: Any)

  /** Lexicographic; a longer vector with an equal prefix is greater
    * (callers should keep the arity constant per column anyway).
    */
  private[functions] def compare(x: Array[Long], y: Array[Long]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Long.compare(x(i), y(i))
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LatestBy].getName, "latest_by")

  /** SQL builder — pins the version argument to array<long> so a
    * mistyped call fails analysis, not execution.
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(p, v) =>
      LatestBy(p, Cast(v, ArrayType(LongType, containsNull = true)))
    case other => throw new IllegalArgumentException(
      s"latest_by(payload, version_array) takes 2 args, got ${other.size}")
  }

  /** DataFrame-side helper. Version columns must be integral —
    * timestamps are converted by the CALLER (`unix_micros`, per the Cdc
    * contract) because a cast-to-long of a timestamp truncates to
    * SECONDS; the array<long> cast below only widens integrals.
    */
  def latest(payload: Column, versions: Seq[Column]): Column =
    latestVector(payload,
      org.apache.spark.sql.functions.array(versions: _*))

  /** Variant taking an already-assembled `array<long>` version column
    * (e.g. a stored version vector). Same integral-only contract.
    */
  def latestVector(payload: Column, versionArray: Column): Column =
    GraftSqlShim.column(LatestBy(
      GraftSqlShim.expression(payload),
      Cast(GraftSqlShim.expression(versionArray),
        ArrayType(LongType, containsNull = true))).toAggregateExpression())
}
