package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.ext.Dedup

/** `minhash_sigs(hashes)` — the full MinHash signature (all `numHashes`
  * permutation minima) of a hashed-shingle array in ONE pass, as a
  * native Catalyst expression with codegen.
  *
  * Why it exists: the HOF formulation
  * `transform(sequence(0, n-1), i -> array_min(transform(sh, h -> perm(h, i))))`
  * is interpreted — no whole-stage codegen, no CSE, a lambda dispatch
  * per (permutation × shingle) with a literal-array `element_at`
  * coefficient lookup each time. The signature build is the dominant
  * map-side cost of every MinHash dedup stage (it touches every shingle
  * of every document 32×). This loop is numHashes·|shingles| long
  * multiply-mod operations on primitive arrays.
  *
  * Semantics are bit-identical to [[Dedup.minhashFromHashesHof]]: same
  * [[Dedup.minhashA]]/[[Dedup.minhashB]] coefficients, h_i(x) =
  * (a_i · (x mod p) + b_i) mod p over p = 2^31-1, min per slot
  * (`pmod` parity: inputs are 48-bit non-negative, every intermediate
  * stays < 2^62 and non-negative, so `%` == `pmod`). Empty input →
  * all-null slots (what `array_min` of an empty array yields in the HOF
  * formulation); null input → null.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0 && numHashes <= Dedup.MaxPerms,
    s"numHashes must be in 1..${Dedup.MaxPerms}, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {

  private val P = Dedup.P31
  private val A: Array[Long] = Dedup.minhashA.toArray
  private val B: Array[Long] = Dedup.minhashB.toArray

  /** Shared by interpreted eval and generated code. Null elements are
    * skipped, matching `array_min`'s null handling in the HOF spec; a
    * slot with no non-null inputs is null (what `array_min` of an
    * empty/all-null array yields).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = A(i)
      val b = B(i)
      var mn = Long.MaxValue
      var seen = false
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          seen = true
          val xm = arr.getLong(j) % P
          val xp = if (xm < 0) xm + P else xm
          val v = (a * xp + b) % P
          if (v < mn) mn = v
        }
        j += 1
      }
      out(i) = if (seen) mn else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point; the cast pins the array<long> contract. */
  def sigs(hashes: Column, numHashes: Int): Column =
    GraftSqlShim.column(MinHashSig(
      GraftSqlShim.expression(hashes.cast("array<long>")), numHashes))

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[MinHashSig].getName, "minhash_sigs")

  /** SQL builder: `minhash_sigs(hashes, k)` with a literal `k` —
    * the same array<long> cast as the Column path.
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(h, k) =>
      val kv = k match {
        case org.apache.spark.sql.catalyst.expressions
          .Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions
          .Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"minhash_sigs: k must be an integer literal, got $other")
      }
      MinHashSig(org.apache.spark.sql.catalyst.expressions.Cast(
        h, ArrayType(LongType)), kv)
    case other => throw new IllegalArgumentException(
      s"minhash_sigs expects 2 arguments, got ${other.size}")
  }
}
