package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own bloom-filter expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair the engine
  * injects for runtime row-level join filtering (Spark does not register
  * them as SQL functions, so the library exposes them for explicit use).
  *
  * Why a bloom and not a set: the aggregate's state is `numBits` bits
  * REGARDLESS of input cardinality — a mergeable, constant-size summary
  * (map-side partials OR their bit-vectors together), so a membership
  * screen over billions of keys broadcasts megabytes, not the key set.
  * The price is false positives (rate set by numBits / estimatedItems);
  * there are NO false negatives, so a bloom screen composes with an
  * exact verification join into an exact result — the screen only
  * shrinks the probe side that reaches the join.
  */
object Bloom {

  /** Aggregate a long column into a serialized bloom filter (binary).
    * `estimatedItems` sizes the hash count (overshooting is safe — the
    * false-positive rate just lands below target); `numBits` is the
    * filter size and broadcast payload: 8 MB per 2^26 bits.
    */
  def agg(c: Column, estimatedItems: Long, numBits: Long): Column =
    GraftSqlShim.column(new BloomFilterAggregate(
      GraftSqlShim.expression(c),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a long column against a collected filter. The
    * filter rides the plan as a binary literal (the expression requires
    * a constant or scalar subquery — an attribute is rejected), i.e. it
    * ships to executors once per stage like a broadcast var. A null
    * filter (empty build side) yields null → filters everything: the
    * correct screen for "nothing was inserted".
    */
  def mightContain(filter: Array[Byte], c: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(filter, BinaryType), GraftSqlShim.expression(c)))
}
