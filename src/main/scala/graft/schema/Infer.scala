package graft.schema

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.BoundedDistinct

/** Schema inference — the `describe`/`infer` workflow of the reference's
  * ecosystem (frictionless `infer`): derive a Table Schema descriptor,
  * with constraints, from a typed table. The complement of validation:
  * validate() checks data against a declared schema; infer() proposes
  * the declaration a maintainer then curates.
  *
  * Scale design (100 TB lens):
  *  - ONE melted scan covers every column's null/distinct/enum facts:
  *    rows explode to (field, value-as-string) pairs — narrow, no
  *    shuffle until the |columns|-key aggregate, whose per-group state
  *    is O(1) counters plus the O(enumThreshold) bounded-distinct
  *    buffer. The exact `countDistinct` is the one unbounded-state
  *    aggregate (needed for the `unique` verdict); swap-in
  *    approx_count_distinct is the knob if a column's cardinality ever
  *    dominates (same tradeoff as [[graft.ext.Profile]]);
  *  - numeric min/max ride a second narrow scan (one agg row, stacked)
  *    because string min/max would order lexicographically;
  *  - the report is |columns| rows at any scale; [[inferSchema]]
  *    collects only that.
  */
object Infer {

  /** Table Schema `type` for a Spark SQL type. */
  def ftypeOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType => "number"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "datetime"
    case _: TimestampNTZType => "datetime"
    case _: ArrayType => "array"
    case _: MapType | _: StructType => "object"
    case _ => "string"
  }

  private def boundedDistinctCol(c: Column, k: Int): Column =
    GraftSqlShim.column(BoundedDistinct(GraftSqlShim.expression(c), k)
      .toAggregateExpression())

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Per-column inference facts, oracle-comparable: (field, ftype,
    * n_rows, n_nulls, n_distinct, required, unique, enum_csv,
    * min_value, max_value). `enum_csv` is the sorted distinct values
    * joined by "," when a column has ≤ `enumThreshold` of them;
    * min/max are doubles for numeric columns, null otherwise.
    * (CSV is the cross-engine-comparable rendering; a string enum whose
    * VALUES contain commas would round-trip ambiguously through
    * [[inferSchema]] — curate such schemas by hand.)
    */
  def inferReport(df: DataFrame, enumThreshold: Int = 8): DataFrame = {
    require(enumThreshold > 0, "need enumThreshold > 0")
    val cols = df.schema.fields.toSeq
    require(cols.nonEmpty, "cannot infer an empty schema")
    val melted = df.select(explode(array(cols.map(f =>
        struct(lit(f.name).as("field"),
          col(f.name).cast("string").as("value"))): _*)).as("kv"))
      .select("kv.*")
    val typeMap = map(cols.flatMap(f =>
      Seq(lit(f.name), lit(ftypeOf(f.dataType)))): _*)
    val rep = melted.groupBy("field").agg(
        count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, 1)).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"),
        boundedDistinctCol(col("value"), enumThreshold + 1).as("__vals"))
      .select(col("field"),
        element_at(typeMap, col("field")).as("ftype"),
        col("n_rows"), col("n_nulls"), col("n_distinct"),
        (col("n_nulls") === 0).as("required"),
        (col("n_nulls") === 0 && col("n_distinct") === col("n_rows"))
          .as("unique"),
        when(col("n_distinct") <= enumThreshold,
          array_join(col("__vals"), ",")).as("enum_csv"))
    val numCols = cols.filter(f => isNumeric(f.dataType))
    if (numCols.isEmpty)
      rep.withColumn("min_value", lit(null).cast("double"))
        .withColumn("max_value", lit(null).cast("double"))
    else {
      val aggs = numCols.flatMap(f => Seq(
        min(col(f.name)).cast("double").as(s"${f.name}__mn"),
        max(col(f.name)).cast("double").as(s"${f.name}__mx")))
      val stackArgs = numCols
        .map(f => s"'${f.name}', `${f.name}__mn`, `${f.name}__mx`")
        .mkString(", ")
      val mm = df.agg(aggs.head, aggs.tail: _*).selectExpr(
        s"stack(${numCols.size}, $stackArgs) " +
          "AS (field, min_value, max_value)")
      rep.join(broadcast(mm), Seq("field"), "left_outer")
    }
  }

  /** Assemble a curated-ready [[TableSchema]] from [[inferReport]]:
    * field order preserved from the DataFrame, `required`/`unique`
    * constraints only when the evidence holds, `enum` only for string
    * fields under the threshold, numeric bounds rendered integrally
    * for integer fields. Inference is EVIDENCE, not truth — bounds and
    * enums reflect the data seen, which is why validate() against the
    * inferred schema always passes on the inferring table (asserted in
    * InferSpec).
    */
  def inferSchema(df: DataFrame, enumThreshold: Int = 8): TableSchema = {
    val rows = inferReport(df, enumThreshold).collect()
      .map(r => r.getString(0) -> r).toMap
    val fields = df.schema.fields.toSeq.map { f =>
      val r = rows(f.name)
      val ftype = r.getString(1)
      val required = r.getBoolean(5)
      val unique = r.getBoolean(6)
      val enumCsv = if (r.isNullAt(7)) None else Some(r.getString(7))
      def dbl(i: Int): Option[Double] =
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      def renderBound(v: Double): String =
        if (ftype == "integer") v.toLong.toString else v.toString
      Field(
        name = f.name,
        ftype = ftype,
        constraints = Constraints(
          required = if (required) Some(true) else None,
          unique = if (unique) Some(true) else None,
          minimum = if (isNumeric(f.dataType)) dbl(8).map(renderBound)
            else None,
          maximum = if (isNumeric(f.dataType)) dbl(9).map(renderBound)
            else None,
          enum = if (ftype == "string") enumCsv.map(_.split(",").toSeq)
            else None))
    }
    TableSchema(fields = fields)
  }
}
