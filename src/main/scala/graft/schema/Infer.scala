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
    // hostile-name armor: re-bind every column to a synthetic positional
    // name first. Raw field names would otherwise enter col()'s
    // attribute-name parser (a stray backtick throws) or — worse — a
    // selectExpr string; after the rename they appear only as `lit`
    // labels in the output, which no parser ever sees.
    val safe = df.toDF(cols.indices.map(i => s"__c$i"): _*)
    def sc(i: Int): Column = col(s"__c$i")
    val melted = safe.select(explode(array(cols.zipWithIndex.map {
        case (f, i) => struct(lit(f.name).as("field"),
          sc(i).cast("string").as("value")) }: _*)).as("kv"))
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
      // typed struct+explode melt over the same synthetic names — field
      // names enter only as `lit` labels, never parsed text
      val numIdx = cols.zipWithIndex.filter { case (f, _) =>
        isNumeric(f.dataType) }
      val aggs = numIdx.zipWithIndex.map { case ((f, ci), ai) =>
        struct(lit(f.name).as("field"),
          min(sc(ci)).cast("double").as("min_value"),
          max(sc(ci)).cast("double").as("max_value")).as(s"__mm_$ai")
      }
      val mm = safe.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(numIdx.indices.map(i =>
          col(s"__mm_$i")): _*)).as("mm"))
        .select("mm.*")
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
    // a zero-row table melts to zero groups — no evidence to infer from;
    // fail with intent instead of a bare NoSuchElementException
    require(rows.nonEmpty,
      "cannot infer a schema from a zero-row table: no value evidence")
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

  /** One evolution finding between two schema descriptors. `breaking`
    * means data valid under `before` can be INVALID (or differently
    * typed) under `after`: removals, type changes, and every
    * constraint TIGHTENING; additions of optional fields and
    * loosenings are compatible.
    */
  final case class SchemaChange(
      field: String, change: String, before: Option[String],
      after: Option[String], breaking: Boolean)

  /** Descriptor diff — the schema-evolution review that gates a
    * producer's new drop before data ever moves (driver-side: pure
    * descriptor comparison, no Spark job — same tier as S1/H1).
    */
  def schemaDiff(before: TableSchema, after: TableSchema): Seq[SchemaChange] = {
    val b = before.fields.map(f => f.name -> f).toMap
    val a = after.fields.map(f => f.name -> f).toMap
    val removed = before.fields.filterNot(f => a.contains(f.name)).map(f =>
      SchemaChange(f.name, "field-removed", Some(f.ftype), None,
        breaking = true))
    val added = after.fields.filterNot(f => b.contains(f.name)).map { f =>
      val req = f.constraints.required.contains(true)
      SchemaChange(f.name, "field-added", None, Some(f.ftype),
        // a new REQUIRED field rejects every existing row
        breaking = req)
    }
    val common = before.fields.map(_.name).filter(a.contains)
    val changed = common.flatMap { n =>
      val (fb, fa) = (b(n), a(n))
      val typeCh =
        if (fb.ftype != fa.ftype)
          Seq(SchemaChange(n, "type-changed", Some(fb.ftype),
            Some(fa.ftype), breaking = true))
        else Nil
      val (cb, ca) = (fb.constraints, fa.constraints)
      def flag(name: String, bv: Option[String], av: Option[String],
          tightened: Boolean): Option[SchemaChange] =
        if (bv == av) None
        else Some(SchemaChange(n, name, bv, av, breaking = tightened))
      val boolTight = (bv: Option[Boolean], av: Option[Boolean]) =>
        av.contains(true) && !bv.contains(true)
      typeCh ++ Seq(
        flag("required-changed", cb.required.map(_.toString),
          ca.required.map(_.toString), boolTight(cb.required, ca.required)),
        flag("unique-changed", cb.unique.map(_.toString),
          ca.unique.map(_.toString), boolTight(cb.unique, ca.unique)),
        // bound changes: tightening = a new bound appears or narrows;
        // numeric compare when both parse, else any change is breaking
        flag("minimum-changed", cb.minimum, ca.minimum,
          tighterBound(cb.minimum, ca.minimum, raising = true)),
        flag("maximum-changed", cb.maximum, ca.maximum,
          tighterBound(cb.maximum, ca.maximum, raising = false)),
        flag("enum-changed", cb.enum.map(_.mkString(",")),
          ca.enum.map(_.mkString(",")),
          // breaking unless the new enum is absent or a superset
          ca.enum.isDefined && !cb.enum.forall(old =>
            ca.enum.exists(nw => old.toSet.subsetOf(nw.toSet)))),
        flag("pattern-changed", cb.pattern, ca.pattern,
          ca.pattern.isDefined)
      ).flatten
    }
    removed ++ added ++ changed
  }

  /** Is `after` a tighter bound than `before`? (`raising`: minimums
    * tighten upward, maximums downward.) Unparseable bounds are
    * conservatively breaking on any change.
    */
  private def tighterBound(before: Option[String], after: Option[String],
      raising: Boolean): Boolean = (before, after) match {
    case (_, None) => false // bound dropped = loosened
    case (None, Some(_)) => true // bound introduced = tightened
    case (Some(bs), Some(as_)) =>
      (bs.toDoubleOption, as_.toDoubleOption) match {
        case (Some(bd), Some(ad)) => if (raising) ad > bd else ad < bd
        case _ => true
      }
  }
}
