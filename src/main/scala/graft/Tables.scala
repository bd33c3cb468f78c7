package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.schema._

/** Harness test tables (TESTDATA.md) + the Table Schema descriptors we
  * attach to them (FIXTURES.md §A) so the reference's validation surface
  * runs against real parquet.
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as TIMESTAMP(NANOS) (older testdata drops —
    * Spark's parquet reader rejects it, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[configure]], and
    * the nanos arrive as a long narrowed here with truncating division —
    * the same value DuckDB produces for its µs TIMESTAMP) and as
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (newer drops — Spark
    * infers TIMESTAMP_NTZ, which `unix_micros`/binary ops reject).
    * Both are normalized to a plain µs TIMESTAMP at load so every
    * downstream operator and the DuckDB oracle see one type; the
    * NTZ→LTZ cast reinterprets the naive value in the session zone
    * (UTC in every graft session), leaving the stored micros unchanged.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }

  /** Session configs every graft session needs (nanos parquet reads). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  private def f(name: String, ftype: String = "string",
      constraints: Constraints = Constraints()): Field =
    Field(name = name, ftype = ftype, constraints = constraints)

  /** Descriptors per FIXTURES.md §A — drives §2's operators over the
    * driver's star schema. Types mirror the parquet footers (already
    * typed, so validateTyped skips parsing).
    */
  val starSchema: Package = Package(
    "testdata",
    Seq(
      Resource("region", "region.parquet", TableSchema(
        fields = Seq(
          f("r_regionkey", "integer"),
          f("r_name", constraints = Constraints(unique = Some(true)))),
        primaryKey = Seq("r_regionkey"))),
      Resource("nation", "nation.parquet", TableSchema(
        fields = Seq(
          f("n_nationkey", "integer"),
          f("n_name", constraints =
            Constraints(required = Some(true), unique = Some(true))),
          f("n_regionkey", "integer")),
        primaryKey = Seq("n_nationkey"),
        foreignKeys = Seq(
          ForeignKey(Seq("n_regionkey"), "region", Seq("r_regionkey"))))),
      Resource("customer", "customer.parquet", TableSchema(
        fields = Seq(
          f("c_custkey", "integer"), f("c_name"),
          f("c_nationkey", "integer"),
          f("c_acctbal", "number"), f("c_mktsegment")),
        primaryKey = Seq("c_custkey"),
        foreignKeys = Seq(
          ForeignKey(Seq("c_nationkey"), "nation", Seq("n_nationkey"))))),
      Resource("supplier", "supplier.parquet", TableSchema(
        fields = Seq(
          f("s_suppkey", "integer"), f("s_name"),
          f("s_nationkey", "integer"), f("s_acctbal", "number")),
        primaryKey = Seq("s_suppkey"),
        foreignKeys = Seq(
          ForeignKey(Seq("s_nationkey"), "nation", Seq("n_nationkey"))))),
      Resource("part", "part.parquet", TableSchema(
        fields = Seq(
          f("p_partkey", "integer"), f("p_name"), f("p_brand"), f("p_type"),
          f("p_size", "integer",
            Constraints(minimum = Some("1"))),
          f("p_retailprice", "number",
            Constraints(minimum = Some("0")))),
        primaryKey = Seq("p_partkey"))),
      Resource("orders", "orders.parquet", TableSchema(
        fields = Seq(
          f("o_orderkey", "integer"), f("o_custkey", "integer"),
          f("o_orderstatus", constraints =
            Constraints(enum = Some(Seq("F", "O", "P")))),
          f("o_totalprice", "number", Constraints(minimum = Some("0"))),
          f("o_orderdate", "datetime"),
          f("o_orderpriority", constraints =
            Constraints(pattern = Some("[1-5]-[A-Z ]+")))),
        primaryKey = Seq("o_orderkey"),
        foreignKeys = Seq(
          ForeignKey(Seq("o_custkey"), "customer", Seq("c_custkey"))))),
      Resource("lineitem", "lineitem.parquet", TableSchema(
        fields = Seq(
          f("l_orderkey", "integer"), f("l_partkey", "integer"),
          f("l_suppkey", "integer"), f("l_linenumber", "integer"),
          f("l_quantity", "number", Constraints(minimum = Some("0"))),
          f("l_extendedprice", "number", Constraints(minimum = Some("0"))),
          f("l_discount", "number",
            Constraints(minimum = Some("0"), maximum = Some("1"))),
          f("l_tax", "number"),
          f("l_returnflag", constraints =
            Constraints(enum = Some(Seq("A", "N", "R")))),
          f("l_linestatus", constraints =
            Constraints(enum = Some(Seq("F", "O")))),
          f("l_shipdate", "datetime")),
        primaryKey = Seq("l_orderkey", "l_linenumber"),
        foreignKeys = Seq(
          ForeignKey(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
          ForeignKey(Seq("l_partkey"), "part", Seq("p_partkey")),
          ForeignKey(Seq("l_suppkey"), "supplier", Seq("s_suppkey"))))),
      Resource("events", "events.parquet", TableSchema(
        fields = Seq(
          f("event_id", "integer"),
          f("ts", "datetime", Constraints(required = Some(true))),
          f("user_id", "integer"),
          f("event_type", constraints = Constraints(required = Some(true))),
          f("value", "number"), f("props")),
        primaryKey = Seq("event_id"))),
      Resource("documents", "documents.parquet", TableSchema(
        fields = Seq(
          f("doc_id", "integer"), f("text"),
          f("lang", constraints =
            Constraints(minLength = Some(2), maxLength = Some(2))),
          f("source"),
          f("n_chars", "integer", Constraints(minimum = Some("0")))),
        primaryKey = Seq("doc_id"))),
      Resource("embeddings", "embeddings.parquet", TableSchema(
        fields = Seq(
          f("vec_id", "integer"), f("embedding"),
          f("label", "integer", Constraints(minimum = Some("0")))),
        primaryKey = Seq("vec_id")))
    )
  )
}
