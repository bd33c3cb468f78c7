package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.check.Checks
import graft.parse.Parsers
import graft.schema.{Constraints, Field}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (parsers P1–P9, constraints C1–C8,
  * keys K1–K3) plus the §7.6 extensions gets a `queries` entry over the
  * harness parquet tables and, when SQL-expressible, a DuckDB `oracleSql`
  * twin. Queries are written non-empty on clean data (checks run against
  * deliberately degraded views where the real check would trivially pass)
  * and deterministic (explicit ORDER BY; aggregate/computed columns
  * aliased identically in Spark and SQL).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full E1 validation of the star-schema package — one row per
    * executed check (SURVEY.md §3 E1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val report = Validate.validateTyped(
      Tables.loadAll(spark, dir), Tables.starSchema)
    Validate.reportDF(spark, report)
  }

  // ------------------------------------------------------------------ keys
  /** K1: primary-key uniqueness on lineitem (l_orderkey, l_linenumber) —
    * clean data, so the violation set is empty (schema-only compare).
    */
  private def k1PkLineitem(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val v = Checks.unique(li, Seq("l_orderkey", "l_linenumber"))
    v.select(col("l_orderkey"), col("l_linenumber").cast(LongType)
      .as("l_linenumber"), col("cnt"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** K1 degraded: collapse the line number to its parity so duplicate key
    * tuples actually exist — exercises the duplicate-detection path.
    */
  private def k1PkDegraded(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("l_parity", (col("l_linenumber") % 2).cast(LongType))
    Checks.unique(li, Seq("l_orderkey", "l_parity"))
      .orderBy("l_orderkey", "l_parity")
  }

  /** C2/K2: `unique` on orders.o_custkey — customers order repeatedly, so
    * duplicates exist; distinct duplicated values + counts.
    */
  private def c2UniqueCustkey(s: SparkSession, dir: String): DataFrame =
    Checks.unique(t(s, dir, "orders"), Seq("o_custkey"))
      .orderBy("o_custkey")

  /** K3: foreign key orders.o_custkey → customer.c_custkey against a
    * degraded parent (every 10th customer dropped) — orphan keys + counts.
    * The parent side is distinct-projected and broadcast (dimension).
    */
  private def k3FkOrdersCustomer(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val parent = t(s, dir, "customer").filter(col("c_custkey") % 10 =!= 0)
    Checks.foreignKey(orders, Seq("o_custkey"), broadcast(parent),
      Seq("c_custkey")).orderBy("o_custkey")
  }

  /** K3 composite+clean: lineitem (l_orderkey) ⊆ orders — empty result. */
  private def k3FkLineitemOrders(s: SparkSession, dir: String): DataFrame =
    Checks.foreignKey(t(s, dir, "lineitem"), Seq("l_orderkey"),
      t(s, dir, "orders"), Seq("o_orderkey")).orderBy("l_orderkey")

  // ------------------------------------------------------------ constraints
  /** C1 required, degraded: treat '4-NOT SPECIFIED' as a missing token on
    * o_orderpriority, then count nulls (missing-token substitution + C1).
    */
  private def c1Required(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cleaned = o.withColumn("o_orderpriority",
      Parsers.applyMissing(col("o_orderpriority"), Seq("4-NOT SPECIFIED")))
    Checks.required(cleaned, "o_orderpriority")
  }

  /** C3/C4 length bounds on part.p_name (7..12 chars in the data). */
  private def c3MinLength(s: SparkSession, dir: String): DataFrame =
    Checks.minLength(t(s, dir, "part"), "p_name", 9).orderBy("p_name")

  private def c4MaxLength(s: SparkSession, dir: String): DataFrame =
    Checks.maxLength(t(s, dir, "part"), "p_name", 10).orderBy("p_name")

  /** C5 minimum on l_quantity (typed compare): violations of minimum=10. */
  private def c5Minimum(s: SparkSession, dir: String): DataFrame =
    Checks.minimum(t(s, dir, "lineitem"), "l_quantity", lit(10.0))
      .orderBy("l_quantity")

  /** C6 maximum on l_discount: violations of maximum=0.05. */
  private def c6Maximum(s: SparkSession, dir: String): DataFrame =
    Checks.maximum(t(s, dir, "lineitem"), "l_discount", lit(0.05))
      .orderBy("l_discount")

  /** C7 pattern (anchored full-match): '4-NOT SPECIFIED' fails
    * `[1-5]-[A-Z]+` because of the space — anchoring + dialect per
    * SURVEY.md §7.5.
    */
  private def c7Pattern(s: SparkSession, dir: String): DataFrame =
    Checks.patternCheck(t(s, dir, "orders"), "o_orderpriority",
      "[1-5]-[A-Z]+").orderBy("o_orderpriority")

  /** C8 enum: l_returnflag ∈ {A, N} — 'R' rows are the violations. */
  private def c8Enum(s: SparkSession, dir: String): DataFrame =
    Checks.enumCheck(t(s, dir, "lineitem"), "l_returnflag", Seq("A", "N"))
      .orderBy("l_returnflag")

  // ------------------------------------------------------------------ parse
  /** P3 integer: strict regex gate (rejects '1e3', 'x12') then cast. */
  private def p3Integer(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val raw = when(col("l_linenumber") % 3 === 0,
      col("l_orderkey").cast(StringType))
      .when(col("l_linenumber") % 3 === 1, lit("1e3"))
      .otherwise(lit("x12"))
    val f = Field("raw", "integer")
    li.select(raw.as("raw"))
      .select(col("raw"), Parsers.parseExpr(f, col("raw")).as("parsed"))
      .distinct()
      .orderBy("raw")
  }

  /** P4 boolean with custom true/falseValues over o_orderstatus
    * (trueValues=[O], falseValues=[F]; 'P' is invalid → null).
    */
  private def p4Boolean(s: SparkSession, dir: String): DataFrame = {
    val f = Field("o_orderstatus", "boolean",
      trueValues = Seq("O"), falseValues = Seq("F"))
    val o = t(s, dir, "orders")
    o.select(col("o_orderstatus").as("raw"),
        Parsers.parseExpr(f, col("o_orderstatus")).as("parsed"),
        Parsers.invalidExpr(f, col("o_orderstatus")).as("invalid"))
      .groupBy("raw", "parsed", "invalid")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("raw")
  }

  // -------------------------------------------------------------- registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k1_pk_lineitem" -> (k1PkLineitem _),
    "k1_pk_degraded" -> (k1PkDegraded _),
    "c2_unique_custkey" -> (c2UniqueCustkey _),
    "k3_fk_orders_customer" -> (k3FkOrdersCustomer _),
    "k3_fk_lineitem_orders" -> (k3FkLineitemOrders _),
    "c1_required" -> (c1Required _),
    "c3_minlength" -> (c3MinLength _),
    "c4_maxlength" -> (c4MaxLength _),
    "c5_minimum" -> (c5Minimum _),
    "c6_maximum" -> (c6Maximum _),
    "c7_pattern" -> (c7Pattern _),
    "c8_enum" -> (c8Enum _),
    "p3_integer" -> (p3Integer _),
    "p4_boolean" -> (p4Boolean _)
  )

  /** DuckDB twins of `queries` — identical column names and ordering. */
  def oracleSql: Map[String, String] = Map(
    "k1_pk_lineitem" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |count(*) AS cnt FROM lineitem
        |GROUP BY 1,2 HAVING count(*) > 1 ORDER BY 1,2""".stripMargin,
    "k1_pk_degraded" ->
      """SELECT l_orderkey, CAST(l_linenumber % 2 AS BIGINT) AS l_parity,
        |count(*) AS cnt FROM lineitem
        |GROUP BY 1,2 HAVING count(*) > 1 ORDER BY 1,2""".stripMargin,
    "c2_unique_custkey" ->
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |WHERE o_custkey IS NOT NULL
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "k3_fk_orders_customer" ->
      """SELECT o.o_custkey, count(*) AS cnt FROM orders o
        |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |           WHERE c_custkey % 10 <> 0) c
        |ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k3_fk_lineitem_orders" ->
      """SELECT l.l_orderkey, count(*) AS cnt FROM lineitem l
        |LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c1_required" ->
      """SELECT count(*) AS violations FROM orders
        |WHERE o_orderpriority = '4-NOT SPECIFIED'""".stripMargin,
    "c3_minlength" ->
      """SELECT p_name, count(*) AS cnt FROM part
        |WHERE p_name IS NOT NULL AND length(p_name) < 9
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c4_maxlength" ->
      """SELECT p_name, count(*) AS cnt FROM part
        |WHERE p_name IS NOT NULL AND length(p_name) > 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c5_minimum" ->
      """SELECT l_quantity, count(*) AS cnt FROM lineitem
        |WHERE l_quantity IS NOT NULL AND l_quantity < 10.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c6_maximum" ->
      """SELECT l_discount, count(*) AS cnt FROM lineitem
        |WHERE l_discount IS NOT NULL AND l_discount > 0.05
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c7_pattern" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE o_orderpriority IS NOT NULL
        |  AND NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z]+')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c8_enum" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p3_integer" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '[+-]?[0-9]+')
        |       THEN CAST(raw AS BIGINT) END AS parsed
        |FROM (SELECT CASE
        |        WHEN l_linenumber % 3 = 0 THEN CAST(l_orderkey AS VARCHAR)
        |        WHEN l_linenumber % 3 = 1 THEN '1e3'
        |        ELSE 'x12' END AS raw FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p4_boolean" ->
      """SELECT o_orderstatus AS raw,
        |  CASE WHEN o_orderstatus = 'O' THEN true
        |       WHEN o_orderstatus = 'F' THEN false END AS parsed,
        |  o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F')
        |    AS invalid,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1,2,3 ORDER BY raw""".stripMargin
  )
}
