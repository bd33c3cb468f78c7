package graft.schema

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, Validate}

class InferSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 10.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
    (2L, "b", -1.25, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
    (3L, "a", 99.0, null.asInstanceOf[java.sql.Timestamp])
  ).toDF("id", "tag", "score", "at")

  test("inferReport derives types, verdicts, enums, and bounds") {
    val rep = Infer.inferReport(sample).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep("id").getString(1) === "integer")
    assert(rep("tag").getString(1) === "string")
    assert(rep("score").getString(1) === "number")
    assert(rep("at").getString(1) === "datetime")
    assert(rep("id").getBoolean(5) && rep("id").getBoolean(6)) // req+uniq
    assert(!rep("at").getBoolean(5))  // has a null
    assert(!rep("tag").getBoolean(6)) // duplicate 'a'
    assert(rep("tag").getString(7) === "a,b")
    assert(rep("score").getDouble(8) === -1.25)
    assert(rep("score").getDouble(9) === 99.0)
    assert(rep("tag").isNullAt(8))
  }

  test("inferSchema builds constraints only where the evidence holds") {
    val ts = Infer.inferSchema(sample)
    assert(ts.fieldNames === Seq("id", "tag", "score", "at"))
    val id = ts.field("id").get
    assert(id.ftype === "integer")
    assert(id.constraints.required.contains(true))
    assert(id.constraints.unique.contains(true))
    assert(id.constraints.minimum.contains("1")) // integer rendering
    assert(id.constraints.maximum.contains("3"))
    val tag = ts.field("tag").get
    assert(tag.constraints.enum.contains(Seq("a", "b")))
    assert(tag.constraints.unique.isEmpty)
    val at = ts.field("at").get
    assert(at.constraints.required.isEmpty)
    assert(at.constraints.minimum.isEmpty) // bounds are numeric-only
  }

  test("schemaDiff classifies breaking vs compatible evolution") {
    import Infer.{schemaDiff, SchemaChange}
    val v1 = TableSchema(Seq(
      Field("id", "integer",
        constraints = Constraints(minimum = Some("0"))),
      Field("name", "string",
        constraints = Constraints(enum = Some(Seq("a", "b")))),
      Field("legacy", "string")))
    val v2 = TableSchema(Seq(
      Field("id", "integer",
        constraints = Constraints(minimum = Some("1"))), // raised = tighter
      Field("name", "string",
        constraints = Constraints(enum = Some(Seq("a", "b", "c")))),
      Field("note", "string"), // optional add = compatible
      Field("score", "number",
        constraints = Constraints(required = Some(true))))) // required add
    val d = schemaDiff(v1, v2).map(c => (c.field, c.change) -> c).toMap
    assert(d(("legacy", "field-removed")).breaking)
    assert(!d(("note", "field-added")).breaking)
    assert(d(("score", "field-added")).breaking)
    assert(d(("id", "minimum-changed")).breaking)
    assert(!d(("name", "enum-changed")).breaking) // superset = compatible
    // loosening back is compatible; identical schemas diff to nothing
    assert(schemaDiff(v2, v2).isEmpty)
    val loosened = schemaDiff(
      TableSchema(Seq(Field("id", "integer",
        constraints = Constraints(minimum = Some("5"))))),
      TableSchema(Seq(Field("id", "integer"))))
    assert(loosened === Seq(SchemaChange("id", "minimum-changed",
      Some("5"), None, breaking = false)))
    // type change is breaking
    assert(schemaDiff(
      TableSchema(Seq(Field("id", "integer"))),
      TableSchema(Seq(Field("id", "string"))))
      .exists(c => c.change == "type-changed" && c.breaking))
  }

  test("inferSchema on a zero-row table fails with a clear message") {
    val ex = intercept[IllegalArgumentException] {
      Infer.inferSchema(sample.where(lit(false)))
    }
    assert(ex.getMessage.contains("zero-row"))
  }

  test("numeric bounds survive hostile column names (quotes/backticks)") {
    // the bounds melt is typed struct+explode — names never enter
    // parsed SQL text, so quote/backtick names label rows correctly
    val hostile = Seq((1L, 5.0), (2L, 7.0))
      .toDF("it's`bad`", "plain")
    val rep = Infer.inferReport(hostile).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep("it's`bad`").getDouble(8) === 1.0)
    assert(rep("it's`bad`").getDouble(9) === 2.0)
    assert(rep("plain").getDouble(8) === 5.0)
    assert(rep("plain").getDouble(9) === 7.0)
  }

  test("validate() against the inferred schema passes on the source table") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ts = Infer.inferSchema(docs)
    val pkg = Package("inferred",
      Seq(Resource("documents", "documents.parquet", ts)))
    val report = Validate.validateTyped(Map("documents" -> docs), pkg)
    val errors = Validate.reportDF(spark, report)
      .filter(col("violations") > 0)
    assert(errors.count() === 0,
      "inference is evidence from the data — validating the same data " +
        "against it must be clean")
  }
}
