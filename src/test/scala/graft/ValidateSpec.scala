package graft

import java.nio.file.{Files, Paths}

import graft.report.ErrorCodes
import graft.schema._

/** End-to-end E1 on generated CSV datapackages (FIXTURES.md §B3/§B4):
  * clean variant → valid report; broken variant → every error class
  * fires with known offending values. Exercises descriptor JSON, CSV
  * all-string read, missing tokens, parse, constraints, keys, fks,
  * header checks, and the report JSON.
  */
class ValidateSpec extends SparkSpec {

  private val dir = Files.createTempDirectory("graft_fixtures")

  private def write(name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private def pkg(parentCsv: String, childCsv: String): Package = {
    val parent = Resource("parent", write("parent.csv", parentCsv),
      TableSchema(
        fields = Seq(
          Field("id", "integer"),
          Field("code", constraints = Constraints(unique = Some(true),
            pattern = Some("[A-Z]{2}")))),
        primaryKey = Seq("id")))
    val child = Resource("child", write("child.csv", childCsv),
      TableSchema(
        fields = Seq(
          Field("cid", "integer"),
          Field("parent_id", "integer"),
          Field("pair_a", "integer"), Field("pair_b", "integer"),
          Field("qty", "number",
            constraints = Constraints(minimum = Some("0"))),
          Field("flag", "boolean")),
        primaryKey = Seq("cid"),
        uniqueKeys = Seq(Seq("pair_a", "pair_b")),
        foreignKeys = Seq(
          ForeignKey(Seq("parent_id"), "parent", Seq("id")))))
    Package("fixture", Seq(parent, child))
  }

  test("clean datapackage validates") {
    val p = pkg(
      "id,code\n1,AB\n2,CD\n3,EF\n",
      "cid,parent_id,pair_a,pair_b,qty,flag\n" +
        "10,1,1,1,5.5,true\n11,2,1,2,0,false\n12,3,2,1,3,true\n")
    val report = Validate.validateCsv(spark, p)
    assert(report.valid, report.toJson)
    assert(report.errorCount == 0)
  }

  test("broken datapackage: every error class fires once") {
    val p = pkg(
      // duplicate id 2 (pk), duplicate+bad-pattern codes
      "id,code\n1,AB\n2,CD\n2,CD\n3,x\n",
      // orphan parent_id 99, duplicate (pair_a,pair_b), negative qty,
      // unparseable flag 'maybe', missing token '' in parent_id
      "cid,parent_id,pair_a,pair_b,qty,flag\n" +
        "10,1,1,1,5.5,true\n11,99,1,2,-4,false\n12,2,1,1,3,maybe\n" +
        "13,,2,2,1,true\n")
    val r = Validate.validateCsv(spark, p)
    assert(!r.valid)
    val errs = r.tables.flatMap(t => t.errors.filterNot(_.passed)
      .map(e => (t.table, e.code, e.field) -> e)).toMap

    assert(errs.contains(("parent", ErrorCodes.PrimaryKey, "id")))
    assert(errs(("parent", ErrorCodes.PrimaryKey, "id")).violations == 1)
    assert(errs.contains(("parent", ErrorCodes.Unique, "code")))
    assert(errs.contains(("parent", ErrorCodes.Pattern, "code")))
    assert(errs.contains(("child", ErrorCodes.UniqueKey, "pair_a,pair_b")))
    assert(errs.contains(("child", ErrorCodes.Minimum, "qty")))
    val fk = errs.keys.find(_._2 == ErrorCodes.ForeignKey)
    assert(fk.isDefined && fk.get._1 == "child")
    // 'maybe' failed to parse → type-or-format-error with the value
    val tf = errs(("child", ErrorCodes.TypeOrFormat, "flag"))
    assert(tf.violations == 1 && tf.sampleValues == Seq("maybe"))
  }

  test("parse-failed fields are excluded from constraint checks") {
    val p = Package("f", Seq(
      Resource("t", write("t.csv", "a\n1\nzz\n-5\n"),
        TableSchema(Seq(Field("a", "integer",
          constraints = Constraints(minimum = Some("0"))))))))
    val r = Validate.validateCsv(spark, p)
    val codes = r.tables.head.errors.filterNot(_.passed).map(_.code)
    assert(codes.contains(ErrorCodes.TypeOrFormat))
    // minimum check skipped because the field had a parse error
    assert(!codes.contains(ErrorCodes.Minimum))
  }

  test("unbuildable field format reports schema-error, no crash") {
    val p = Package("f", Seq(
      Resource("t", write("se.csv", "a,b\n2026-01-01,5\nbad,6\n"),
        TableSchema(Seq(
          Field("a", "date", format = "%G-%V-%u"), // week-based: rejected
          Field("b", "integer",
            constraints = Constraints(minimum = Some("0"))))))))
    val r = Validate.validateCsv(spark, p)
    val errs = r.tables.head.errors
    val se = errs.find(_.code == ErrorCodes.SchemaError)
    assert(se.isDefined && se.get.field == "a", errs.mkString("; "))
    // the bad field is excluded from checks; the good field still runs
    assert(!errs.exists(e => e.field == "a" &&
      e.code == ErrorCodes.TypeOrFormat))
    assert(errs.exists(e => e.field == "b" && e.code == ErrorCodes.Minimum))
    assert(!r.valid)
  }

  test("header reconciliation codes") {
    val schema = TableSchema(Seq(Field("a"), Field("b"), Field("c")))
    def codes(cols: Seq[String]): Set[String] =
      Validate.headerCheck(cols, schema).map(_.code).toSet
    assert(codes(Seq("a", "b", "c")).isEmpty)
    assert(codes(Seq("a", "b")) == Set("missing-header"))
    assert(codes(Seq("a", "b", "c", "d")) == Set("extra-header"))
    assert(codes(Seq("c", "b", "a")) == Set("non-matching-header"))
    assert(codes(Seq("a", "a", "b", "c")) == Set("duplicate-header"))
    assert(codes(Seq("a", "b", "")) ==
      Set("missing-header", "extra-header", "blank-header"))
  }

  test("descriptor JSON round-trip") {
    val json =
      """{"name":"p","resources":[{"name":"t","path":"t.csv","schema":{
        |"fields":[
        |  {"name":"id","type":"integer","constraints":{"required":true}},
        |  {"name":"amt","type":"number","decimalChar":",","groupChar":".",
        |   "bareNumber":false},
        |  {"name":"flag","type":"boolean","trueValues":["y"],
        |   "falseValues":["n"]}],
        |"primaryKey":"id",
        |"uniqueKeys":[["id","amt"]],
        |"foreignKeys":[{"fields":"id",
        |  "reference":{"resource":"other","fields":"oid"}}],
        |"missingValues":["","NA"]}}]}""".stripMargin
    val p = DescriptorJson.parsePackage(json)
    val s = p.resources.head.schema
    assert(s.primaryKey == Seq("id"))
    assert(s.uniqueKeys == Seq(Seq("id", "amt")))
    assert(s.foreignKeys ==
      Seq(ForeignKey(Seq("id"), "other", Seq("oid"))))
    assert(s.missingValues == Seq("", "NA"))
    val amt = s.field("amt").get
    assert(amt.decimalChar == "," && amt.groupChar == "." &&
      !amt.bareNumber)
    assert(s.field("flag").get.trueValues == Seq("y"))
    assert(s.field("id").get.constraints.required.contains(true))
  }

  test("S3 inline-data resource validates like CSV") {
    val json =
      """{"name":"p","resources":[{"name":"t","schema":{
        |"fields":[{"name":"id","type":"integer"},
        |          {"name":"amt","type":"number",
        |           "constraints":{"minimum":0}}],
        |"primaryKey":"id"},
        |"data":[["id","amt"],["1","5.5"],["2","-3"],["2","1"],["","7"]]
        |}]}""".stripMargin
    val p = DescriptorJson.parsePackage(json)
    assert(p.resources.head.inlineData.get.size == 4)
    val r = Validate.validateCsv(spark, p)
    val errs = r.tables.head.errors.filterNot(_.passed)
      .map(e => e.code -> e.violations).toMap
    assert(errs(ErrorCodes.Minimum) == 1) // -3
    assert(errs(ErrorCodes.PrimaryKey) == 1) // duplicate id 2
    assert(!r.valid)
  }

  test("self-referencing foreign key (resource: \"\")") {
    val json =
      """{"name":"p","resources":[{"name":"emp","schema":{
        |"fields":[{"name":"id","type":"integer"},
        |          {"name":"manager_id","type":"integer"}],
        |"primaryKey":"id",
        |"foreignKeys":[{"fields":"manager_id",
        |  "reference":{"resource":"","fields":"id"}}]},
        |"data":[["id","manager_id"],["1",""],["2","1"],["3","99"]]
        |}]}""".stripMargin
    val r = Validate.validateCsv(spark, DescriptorJson.parsePackage(json))
    val fk = r.tables.head.errors
      .find(_.code == ErrorCodes.ForeignKey).get
    assert(fk.violations == 1) // manager 99 absent; null manager exempt
    assert(fk.sampleValues == Seq("99"))
  }

  test("reordered CSV header binds columns by name, not position") {
    val res = Resource("t", write("reord.csv", "b,a\nBB,1\nCC,2\n"),
      TableSchema(Seq(Field("a", "integer"), Field("b"))))
    val df = Validate.readCsv(spark, res)
    assert(df.columns.toSeq == Seq("a", "b"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("1", "BB"), ("2", "CC")))
    // the order mismatch is still reported as a header error
    assert(Validate.headerCheck(Validate.actualCsvHeader(spark, res),
      res.schema).map(_.code) == Seq("non-matching-header"))
  }

  test("csv dialect: delimiter, quoteChar, headerless") {
    val res = Resource("t", write("semi.csv", "a;b\n'x;y';2\n"),
      TableSchema(Seq(Field("a"), Field("b", "integer"))),
      dialect = Dialect(delimiter = ";", quoteChar = "'"))
    val r = Validate.readCsv(spark, res).collect()(0)
    assert(r.getString(0) == "x;y" && r.getString(1) == "2")
    val hres = Resource("t2", write("nohdr.csv", "1,foo\n2,bar\n"),
      TableSchema(Seq(Field("id", "integer"), Field("v"))),
      dialect = Dialect(header = false))
    assert(Validate.readCsv(spark, hres).count() == 2)
  }

  test("csv dialect: RFC 4180 doubled quotes (spec default)") {
    val res = Resource("t", write("dq.csv",
      "a,b\n\"he said \"\"hi\"\", twice\",2\nplain,3\n"),
      TableSchema(Seq(Field("a"), Field("b", "integer"))))
    val rows = Validate.readCsv(spark, res).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("he said \"hi\", twice", "2"), ("plain", "3")))
  }

  test("csv dialect: escapeChar (mutually exclusive with doubleQuote)") {
    val res = Resource("t", write("esc.csv",
      "a,b\n\"he said \\\"hi\\\"\",2\n"),
      TableSchema(Seq(Field("a"), Field("b", "integer"))),
      dialect = Dialect(escapeChar = Some("\\")))
    val r = Validate.readCsv(spark, res).collect()(0)
    assert(r.getString(0) == "he said \"hi\"" && r.getString(1) == "2")
  }

  test("csv dialect: commentChar skips comment lines") {
    val res = Resource("t", write("com.csv",
      "a,b\n# a comment line\n1,x\n#another\n2,y\n"),
      TableSchema(Seq(Field("a", "integer"), Field("b"))),
      dialect = Dialect(commentChar = Some("#")))
    val rows = Validate.readCsv(spark, res).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("1", "x"), ("2", "y")))
  }

  test("csv dialect: skipInitialSpace strips post-delimiter whitespace") {
    val res = Resource("t", write("sis.csv", "a,b\n1,  x\n2, y\n"),
      TableSchema(Seq(Field("a", "integer"), Field("b"))),
      dialect = Dialect(skipInitialSpace = true))
    val rows = Validate.readCsv(spark, res).collect()
      .map(_.getString(1)).toSeq
    assert(rows == Seq("x", "y"))
  }

  test("quoted header cell containing the delimiter parses as ONE name") {
    // a bare split on ',' would shred "a,x" apart and misreport headers
    val res = Resource("t", write("qh.csv", "\"a,x\",b\n1,2\n"),
      TableSchema(Seq(Field("a,x", "integer"), Field("b", "integer"))))
    assert(Validate.actualCsvHeader(spark, res) == Seq("a,x", "b"))
    assert(Validate.headerCheck(Validate.actualCsvHeader(spark, res),
      res.schema).isEmpty)
    val r = Validate.readCsv(spark, res).collect()(0)
    assert(r.getString(0) == "1" && r.getString(1) == "2")
  }

  test("dialect descriptor JSON parses all spec fields") {
    val json =
      """{"name":"p","resources":[{"name":"t","path":"t.csv",
        |"dialect":{"delimiter":";","quoteChar":"'","header":false,
        |  "doubleQuote":false,"escapeChar":"\\","lineTerminator":"\n",
        |  "skipInitialSpace":true,"commentChar":"#"},
        |"schema":{"fields":[{"name":"a"}]}}]}""".stripMargin
    val d = DescriptorJson.parsePackage(json).resources.head.dialect
    assert(d == Dialect(delimiter = ";", quoteChar = "'", header = false,
      doubleQuote = false, escapeChar = Some("\\"),
      lineTerminator = "\n", skipInitialSpace = true,
      commentChar = Some("#")))
  }

  test("multi-path resource concatenates chunks") {
    val p1 = write("chunk1.csv", "a\n1\n2\n")
    val p2 = write("chunk2.csv", "a\n3\n")
    val res = Resource("t", p1, TableSchema(Seq(Field("a", "integer"))),
      paths = Seq(p1, p2))
    assert(Validate.readCsv(spark, res).count() == 3)
    val json =
      """{"name":"p","resources":[{"name":"t","path":["x.csv","y.csv"],
        |"schema":{"fields":[{"name":"a"}]}}]}""".stripMargin
    val parsed = DescriptorJson.parsePackage(json).resources.head
    assert(parsed.allPaths == Seq("x.csv", "y.csv"))
  }

  test("Graft.validate: reference-shaped entry point from datapackage.json") {
    write("gv.csv", "id,code\n1,AB\n2,CD\n2,EF\n")
    val descriptor =
      """{"name":"gp","resources":[{"name":"t","path":"gv.csv","schema":{
        |"fields":[{"name":"id","type":"integer"},{"name":"code"}],
        |"primaryKey":"id"}}]}""".stripMargin
    val dp = write("datapackage.json", descriptor)
    val r = Graft.validate(spark, dp) // relative path resolved vs descriptor
    assert(!r.valid)
    assert(r.tables.head.errors.exists(e =>
      e.code == report.ErrorCodes.PrimaryKey && e.violations == 1))
  }

  test("report JSON shape") {
    val p = pkg("id,code\n1,AB\n1,AB\n",
      "cid,parent_id,pair_a,pair_b,qty,flag\n10,1,1,1,1,true\n")
    val r = Validate.validateCsv(spark, p)
    val json = r.toJson
    assert(json.contains("\"valid\":false"))
    assert(json.contains(ErrorCodes.PrimaryKey))
  }

  test("CSV fixture round-trip reproduces the typed validation verdicts") {
    // the bench's e2e_validate_csv path: parquet → CSV twin →
    // all-string read → parse → check must land on the same violation
    // counts as validating the typed parquet directly (and add no
    // parse casualties on the way)
    val dir = "/root/testdata/sf0.001"
    val csvPkg = graft.sources.CsvFixture.ensure(spark, dir,
      outBase = java.nio.file.Files
        .createTempDirectory("csv_fixture_spec").toString)
    val csvReport = Validate.validateCsv(spark, csvPkg)
    val typedTables = Tables.loadAll(spark, dir)
    val typed = Validate.validateTyped(typedTables, Tables.starSchema)
    def key(r: graft.report.CheckResult) = (r.table, r.code, r.field)
    val csvRows = csvReport.tables.flatMap(_.errors)
    // no row failed to parse: every type-error/parse row counts zero
    val parseCodes = csvRows.filter(_.code.contains("type")).map(_.violations)
    assert(parseCodes.forall(_ == 0L),
      s"CSV round-trip lost rows to parsing: ${csvRows.filter(r =>
        r.code.contains("type") && r.violations > 0)}")
    // constraint/key verdicts identical to the typed run on shared tables
    val csvMap = csvRows.map(r => key(r) -> r.violations).toMap
    typed.tables.filterNot(_.table == "embeddings").flatMap(_.errors)
      .foreach { r =>
        assert(csvMap.get(key(r)).contains(r.violations),
          s"verdict drift for ${key(r)}: typed=${r.violations} " +
            s"csv=${csvMap.get(key(r))}")
      }
  }

  test("dictionary parse path is verdict- and value-identical") {
    // one good date, one bad date, a missing token, and a duplicated
    // value: the dict path must report the same violation counts and
    // produce the same typed cells as the per-row path
    val csv = "d,n\n2024-01-31,1.5\nnot-a-date,2.5\n,1.5\n2024-01-31,x\n"
    val res = Resource("t", write("dict.csv", csv),
      TableSchema(fields = Seq(Field("d", "date"), Field("n", "number")),
        missingValues = Seq("")))
    val raw = Validate.readResource(spark, res)
    val (typedRow, errsRow, failedRow) =
      Validate.parseTable(raw, res.schema)
    val (typedDict, errsDict, failedDict) =
      Validate.parseTable(raw, res.schema, Set("d", "n"))
    assert(failedRow === failedDict)
    def em(e: Seq[graft.report.CheckResult]) =
      e.map(r => (r.code, r.field) -> r.violations).toMap
    assert(em(errsRow) === em(errsDict))
    // sample VALUES may legitimately arrive in a different order
    // (row stream vs distinct stream); the sets must agree
    def sm(e: Seq[graft.report.CheckResult]) =
      e.map(r => (r.code, r.field) -> r.sampleValues.toSet).toMap
    assert(sm(errsRow) === sm(errsDict))
    assert(typedRow.schema === typedDict.schema)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toSeq.sorted
    assert(rows(typedRow) === rows(typedDict))
  }

  test("fused single-scan parse ≡ legacy two-scan parse, result for result") {
    // r18 (guide §6): the fused mode derives the invalid-cell column
    // from the typed value inside ONE scan — every violation count,
    // every bounded sample, the failed set, and every typed cell must
    // be identical to the legacy raw-scan aggregate. Exercises: a good
    // date, a bad date, a missing token, a bad number, a plain string
    // (never invalid), and an untranslatable field (schema-error path).
    val csv = "d,n,s\n2024-01-31,1.5,a\nnot-a-date,2.5,b\n,xx,c\n" +
      "2024-01-31,7,\n9999-99,0,d\n"
    val res = Resource("t", write("fused.csv", csv),
      TableSchema(fields = Seq(Field("d", "date"), Field("n", "number"),
        Field("s", "string")), missingValues = Seq("")))
    val raw = Validate.readResource(spark, res)
    val (typedL, errsL, failedL) = Validate.parseTable(raw, res.schema)
    val buf = scala.collection.mutable.ListBuffer[
      org.apache.spark.sql.DataFrame]()
    val (typedF, errsF, failedF) = Validate.parseTable(raw, res.schema,
      Set.empty, Validate.MaxDictValues, Some(buf))
    try {
      assert(failedL === failedF)
      assert(errsL.map(e => (e.code, e.field, e.violations,
        e.sampleValues)) ===
        errsF.map(e => (e.code, e.field, e.violations, e.sampleValues)))
      assert(typedL.schema === typedF.schema)
      val rows = (df: org.apache.spark.sql.DataFrame) =>
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .toSeq.sorted
      assert(rows(typedL) === rows(typedF))
      assert(buf.size === 1, "fused mode must register its one cache")
    } finally buf.foreach(_.unpersist(blocking = false))
  }

  test("dict parse falls back to row parse past the cardinality cap") {
    // 3 distinct dates under a cap of 2: field must silently take the
    // per-row path — same verdicts, same typed cells, no error
    val csv = "d\n2024-01-01\n2024-01-02\n2024-01-03\nbad\n"
    val res = Resource("t", write("dictcap.csv", csv),
      TableSchema(fields = Seq(Field("d", "date"))))
    val raw = Validate.readResource(spark, res)
    val (typedD, errsD, _) =
      Validate.parseTable(raw, res.schema, Set("d"), maxDictValues = 2L)
    val (typedR, errsR, _) = Validate.parseTable(raw, res.schema)
    assert(errsD.map(e => (e.code, e.field, e.violations)) ===
      errsR.map(e => (e.code, e.field, e.violations)))
    assert(typedD.collect().map(String.valueOf).sorted.toSeq ===
      typedR.collect().map(String.valueOf).sorted.toSeq)
  }
}
