package graft.check

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.{Constraints, Field, TableSchema}

/** Constraint/key vectors per FIXTURES.md §B2/§B3. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("C1 required counts nulls") {
    val df = Seq(Some("a"), None, None, Some("b")).toDF("x")
    val v = Checks.required(df, "x").collect()
    assert(v.length == 1 && v(0).getLong(0) == 2)
    // clean data still yields the single count row (violations = 0)
    val clean = Checks.required(Seq("a", "b").toDF("x"), "x").collect()
    assert(clean.length == 1 && clean(0).getLong(0) == 0)
  }

  test("C2 unique reports duplicated values, nulls exempt") {
    val df = Seq(Some(7), Some(7), Some(1), None, None).toDF("x")
    val v = Checks.unique(df, Seq("x")).collect()
    assert(v.length == 1 && v(0).getInt(0) == 7 && v(0).getLong(1) == 2)
  }

  test("C3/C4 length bounds") {
    val df = Seq("a", "ab", "abcde").toDF("x")
    assert(Checks.minLength(df, "x", 2).collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    assert(Checks.maxLength(df, "x", 4).collect()
      .map(_.getString(0)).toSeq == Seq("abcde"))
  }

  test("C5/C6 typed bounds") {
    val df = Seq(-1.0, 0.0, 5.0, 11.0).toDF("x")
    assert(Checks.minimum(df, "x", lit(0.0)).collect()
      .map(_.getDouble(0)).toSeq == Seq(-1.0))
    assert(Checks.maximum(df, "x", lit(10.0)).collect()
      .map(_.getDouble(0)).toSeq == Seq(11.0))
  }

  test("C7 pattern is anchored (full match)") {
    val df = Seq("ABC", "ab", "ABCD", "xABCx").toDF("x")
    val bad = Checks.patternCheck(df, "x", "[A-Z]{3}").collect()
      .map(_.getString(0)).toSet
    // 'ABC' full-matches; 'ABCD' must fail despite containing a match
    assert(bad == Set("ab", "ABCD", "xABCx"))
  }

  test("C8 enum") {
    val df = Seq("red", "green", "blue", "blue").toDF("x")
    val v = Checks.enumCheck(df, "x", Seq("red", "green")).collect()
    assert(v.length == 1 && v(0).getString(0) == "blue" &&
      v(0).getLong(1) == 2)
  }

  test("K1/K2 composite key uniqueness") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"))
      .toDF("k1", "k2")
    val v = Checks.unique(df, Seq("k1", "k2")).collect()
    assert(v.length == 1 && v(0).getInt(0) == 1 &&
      v(0).getString(1) == "a" && v(0).getLong(2) == 2)
  }

  test("K1 primary key implies required: null key parts counted") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(2), None))
      .toDF("k1", "k2")
    val v = Checks.primaryKeyNulls(df, Seq("k1", "k2")).collect()
    assert(v.length == 1 && v(0).getLong(0) == 2)
  }

  test("unique quick-screen: flags heavy duplication without a key shuffle") {
    val dup = spark.range(0, 10000).selectExpr("id % 100 AS k")
    val r = Checks.uniqueQuickScreen(dup, Seq("k")).collect()(0)
    assert(r.getLong(0) == 10000L)
    assert(r.getBoolean(2), "100 distinct over 10k rows must flag")
    val uniq = spark.range(0, 10000).toDF("k")
    val u = Checks.uniqueQuickScreen(uniq, Seq("k")).collect()(0)
    assert(!u.getBoolean(2), "unique keys must not flag")
  }

  test("salted fk: identical result to plain fk (salt never changes membership)") {
    val child = Seq(Some(1), Some(2), Some(99), Some(99), None)
      .toDF("parent_id")
    val parent = Seq(1, 2, 3).toDF("id")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val plain = toSet(
      Checks.foreignKey(child, Seq("parent_id"), parent, Seq("id")))
    val salted = toSet(Checks.foreignKeySalted(
      child, Seq("parent_id"), parent, Seq("id"), saltBuckets = 4))
    assert(salted == plain)
  }

  test("opt-in row numbers: exact 1-based positions of offending cells") {
    val df = Seq("aa", "b", "cc", "d").toDF("x")
    val v = Checks.offendingRows(df, "x", length(col("x")) < 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq == Seq(("b", 2L), ("d", 4L)))
  }

  test("K3 foreign key: orphans reported, nulls exempt") {
    val child = Seq(Some(1), Some(2), Some(99), Some(99), None)
      .toDF("parent_id")
    val parent = Seq(1, 2, 3).toDF("id")
    val v = Checks.foreignKey(child, Seq("parent_id"), parent, Seq("id"))
      .collect()
    assert(v.length == 1 && v(0).getInt(0) == 99 && v(0).getLong(1) == 2)
  }

  test("K3 composite foreign key") {
    val child = Seq((1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    val parent = Seq((1, "x"), (2, "x")).toDF("pa", "pb")
    val v = Checks.foreignKey(child, Seq("a", "b"), parent,
      Seq("pa", "pb")).collect()
    assert(v.length == 1 && v(0).getInt(0) == 1 &&
      v(0).getString(1) == "y")
  }

  test("fused constraint summary: one pass, all checks") {
    val schema = TableSchema(Seq(
      Field("r", constraints = Constraints(required = Some(true))),
      Field("n", "number",
        constraints = Constraints(minimum = Some("0"), maximum = Some("10"))),
      Field("s", constraints = Constraints(minLength = Some(2),
        pattern = Some("[a-z]+"), enum = Some(Seq("ab", "cd"))))))
    val df = Seq(
      (Some("ok"), Some(5.0), Some("ab")),
      (None, Some(-1.0), Some("x")),
      (Some("ok"), Some(11.0), Some("ZZ"))
    ).toDF("r", "n", "s")
      .select(col("r"), col("n"), col("s"))
    val row = Checks.constraintSummary(df, schema).collect()(0)
    val byName = row.schema.fieldNames.zipWithIndex.toMap
    assert(row.getLong(byName("r__required")) == 1)
    assert(row.getLong(byName("n__minimum")) == 1)
    assert(row.getLong(byName("n__maximum")) == 1)
    assert(row.getLong(byName("s__minLength")) == 1) // "x"
    assert(row.getLong(byName("s__pattern")) == 1) // "ZZ"
    assert(row.getLong(byName("s__enum")) == 2) // "x", "ZZ"
  }

  test("C8 enum on typed fields: integer, date, boolean compare typed") {
    val ints = Seq(1L, 2L, 5L, 5L).toDF("x")
    val fi = Field("x", "integer",
      constraints = Constraints(enum = Some(Seq("1", "2", "3"))))
    val vi = Checks.enumCheckTyped(ints, fi, Seq("1", "2", "3")).collect()
    assert(vi.length == 1 && vi(0).getLong(0) == 5L &&
      vi(0).getLong(1) == 2L)

    val dates = Seq("2026-01-01", "2026-02-03").toDF("s")
      .select(to_date(col("s")).as("x"))
    val fd = Field("x", "date")
    val vd = Checks.enumCheckTyped(dates, fd, Seq("2026-01-01")).collect()
    assert(vd.length == 1 &&
      vd(0).getDate(0).toString == "2026-02-03")

    val bools = Seq(true, false, false).toDF("x")
    val fb = Field("x", "boolean")
    val vb = Checks.enumCheckTyped(bools, fb, Seq("true")).collect()
    assert(vb.length == 1 && !vb(0).getBoolean(0) &&
      vb(0).getLong(1) == 2L)

    // fused summary path uses the same typed comparison
    val schema = TableSchema(Seq(Field("x", "integer",
      constraints = Constraints(enum = Some(Seq("1", "2", "3"))))))
    val row = Checks.constraintSummary(ints, schema).collect()(0)
    assert(row.getLong(0) == 2L)
  }

  test("C3/C4 on array/object fields measure elements/keys, not chars") {
    // array field: validated JSON strings; "[1,2]" has 5 chars but 2 els
    val arr = Seq("""[1,2]""", """["a","b","c"]""", """[]""").toDF("x")
    val fa = Field("x", "array")
    assert(Checks.minLengthTyped(arr, fa, 2).collect()
      .map(_.getString(0)).toSeq == Seq("[]"))
    assert(Checks.maxLengthTyped(arr, fa, 2).collect()
      .map(_.getString(0)).toSeq == Seq("""["a","b","c"]"""))

    val obj = Seq("""{"a":1}""", """{"a":1,"b":{"c":2},"d":3}""").toDF("x")
    val fo = Field("x", "object")
    assert(Checks.maxLengthTyped(obj, fo, 2).collect()
      .map(_.getString(0)).toSeq ==
      Seq("""{"a":1,"b":{"c":2},"d":3}"""))

    // fused summary path agrees
    val schema = TableSchema(Seq(Field("x", "array",
      constraints = Constraints(minLength = Some(2)))))
    val row = Checks.constraintSummary(arr, schema).collect()(0)
    assert(row.getLong(0) == 1L) // only []
  }

  test("index-served checks agree with their one-shot twins") {
    // foreignKeyAgainstIndex over a key-index-SHAPED frame (keys + n,
    // possibly with LSM-split rows for one key) ≡ foreignKey over the
    // parent it indexes
    val child = Seq(Some(1), Some(2), Some(99), Some(99), None)
      .toDF("parent_id")
    val parent = Seq(1, 2, 3).toDF("id")
    val index = Seq((1, 1L), (2, 1L), (3, 1L), (3, 2L)) // key 3 split
      .toDF("id", "n")
    val direct = Checks.foreignKey(child, Seq("parent_id"), parent,
      Seq("id")).collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val served = Checks.foreignKeyAgainstIndex(child, Seq("parent_id"),
      index, Seq("id")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(served === direct && direct === Set((99, 2L)))

    // uniqueAgainstIndex: batch-internal dup (7), history collision
    // (1), split-row history collision (3: 2+1 across LSM rows), clean
    // key (8) filtered; null keys exempt
    val batch = Seq(Some(1), Some(3), Some(7), Some(7), Some(8), None)
      .toDF("id")
    val kidx = Seq((1, 1L), (2, 1L), (3, 2L), (3, 1L)).toDF("id", "n")
    val got = Checks.uniqueAgainstIndex(batch, kidx, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1, 1L, 1L), (3, 1L, 3L), (7, 2L, 0L)))

    // LSM tombstones (negated count rows): fully-deleted key 2 must
    // REOPEN as an fk orphan, and contribute zero to uniqueness
    val tomb = Seq((1, 1L), (2, 1L), (2, -1L), (3, 1L)).toDF("id", "n")
    val reopened = Checks.foreignKeyAgainstIndex(child,
        Seq("parent_id"), tomb, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(reopened === Set((2, 1L), (99, 2L)),
      "deleted parent keys must orphan their facts again")
    val uniq = Checks.uniqueAgainstIndex(
        Seq(2, 2).toDF("id"), tomb, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(uniq === Set((2, 2L, 0L)),
      "a deleted key's history must count zero")
  }

  test("fk broadcast re-hint applies ONLY to broadcast-family hints") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val child = Seq(Some(1), Some(99)).toDF("parent_id")
    val parent = Seq(1, 2).toDF("id")
    // a deliberate non-broadcast strategy hint must NOT be upgraded
    val merged = parent.hint("SHUFFLE_MERGE")
    val v = Checks.foreignKey(child, Seq("parent_id"), merged, Seq("id"))
    val hinted = v.queryExecution.optimizedPlan.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }
    assert(!hinted.exists(_.hints.strategy.contains(
        org.apache.spark.sql.catalyst.plans.logical.BROADCAST)),
      s"SHUFFLE_MERGE parent was force-broadcast: $hinted")
    // result is unchanged either way
    assert(v.collect().map(_.getInt(0)).toSeq == Seq(99))
  }
}
