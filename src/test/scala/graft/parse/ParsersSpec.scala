package graft.parse

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.schema.Field

/** Parametrized parse vectors per FIXTURES.md §B1 — one block per parser,
  * (raw string, expected parsed value or null) with the reference's
  * strictness (spec-invalid forms must parse to null, not a lax value).
  */
class ParsersSpec extends SparkSpec {
  import spark.implicits._

  /** Parse a set of raw strings with a field; returns raw -> parsed. */
  private def parse(f: Field, raws: Seq[String]): Map[String, Any] =
    raws.toDF("raw")
      .select(col("raw"), Parsers.parseExpr(f, col("raw")).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.get(1))
      .toMap

  test("P3 integer: strict gate") {
    val got = parse(Field("x", "integer"),
      Seq("42", "-7", "+9", "4.2", "1e3", " 42", "x"))
    assert(got("42") == 42L && got("-7") == -7L && got("+9") == 9L)
    assert(got("4.2") == null && got("1e3") == null)
    assert(got(" 42") == null && got("x") == null)
  }

  test("P3 integer bareNumber=false strips affixes") {
    val got = parse(Field("x", "integer", bareNumber = false),
      Seq("$123", "95%", "EUR 77 total"))
    assert(got("$123") == 123L && got("95%") == 95L)
    assert(got("EUR 77 total") == 77L)
  }

  test("P2 number: plain, specials, exponent") {
    val got = parse(Field("x", "number"),
      Seq("3.14", "-0.5", ".5", "5.", "1e3", "NaN", "INF", "-INF", "abc",
        "1,234"))
    assert(got("3.14") == 3.14 && got("-0.5") == -0.5)
    assert(got(".5") == 0.5 && got("5.") == 5.0 && got("1e3") == 1000.0)
    assert(got("NaN").asInstanceOf[Double].isNaN)
    assert(got("INF") == Double.PositiveInfinity)
    assert(got("-INF") == Double.NegativeInfinity)
    assert(got("abc") == null)
    assert(got("1,234") == null) // groupChar not declared
  }

  test("P2 number: decimalChar/groupChar") {
    val f = Field("x", "number", decimalChar = ",", groupChar = ".")
    val got = parse(f, Seq("1.234,56", "1,5", "1.2.3,0", "1,234.56"))
    assert(got("1.234,56") == 1234.56)
    assert(got("1,5") == 1.5)
    assert(got("1.2.3,0") == 123.0) // groupChar stripped wherever it is
    // strip-then-substitute semantics (same as the reference's
    // str.replace pipeline): '.' removed as group char, ',' → '.'
    assert(got("1,234.56") == 1.23456)
  }

  test("P2 number bareNumber=false") {
    val got = parse(Field("x", "number", bareNumber = false),
      Seq("$1234", "95%", "($3.5)"))
    assert(got("$1234") == 1234.0 && got("95%") == 95.0)
    assert(got("($3.5)") == 3.5)
  }

  test("P4 boolean: default and custom tokens") {
    val d = parse(Field("x", "boolean"),
      Seq("true", "TRUE", "1", "false", "0", "yes", "2"))
    assert(d("true") == true && d("TRUE") == true && d("1") == true)
    assert(d("false") == false && d("0") == false)
    assert(d("yes") == null && d("2") == null)
    val c = parse(Field("x", "boolean", trueValues = Seq("y"),
      falseValues = Seq("n")), Seq("y", "n", "true"))
    assert(c("y") == true && c("n") == false && c("true") == null)
  }

  test("P5 date: default and pattern") {
    val d = parse(Field("x", "date"),
      Seq("2026-08-12", "2026-13-01", "2025-02-29", "12/08/2026"))
    assert(d("2026-08-12") == Date.valueOf("2026-08-12"))
    assert(d("2026-13-01") == null)
    assert(d("2025-02-29") == null) // not a leap year
    assert(d("12/08/2026") == null)
    val p = parse(Field("x", "date", format = "%d/%m/%Y"),
      Seq("12/08/2026", "2026-08-12"))
    assert(p("12/08/2026") == Date.valueOf("2026-08-12"))
    assert(p("2026-08-12") == null)
  }

  test("P6 datetime: ISO forms") {
    val d = parse(Field("x", "datetime"),
      Seq("2026-08-12T05:33:00", "2026-08-12T05:33:00Z",
        "2026-08-12 05:33:00", "2026-08-12T99:00:00"))
    assert(d("2026-08-12T05:33:00") ==
      Timestamp.valueOf("2026-08-12 05:33:00"))
    assert(d("2026-08-12T05:33:00Z") ==
      Timestamp.valueOf("2026-08-12 05:33:00")) // session TZ = UTC
    assert(d("2026-08-12 05:33:00") == null) // space separator: invalid
    assert(d("2026-08-12T99:00:00") == null)
  }

  test("P15 date format='any': fixed form list, no order guessing") {
    val d = parse(Field("x", "date", format = "any"),
      Seq("2026-08-12", "2026/08/12", "20260812", "12.08.2026",
        "08-12-2026", "2026-13-01", "30.02.2026", "12/08/2026"))
    val exp = Date.valueOf("2026-08-12")
    assert(d("2026-08-12") == exp && d("2026/08/12") == exp)
    assert(d("20260812") == exp && d("12.08.2026") == exp)
    // unclaimed shape: MM-dd-yyyy is never guessed at
    assert(d("08-12-2026") == null)
    // slashed order is pinned yyyy/MM/dd — dd/MM never guessed
    assert(d("12/08/2026") == null)
    assert(d("2026-13-01") == null) // in-gate calendar-invalid
    assert(d("30.02.2026") == null)
  }

  test("P16 datetime format='any': separators, fraction, offsets") {
    val d = parse(Field("x", "datetime", format = "any"),
      Seq("2026-08-12T05:33:00", "2026-08-12 05:33:00",
        "2026-08-12T05:33:00.000123", "2026-08-12T05:33:00+02:00",
        "2026-08-12T05:33:00Z", "2026-08-12", "2026-08-12T25:00:00",
        "2026-08-12T05:33:00.1"))
    val base = Timestamp.valueOf("2026-08-12 05:33:00")
    assert(d("2026-08-12T05:33:00") == base)
    assert(d("2026-08-12 05:33:00") == base) // space ok under "any"
    assert(d("2026-08-12T05:33:00.000123") ==
      Timestamp.valueOf("2026-08-12 05:33:00.000123"))
    assert(d("2026-08-12T05:33:00+02:00") ==
      Timestamp.valueOf("2026-08-12 03:33:00")) // session TZ = UTC
    assert(d("2026-08-12T05:33:00Z") == base)
    assert(d("2026-08-12") == Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(d("2026-08-12T25:00:00") == null)
    assert(d("2026-08-12T05:33:00.1") == null) // fraction must be 6-digit
  }

  test("P17 time format='any': HH:mm canonicalizes, no lax hours") {
    val d = parse(Field("x", "time", format = "any"),
      Seq("23:59:59", "05:33", "7:05", "25:61:00", "24:00"))
    assert(d("23:59:59") == "23:59:59")
    assert(d("05:33") == "05:33:00")
    assert(d("7:05") == null && d("25:61:00") == null)
    assert(d("24:00") == null)
  }

  test("P7 time: default range-validated canonical string") {
    val d = parse(Field("x", "time"),
      Seq("23:59:59", "00:00:00", "24:00:00", "12:60:00", "1:2:3"))
    assert(d("23:59:59") == "23:59:59" && d("00:00:00") == "00:00:00")
    assert(d("24:00:00") == null && d("12:60:00") == null)
    assert(d("1:2:3") == null)
  }

  test("P8 year") {
    val d = parse(Field("x", "year"), Seq("2026", "0001", "26", "20260"))
    assert(d("2026") == 2026 && d("0001") == 1)
    assert(d("26") == null && d("20260") == null)
  }

  test("P9 geopoint: default format with range check") {
    val d = parse(Field("x", "geopoint"),
      Seq("-122.4, 37.8", "0,0", "200, 100", "x,y", "1,2,3"))
    assert(d("-122.4, 37.8") == Row(-122.4, 37.8))
    assert(d("0,0") == Row(0.0, 0.0))
    assert(d("200, 100") == null) // out of range
    assert(d("x,y") == null && d("1,2,3") == null)
  }

  test("P9 geopoint: array and object formats") {
    val a = parse(Field("x", "geopoint", format = "array"),
      Seq("[-122.4, 37.8]", "[1]", "nope"))
    assert(a("[-122.4, 37.8]") == Row(-122.4, 37.8))
    assert(a("[1]") == null && a("nope") == null)
    val o = parse(Field("x", "geopoint", format = "object"),
      Seq("""{"lon": -122.4, "lat": 37.8}""", """{"lon": 1}"""))
    assert(o("""{"lon": -122.4, "lat": 37.8}""") == Row(-122.4, 37.8))
    assert(o("""{"lon": 1}""") == null)
  }

  test("P1 string formats: email, uri, uuid, base64") {
    def check(fmt: String, ok: Seq[String], bad: Seq[String]): Unit = {
      val got = parse(Field("x", "string", format = fmt), ok ++ bad)
      ok.foreach(v => assert(got(v) == v, s"$fmt should accept $v"))
      bad.foreach(v => assert(got(v) == null, s"$fmt should reject $v"))
    }
    check("email", Seq("a.b@c.org"), Seq("nope@", "@x", "a b@c.org"))
    check("uri", Seq("https://x.org/p?q=1", "ftp://h/f"), Seq("notauri"))
    check("uuid", Seq("123e4567-e89b-12d3-a456-426614174000",
      "123E4567-E89B-12D3-A456-426614174000"), Seq("123e4567", "zz3e4567-e89b-12d3-a456-426614174000"))
    check("binary", Seq("aGVsbG8=", "YQ=="), Seq("a!!!", "aGVsbG8"))
  }

  test("P10 yearmonth: YYYY-MM to first-of-month date") {
    val got = parse(Field("x", "yearmonth"),
      Seq("2026-05", "2026-13", "202605", "2026-5", "2026-00"))
    assert(got("2026-05") == java.sql.Date.valueOf("2026-05-01"))
    assert(got("2026-13") == null && got("202605") == null)
    assert(got("2026-5") == null && got("2026-00") == null)
  }

  test("P11/P12 object and array: JSON container validation") {
    val o = parse(Field("x", "object"),
      Seq("""{"a": 1, "b": [2]}""", """{"a": 1""", "[1,2]", "junk"))
    assert(o("""{"a": 1, "b": [2]}""") == """{"a": 1, "b": [2]}""")
    assert(o("""{"a": 1""") == null)
    assert(o("[1,2]") == null && o("junk") == null)
    val a = parse(Field("x", "array"),
      Seq("[1, 2, 3]", "[1,", """{"a": 1}"""))
    assert(a("[1, 2, 3]") == "[1, 2, 3]")
    assert(a("[1,") == null && a("""{"a": 1}""") == null)
  }

  test("P13 duration: ISO 8601, at least one component") {
    val ok = Seq("P1Y", "P2M3D", "P4W", "PT5H", "PT1H30M", "PT0.5S",
      "P1DT2H", "P1Y2M3DT4H5M6S")
    val bad = Seq("P", "PT", "1D", "P1S", "PT1D", "P1H", "p1d", "P1.5D")
    val got = parse(Field("x", "duration"), ok ++ bad)
    ok.foreach(v => assert(got(v) == v, s"should accept $v"))
    bad.foreach(v => assert(got(v) == null, s"should reject $v"))
  }

  test("P14 geojson: type-tagged JSON objects only") {
    val pt = """{"type": "Point", "coordinates": [1.0, 2.0]}"""
    val fc = """{"type": "FeatureCollection", "features": []}"""
    val got = parse(Field("x", "geojson"),
      Seq(pt, fc, """{"coordinates": [1, 2]}""", """{"type": "Circle"}""",
        "[1,2]", "junk"))
    assert(got(pt) == pt && got(fc) == fc)
    assert(got("""{"coordinates": [1, 2]}""") == null)
    assert(got("""{"type": "Circle"}""") == null)
    assert(got("[1,2]") == null && got("junk") == null)
  }

  test("missing values replaced before parse") {
    val got = Seq("", "NA", "42").toDF("raw")
      .select(Parsers.applyMissing(col("raw"), Seq("", "NA")).as("raw"))
      .select(col("raw"),
        Parsers.invalidExpr(Field("raw", "integer"), col("raw")).as("inv"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getBoolean(1))
    // missing tokens become null and are NOT type errors
    assert(got.count(_._1.isEmpty) == 2)
    assert(got.forall(!_._2))
  }
}
