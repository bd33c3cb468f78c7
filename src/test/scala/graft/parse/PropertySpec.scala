package graft.parse

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.check.Checks
import graft.schema.Field

/** Property-based laws (SURVEY.md §5.2): format-then-parse round trips
  * and fk set laws, run through ScalaCheck's engine directly (the
  * scalatest bridge artifact is not on the offline classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("law: date formatted with pattern p parses back with p") {
    val dates = Gen.choose(0L, 40000L).map(LocalDate.ofEpochDay)
    val fmts = Gen.oneOf("%Y-%m-%d", "%d/%m/%Y", "%m.%d.%Y", "%Y%m%d")
    check(Prop.forAll(Gen.listOfN(10, dates), fmts) {
      (ds: List[LocalDate], fmt: String) =>
        val java = Patterns.strptimeToJava(fmt)
        val jf = DateTimeFormatter.ofPattern(java)
        val f = Field("raw", "date",
          format = if (fmt == "%Y-%m-%d") "default" else fmt)
        val got = ds.map(_.format(jf)).toDF("raw")
          .select(Parsers.parseExpr(f, col("raw")).as("p"))
          .collect().map(_.getDate(0).toLocalDate)
        got.toList == ds
    })
  }

  test("law: longs survive integer parse round-trip") {
    check(Prop.forAll(
      Gen.listOfN(20, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))) {
      (xs: List[Long]) =>
        xs.isEmpty || {
          val got = xs.map(_.toString).toDF("raw")
            .select(Parsers.parseExpr(Field("raw", "integer"),
              col("raw")).as("p"))
            .collect().map(_.getLong(0))
          got.toList == xs
        }
    })
  }

  test("law: composed ISO durations always parse; component-free forms never") {
    val part = Gen.choose(0, 3) // 0 = absent
    check(Prop.forAll(part, part, part, part, part, part) {
      (y: Int, m: Int, d: Int, h: Int, mi: Int, sec: Int) =>
        val date = Seq(y -> "Y", m -> "M", d -> "D")
          .collect { case (v, u) if v > 0 => s"$v$u" }.mkString
        val time = Seq(h -> "H", mi -> "M", sec -> "S")
          .collect { case (v, u) if v > 0 => s"$v$u" }.mkString
        val s = "P" + date + (if (time.nonEmpty) "T" + time else "")
        val hasAny = date.nonEmpty || time.nonEmpty
        val got = Seq(s).toDF("raw")
          .select(Parsers.parseExpr(Field("raw", "duration"),
            col("raw")).as("p"))
          .collect()(0)
        if (hasAny) got.getString(0) == s else got.isNullAt(0)
    })
  }

  test("law: yearmonth round-trips to the first of the month") {
    val ym = for {
      y <- Gen.choose(1000, 9999); m <- Gen.choose(1, 12)
    } yield (y, m)
    check(Prop.forAll(Gen.listOfN(10, ym)) { (ys: List[(Int, Int)]) =>
      ys.isEmpty || {
        val raws = ys.map { case (y, m) => f"$y%04d-$m%02d" }
        val got = raws.toDF("raw")
          .select(Parsers.parseExpr(Field("raw", "yearmonth"),
            col("raw")).as("p"))
          .collect().map(_.getDate(0).toLocalDate)
        got.toList == ys.map { case (y, m) => LocalDate.of(y, m, 1) }
      }
    })
  }

  test("law: EU-formatted numbers (groupChar '.', decimalChar ',') round-trip") {
    val gen = for {
      intPart <- Gen.choose(0L, 999999999L)
      fracDigits <- Gen.choose(0, 4)
      frac <- Gen.listOfN(fracDigits, Gen.numChar).map(_.mkString)
      neg <- Gen.oneOf(true, false)
    } yield (intPart, frac, neg)
    check(Prop.forAll(Gen.listOfN(8, gen)) {
      (xs: List[(Long, String, Boolean)]) =>
        xs.isEmpty || {
          val f = Field("raw", "number", decimalChar = ",", groupChar = ".")
          val raws = xs.map { case (ip, fr, neg) =>
            // group the integer part in threes with '.', decimal ','
            val grouped = ip.toString.reverse.grouped(3)
              .mkString(".").reverse
            val sign = if (neg) "-" else ""
            sign + grouped + (if (fr.nonEmpty) "," + fr else "")
          }
          val expect = xs.map { case (ip, fr, neg) =>
            val s = (if (neg) "-" else "") + ip.toString +
              (if (fr.nonEmpty) "." + fr else "")
            s.toDouble
          }
          val got = raws.toDF("raw")
            .select(Parsers.parseExpr(f, col("raw")).as("p"))
            .collect().map(_.getDouble(0))
          got.toList == expect
        }
    })
  }

  test("law: geopoint 'lon, lat' round-trips inside range, nulls outside") {
    val coord = for {
      lon <- Gen.choose(-250, 250); lat <- Gen.choose(-120, 120)
    } yield (lon, lat)
    check(Prop.forAll(Gen.listOfN(10, coord)) { (cs: List[(Int, Int)]) =>
      cs.isEmpty || {
        val f = Field("raw", "geopoint")
        val got = cs.map { case (lon, lat) => s"$lon, $lat" }.toDF("raw")
          .select(Parsers.parseExpr(f, col("raw")).as("p"))
          .collect()
        cs.zip(got).forall { case ((lon, lat), row) =>
          val inRange = math.abs(lon) <= 180 && math.abs(lat) <= 90
          if (!inRange) row.isNullAt(0)
          else {
            val st = row.getStruct(0)
            st.getDouble(0) == lon.toDouble && st.getDouble(1) == lat.toDouble
          }
        }
      }
    })
  }

  test("law: child ⊆ parent ⇒ no fk violations; extras ⇒ exactly those") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0, 50)),
      Gen.listOf(Gen.choose(100, 120))) {
      (members: List[Int], orphans: List[Int]) =>
        val parent = members.distinct.toDF("id")
        val child = (members ++ orphans).toDF("pid")
        val v = Checks.foreignKey(child, Seq("pid"), parent, Seq("id"))
          .collect().map(_.getInt(0)).toSet
        v == orphans.toSet
    })
  }
}
