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
