package graft.report

import org.scalatest.funsuite.AnyFunSuite

import graft.Validate
import graft.schema.{Field, TableSchema}

/** Report error-code CONFORMANCE FREEZE (round-8 directive #4).
  *
  * The exact code strings the library emits are the report-JSON
  * compatibility surface a reference user depends on. SURVEY §"what's
  * missing" tracks that the upstream reference's literal code strings
  * cannot be diffed until `/root/reference/` mounts ([C]-claim,
  * SURVEY §7.0 step-0); until then, THIS spec pins the emitted
  * surface to the [B]-spec-derived names so (a) any accidental rename
  * fails CI immediately and (b) a future reference mount is a diff of
  * ONE frozen list against upstream's `errors.py`, not an audit of
  * every emit site. The README "Error-code conformance" table maps
  * each frozen code to the spec section that defines its semantics.
  *
  * Reflection over [[ErrorCodes]] (not a hand-kept mirror list) makes
  * the freeze additive-proof: a new constant added without updating
  * the frozen set fails here.
  */
class ErrorCodeConformanceSpec extends AnyFunSuite {

  /** Every code emitted through [[ErrorCodes]] constants. */
  private val FrozenConstantCodes = Set(
    "type-or-format-error",
    "required-constraint",
    "unique-constraint",
    "minimum-length-constraint",
    "maximum-length-constraint",
    "minimum-constraint",
    "maximum-constraint",
    "pattern-constraint",
    "enumerable-constraint",
    "primary-key-error",
    "unique-key-error",
    "foreign-key-error",
    "schema-error")

  /** Every code [[Validate.headerCheck]] emits as a literal. */
  private val FrozenHeaderCodes = Set(
    "missing-header",
    "extra-header",
    "blank-header",
    "duplicate-header",
    "non-matching-header")

  test("ErrorCodes constants are exactly the frozen thirteen strings") {
    val declared = ErrorCodes.getClass.getDeclaredMethods
      .filter(m => m.getReturnType == classOf[String] &&
        m.getParameterCount == 0)
      .map(_.invoke(ErrorCodes).asInstanceOf[String])
    // no duplicates among the constants (two checks sharing a code
    // string would make the report ambiguous)...
    assert(declared.length === declared.distinct.length,
      declared.sorted.mkString(", "))
    // ...and the set is frozen: additions, removals, and renames all
    // land here before they can reach a report
    assert(declared.toSet === FrozenConstantCodes,
      declared.sorted.mkString(", "))
  }

  test("headerCheck emits exactly the five frozen header codes") {
    val schema = TableSchema(Seq(Field("a"), Field("b"), Field("c")))
    def codes(cols: Seq[String]): Set[String] =
      Validate.headerCheck(cols, schema).map(_.code).toSet
    // one header exercising four codes at once: b,c missing; a
    // duplicated; "" and d undeclared; "" blank
    assert(codes(Seq("a", "a", "", "d")) ===
      Set("missing-header", "extra-header", "blank-header",
        "duplicate-header"))
    // the fifth needs the same multiset in a different order
    assert(codes(Seq("c", "b", "a")) === Set("non-matching-header"))
    assert((codes(Seq("a", "a", "", "d")) ++ codes(Seq("c", "b", "a")))
      === FrozenHeaderCodes)
  }

  test("header and constant code namespaces are disjoint") {
    assert(FrozenConstantCodes.intersect(FrozenHeaderCodes).isEmpty)
  }
}
