package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class PatternsSpec extends AnyFunSuite {

  test("common strptime directives translate") {
    assert(Patterns.strptimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Patterns.strptimeToJava("%d/%m/%Y") == "dd/MM/yyyy")
    assert(Patterns.strptimeToJava("%H:%M:%S") == "HH:mm:ss")
    assert(Patterns.strptimeToJava("%Y-%m-%dT%H:%M:%S") ==
      "yyyy-MM-dd'T'HH:mm:ss")
    assert(Patterns.strptimeToJava("%y %b %e") == "yy MMM d")
  }

  test("literal percent and quoting") {
    // '%' is not a java.time pattern letter, so it needs no quoting
    assert(Patterns.strptimeToJava("%d%%") == "dd%")
    // letters in literals must be quoted for java.time
    assert(Patterns.strptimeToJava("%Hh%Mm") == "HH'h'mm'm'")
  }

  test("unsupported directives are rejected, not mis-parsed") {
    assertThrows[PatternError](Patterns.strptimeToJava("%c"))
    assertThrows[PatternError](Patterns.strptimeToJava("%x"))
    assertThrows[PatternError](Patterns.strptimeToJava("broken%"))
  }

  test("format 'any' never resolves to a single pattern (the parsers " +
      "own it as a form list)") {
    assertThrows[PatternError](Patterns.resolve("date", "any"))
  }

  test("defaults resolve per spec") {
    assert(Patterns.resolve("date", "default") == "yyyy-MM-dd")
    assert(Patterns.resolve("time", "default") == "HH:mm:ss")
  }
}
