package graft.report

/** goodtables-style validation report (SURVEY.md §2.6 R1).
  *
  * The reference aggregates per-table error lists into a JSON report with
  * `valid`, error codes, and the *distinct offending values* (not one
  * entry per bad cell). Control-plane case classes; built on the driver
  * from bounded collects only (SURVEY.md §4.3 rule 5).
  */
final case class CheckResult(
    table: String,
    code: String, // type-or-format-error | constraint error codes | *-key-error
    field: String, // field or comma-joined key list
    violations: Long,
    sampleValues: Seq[String] // bounded, ≤ maxErrorValues
) {
  def passed: Boolean = violations == 0L
}

final case class TableReport(table: String, errors: Seq[CheckResult]) {
  def valid: Boolean = errors.forall(_.passed)
}

final case class PackageReport(tables: Seq[TableReport]) {
  def valid: Boolean = tables.forall(_.valid)
  def errorCount: Long =
    tables.flatMap(_.errors).filterNot(_.passed).map(_.violations).sum

  /** Compact JSON (no external deps beyond what the report needs). */
  def toJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }
    val ts = tables.map { t =>
      val errs = t.errors.filterNot(_.passed).map { e =>
        s"""{"code":"${esc(e.code)}","field":"${esc(e.field)}",""" +
          s""""violations":${e.violations},""" +
          s""""values":[${e.sampleValues.map(v => "\"" + esc(v) + "\"").mkString(",")}]}"""
      }
      s"""{"table":"${esc(t.table)}","valid":${t.valid},""" +
        s""""errors":[${errs.mkString(",")}]}"""
    }
    s"""{"valid":$valid,"error-count":$errorCount,"tables":[${ts.mkString(",")}]}"""
  }
}

object ErrorCodes {
  val TypeOrFormat = "type-or-format-error"
  val Required = "required-constraint"
  val Unique = "unique-constraint"
  val MinLength = "minimum-length-constraint"
  val MaxLength = "maximum-length-constraint"
  val Minimum = "minimum-constraint"
  val Maximum = "maximum-constraint"
  val Pattern = "pattern-constraint"
  val Enum = "enumerable-constraint"
  val PrimaryKey = "primary-key-error"
  val UniqueKey = "unique-key-error"
  val ForeignKey = "foreign-key-error"
  val SchemaError = "schema-error"
}
