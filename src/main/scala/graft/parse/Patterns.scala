package graft.parse

/** strptime (`%`-directive) → java.time `DateTimeFormatter` pattern
  * translation (SURVEY.md §7.5 hard-part 1).
  *
  * Table Schema v1 date/time/datetime fields may declare a Python
  * strptime-style `format` (e.g. `%d/%m/%Y`); Spark's `to_date`/
  * `to_timestamp` take java.time patterns. Translation is table-driven and
  * total: any untranslatable directive raises [[PatternError]] so the
  * caller can emit a schema-error instead of silently mis-parsing.
  */
final case class PatternError(msg: String) extends Exception(msg)

object Patterns {

  /** strptime directive → java.time pattern fragment. */
  private val table: Map[Char, String] = Map(
    'Y' -> "yyyy", // 4-digit year
    'y' -> "yy",
    'm' -> "MM",
    'd' -> "dd",
    'e' -> "d",
    'H' -> "HH",
    'I' -> "hh",
    'M' -> "mm",
    'S' -> "ss",
    'f' -> "SSSSSS", // microseconds
    'p' -> "a",      // AM/PM
    'z' -> "XX",     // ±HHMM offset ('Z' accepted by X)
    'Z' -> "zzz",    // zone name
    'j' -> "DDD",    // day of year
    'a' -> "EEE",
    'A' -> "EEEE",
    'b' -> "MMM",
    'B' -> "MMMM"
    // NOT mapped: %G/%V/%u (ISO week-based year/week/weekday) — Spark 3+
    // rejects the java.time letters 'Y'/'w'/'e' outright ("all week-based
    // patterns are unsupported"), so translating them would throw an
    // opaque runtime error mid-query; they fall through to PatternError
    // (schema-error path) like %c/%x instead.
  )

  /** Characters that java.time treats as pattern letters and must be
    * quoted when they appear literally in a strptime format.
    */
  private def quoteLiteral(s: String): String =
    if (s.isEmpty) s
    else if (s.exists(c => c.isLetter || c == '\'')) {
      "'" + s.replace("'", "''") + "'"
    } else s

  /** Translate a strptime format to a java.time pattern.
    * `%%` becomes a literal percent. Throws [[PatternError]] on unknown
    * directives (e.g. `%c`, `%x` locale forms — not portable, rejected).
    */
  def strptimeToJava(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = { out ++= quoteLiteral(lit.toString); lit.clear() }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length)
          throw PatternError(s"dangling % in format '$fmt'")
        val d = fmt.charAt(i + 1)
        if (d == '%') lit += '%'
        else table.get(d) match {
          case Some(j) => flush(); out ++= j
          case None =>
            throw PatternError(s"unsupported strptime directive %$d in '$fmt'")
        }
        i += 2
      } else { lit += c; i += 1 }
    }
    flush()
    out.toString
  }

  /** Default formats per Table Schema v1. */
  val DateDefault = "yyyy-MM-dd"
  val TimeDefault = "HH:mm:ss"
  /** ISO 8601 with optional fractional seconds and optional offset. */
  val DateTimeDefault = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]"

  /** Resolve a field's declared format to a SINGLE java.time pattern.
    * `default` → spec default. `any` is not a single pattern — the
    * temporal parsers handle it upstream as a fixed regex-gated form
    * list ([[graft.parse.Parsers]], round-9: previously rejected like
    * the reference does); reaching here with `any` is a caller bug,
    * rejected loudly.
    */
  def resolve(ftype: String, format: String): String = (ftype, format) match {
    case (_, "any") =>
      throw PatternError(s"format 'any' is not a single pattern " +
        s"(handled by the $ftype parser's form list, never resolved here)")
    case ("date", "default")     => DateDefault
    case ("time", "default")     => TimeDefault
    case ("datetime", "default") => DateTimeDefault
    case (_, f) if f.contains("%") => strptimeToJava(f)
    case (_, f) =>
      throw PatternError(s"unrecognized $ftype format '$f'")
  }
}
