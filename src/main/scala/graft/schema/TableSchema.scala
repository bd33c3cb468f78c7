package graft.schema

/** Frictionless Table Schema v1 descriptor model.
  *
  * Semantics follow the published Table Schema / Data Package v1 specs
  * (specs.frictionlessdata.io/table-schema, /data-package), which the
  * reference (`ezwelty/goodtables-pandas-py`, see SURVEY.md §1) implements:
  * a schema is a *declared* list of typed fields plus key constraints —
  * never inferred from data.
  *
  * Control-plane only: these case classes live on the driver; the data
  * plane is a `DataFrame` whose columns are parsed/checked per `Field`.
  */
final case class Constraints(
    required: Option[Boolean] = None,
    unique: Option[Boolean] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    minimum: Option[String] = None, // typed lazily against the field type
    maximum: Option[String] = None,
    pattern: Option[String] = None,
    enum: Option[Seq[String]] = None
) {
  def isEmpty: Boolean =
    required.isEmpty && unique.isEmpty && minLength.isEmpty &&
      maxLength.isEmpty && minimum.isEmpty && maximum.isEmpty &&
      pattern.isEmpty && enum.isEmpty
}

/** One field descriptor: `{name, type, format, constraints, ...}`.
  *
  * @param ftype       Table Schema type: string/number/integer/boolean/
  *                    date/time/datetime/year/geopoint (v1 surface)
  * @param format      type-specific format (e.g. `email`, `%d/%m/%Y`)
  * @param trueValues  boolean type: accepted true tokens
  * @param decimalChar number type: decimal separator (default ".")
  * @param groupChar   number type: group (thousands) separator (default none)
  * @param bareNumber  number/integer: if false, strip non-numeric affixes
  * @param missingValues per-field override of package-level missing tokens
  */
final case class Field(
    name: String,
    ftype: String = "string",
    format: String = "default",
    trueValues: Seq[String] = Seq("true", "True", "TRUE", "1"),
    falseValues: Seq[String] = Seq("false", "False", "FALSE", "0"),
    decimalChar: String = ".",
    groupChar: String = "",
    bareNumber: Boolean = true,
    constraints: Constraints = Constraints(),
    missingValues: Option[Seq[String]] = None
)

/** `foreignKeys` entry: child fields reference parent resource's fields.
  * Self-reference uses `resource = ""` per the spec.
  */
final case class ForeignKey(
    fields: Seq[String],
    refResource: String,
    refFields: Seq[String]
)

/** Table-level schema: fields + keys.
  *
  * @param primaryKey  composite primary key (uniqueness + implied required)
  * @param uniqueKeys  frictionless extension: extra unique key-sets
  */
final case class TableSchema(
    fields: Seq[Field],
    primaryKey: Seq[String] = Nil,
    uniqueKeys: Seq[Seq[String]] = Nil,
    foreignKeys: Seq[ForeignKey] = Nil,
    missingValues: Seq[String] = Seq("")
) {
  def field(name: String): Option[Field] = fields.find(_.name == name)
  def fieldNames: Seq[String] = fields.map(_.name)
}

/** CSV dialect (Data Package spec §dialect): the reading options the
  * reference forwards to its CSV parser, with the spec's defaults.
  *
  * @param doubleQuote   a quote inside a quoted cell is escaped by
  *                      doubling it (RFC 4180) — the spec default,
  *                      active only when no `escapeChar` is declared
  * @param escapeChar    alternative escape character (mutually
  *                      exclusive with doubleQuote per the spec; when
  *                      set it wins)
  * @param lineTerminator row separator; `\r\n` (spec default) and
  *                      `\n` are auto-detected by the parser, any
  *                      other single character is set explicitly
  * @param skipInitialSpace ignore whitespace immediately after the
  *                      delimiter
  * @param commentChar   lines starting with this character are skipped
  */
final case class Dialect(
    delimiter: String = ",",
    quoteChar: String = "\"",
    header: Boolean = true,
    doubleQuote: Boolean = true,
    escapeChar: Option[String] = None,
    lineTerminator: String = "\r\n",
    skipInitialSpace: Boolean = false,
    commentChar: Option[String] = None
)

/** One tabular resource of a data package: named table + path + schema.
  * `inlineData` carries rows embedded in the descriptor (`data` key,
  * S3 in SURVEY.md §2.1) — all values as strings, parsed like CSV cells.
  * `paths` carries additional chunk paths when the descriptor's `path`
  * is an array (multi-file resources concatenate).
  */
final case class Resource(
    name: String,
    path: String,
    schema: TableSchema,
    inlineData: Option[Seq[Map[String, String]]] = None,
    paths: Seq[String] = Nil,
    dialect: Dialect = Dialect()
) {
  /** Every file of the resource (single- and multi-path forms). */
  def allPaths: Seq[String] = if (paths.nonEmpty) paths else Seq(path)
}

/** The `datapackage.json` unit that `validate()` operates on. */
final case class Package(
    name: String,
    resources: Seq[Resource]
) {
  def resource(name: String): Option[Resource] =
    resources.find(_.name == name)
}
