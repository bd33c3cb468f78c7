package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Parse a `datapackage.json` / table-schema JSON descriptor into the
  * [[Package]]/[[TableSchema]] model. Driver-side only — no Spark job.
  *
  * Uses Jackson (ships with Spark at /opt/spark/jars) with manual tree
  * walking so defaulting rules of Table Schema v1 are explicit.
  * Structural problems raise [[DescriptorError]] (the reference reports
  * these as `schema-error` and aborts the table — SURVEY.md §3 E1 step 1).
  */
final case class DescriptorError(msg: String) extends Exception(msg)

object DescriptorJson {
  private val mapper = new ObjectMapper()

  def parsePackage(json: String): Package = {
    val root = mapper.readTree(json)
    if (root == null || !root.isObject)
      throw DescriptorError("descriptor is not a JSON object")
    val name = txt(root, "name").getOrElse("package")
    val resources = Option(root.get("resources")) match {
      case Some(arr) if arr.isArray && arr.size() > 0 =>
        arr.elements().asScala.map(parseResource).toSeq
      case _ => throw DescriptorError("descriptor has no resources")
    }
    Package(name, resources)
  }

  def parseResource(n: JsonNode): Resource = {
    val name = txt(n, "name")
      .getOrElse(throw DescriptorError("resource missing name"))
    // `path` may be a string or an array of chunk paths (spec §path)
    val allPaths = Option(n.get("path")).map(strOrSeq).getOrElse(Nil)
    val path = allPaths.headOption.getOrElse("")
    val dialect = Option(n.get("dialect")).filter(_.isObject).map { dn =>
      Dialect(
        delimiter = txt(dn, "delimiter").getOrElse(","),
        quoteChar = txt(dn, "quoteChar").getOrElse("\""),
        header = Option(dn.get("header")).forall(_.asBoolean(true)),
        doubleQuote = Option(dn.get("doubleQuote")).forall(_.asBoolean(true)),
        escapeChar = txt(dn, "escapeChar"),
        lineTerminator = txt(dn, "lineTerminator").getOrElse("\r\n"),
        skipInitialSpace =
          Option(dn.get("skipInitialSpace")).exists(_.asBoolean(false)),
        commentChar = txt(dn, "commentChar"))
    }.getOrElse(Dialect())
    val schema = Option(n.get("schema")).filter(_.isObject)
      .map(parseTableSchema)
      .getOrElse(throw DescriptorError(s"resource $name missing schema"))
    // S3: inline `data` — array of objects (keyed rows) or array of
    // arrays (first row = header)
    val inline = Option(n.get("data")).filter(_.isArray).map { arr =>
      val rows = arr.elements().asScala.toSeq
      if (rows.isEmpty) Seq.empty[Map[String, String]]
      else if (rows.head.isObject)
        rows.map(r => r.properties().asScala
          .map(e => e.getKey -> cell(e.getValue)).toMap)
      else {
        val header = rows.head.elements().asScala.map(_.asText()).toSeq
        rows.tail.map(r => header.zip(
          r.elements().asScala.map(cell).toSeq).toMap)
      }
    }
    if (path.isEmpty && inline.isEmpty)
      throw DescriptorError(s"resource $name has neither path nor data")
    Resource(name, path, schema, inline, paths = allPaths, dialect = dialect)
  }

  /** Inline cells arrive as JSON scalars; the engine parses strings
    * (same as CSV), so nulls stay null and scalars stringify.
    */
  private def cell(n: JsonNode): String =
    if (n == null || n.isNull) null else n.asText()

  def parseTableSchema(json: String): TableSchema =
    parseTableSchema(mapper.readTree(json))

  def parseTableSchema(n: JsonNode): TableSchema = {
    val fields = Option(n.get("fields")) match {
      case Some(arr) if arr.isArray =>
        arr.elements().asScala.map(parseField).toSeq
      case _ => throw DescriptorError("schema missing fields")
    }
    // primaryKey may be a single string or an array of strings
    val pk = Option(n.get("primaryKey")).map(strOrSeq).getOrElse(Nil)
    val uks = Option(n.get("uniqueKeys")).filter(_.isArray)
      .map(_.elements().asScala.map(strOrSeq).toSeq).getOrElse(Nil)
    val fks = Option(n.get("foreignKeys")).filter(_.isArray)
      .map(_.elements().asScala.map(parseForeignKey).toSeq).getOrElse(Nil)
    val missing = Option(n.get("missingValues")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq(""))
    TableSchema(fields, pk, uks, fks, missing)
  }

  def parseField(n: JsonNode): Field = {
    val name = txt(n, "name")
      .getOrElse(throw DescriptorError("field missing name"))
    val d = Field(name)
    Field(
      name = name,
      ftype = txt(n, "type").getOrElse(d.ftype),
      format = txt(n, "format").getOrElse(d.format),
      trueValues = seq(n, "trueValues").getOrElse(d.trueValues),
      falseValues = seq(n, "falseValues").getOrElse(d.falseValues),
      decimalChar = txt(n, "decimalChar").getOrElse(d.decimalChar),
      groupChar = txt(n, "groupChar").getOrElse(d.groupChar),
      bareNumber = Option(n.get("bareNumber")).forall(_.asBoolean(true)),
      constraints = Option(n.get("constraints")).filter(_.isObject)
        .map(parseConstraints).getOrElse(Constraints()),
      missingValues = seq(n, "missingValues")
    )
  }

  def parseConstraints(n: JsonNode): Constraints = Constraints(
    required = Option(n.get("required")).map(_.asBoolean(false)),
    unique = Option(n.get("unique")).map(_.asBoolean(false)),
    minLength = Option(n.get("minLength")).map(_.asInt()),
    maxLength = Option(n.get("maxLength")).map(_.asInt()),
    minimum = txtOrNum(n, "minimum"),
    maximum = txtOrNum(n, "maximum"),
    pattern = txt(n, "pattern"),
    enum = seq(n, "enum")
  )

  def parseForeignKey(n: JsonNode): ForeignKey = {
    val fields = Option(n.get("fields")).map(strOrSeq)
      .getOrElse(throw DescriptorError("foreignKey missing fields"))
    val ref = Option(n.get("reference")).filter(_.isObject)
      .getOrElse(throw DescriptorError("foreignKey missing reference"))
    val refFields = Option(ref.get("fields")).map(strOrSeq)
      .getOrElse(throw DescriptorError("foreignKey reference missing fields"))
    if (fields.size != refFields.size)
      throw DescriptorError("foreignKey fields/reference.fields arity mismatch")
    ForeignKey(fields, txt(ref, "resource").getOrElse(""), refFields)
  }

  private def strOrSeq(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else Seq(n.asText())

  private def txt(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(v => v.isTextual).map(_.asText())

  /** minimum/maximum may be numeric or string in the descriptor. */
  private def txtOrNum(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(v => v.isTextual || v.isNumber).map(_.asText())

  private def seq(n: JsonNode, k: String): Option[Seq[String]] =
    Option(n.get(k)).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq)
}
