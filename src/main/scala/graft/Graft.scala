package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.report.PackageReport
import graft.schema.DescriptorJson

/** Top-level convenience API — the reference's own entry-point shape
  * (`report = goodtables.validate("datapackage.json")`, SURVEY.md §3 E1)
  * on Spark: load the descriptor, resolve relative resource paths
  * against the descriptor's directory, run the full read → header →
  * parse → constraints → keys → foreign-keys lifecycle, return the
  * report.
  */
object Graft {

  /** Validate a data package from its `datapackage.json` path. */
  def validate(spark: SparkSession, descriptorPath: String): PackageReport = {
    val p = Paths.get(descriptorPath)
    val json = Files.readString(p)
    val pkg = DescriptorJson.parsePackage(json)
    val dir = Option(p.getParent).map(_.toString).getOrElse(".")
    // resource paths are relative to the descriptor (Data Package spec)
    val resolved = pkg.copy(resources = pkg.resources.map { r =>
      def abs(s: String): String =
        if (s.isEmpty || Paths.get(s).isAbsolute) s
        else Paths.get(dir, s).toString
      r.copy(path = abs(r.path), paths = r.paths.map(abs))
    })
    Validate.validateCsv(spark, resolved)
  }

  /** Validate an in-memory descriptor JSON string (paths absolute). */
  def validateJson(spark: SparkSession, descriptorJson: String): PackageReport =
    Validate.validateCsv(spark, DescriptorJson.parsePackage(descriptorJson))
}
