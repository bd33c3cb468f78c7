package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.schema.{Package, Resource}

/** CSV twin of the parquet star schema, for benching the reference's
  * FLAGSHIP ingest shape: the upstream validates CSV files (S2
  * all-string read + missing-token projection + per-field parse), so a
  * parquet-only e2e number under-reports what a switching user would
  * pay. [[ensure]] materializes each table once (idempotent — keyed on
  * the table directory's `_SUCCESS`) and returns a [[Package]] whose
  * resources point at the CSV copies; `Bench` times
  * `Validate.validateCsv` over it as `e2e_validate_csv`.
  *
  * `embeddings` is EXCLUDED: its `Array[Float]` column has no CSV
  * representation (Spark's CSV writer rejects array types), and the
  * reference's data model — like CSV — is flat scalars. All nine flat
  * tables round-trip: timestamps serialize as
  * `yyyy-MM-dd'T'HH:mm:ss.SSSSSS` (the default datetime parser's
  * fraction variant), quotes in `props` ride the standard doubleQuote
  * dialect.
  */
object CsvFixture {

  val TimestampFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Star-schema resources minus the array-typed `embeddings`. */
  private def csvResources: Seq[Resource] =
    Tables.starSchema.resources.filterNot(_.name == "embeddings")

  /** Write (once) and describe the CSV twin of `sfDir`. The fixture
    * lands under `outBase/<sf-leaf>/<table>/` as header'd part files —
    * plural part files on purpose: a real lake drop is multi-file, and
    * the reader's multi-path concat (S2) is part of what e2e times.
    */
  def ensure(spark: SparkSession, sfDir: String,
      outBase: String = "target/csv_fixture"): Package = {
    val leaf = Paths.get(sfDir).getFileName.toString
    val base = Paths.get(outBase, leaf).toAbsolutePath
    val resources = csvResources.map { res =>
      val dir = base.resolve(res.name)
      if (!Files.exists(dir.resolve("_SUCCESS"))) {
        Tables.load(spark, sfDir, res.name)
          .write
          .option("header", "true")
          .option("timestampFormat", TimestampFmt)
          // standard doubled-quote escaping ("" inside a quoted cell) —
          // Spark's writer default is backslash-escape, which the
          // doubleQuote read dialect would mis-parse
          .option("escape", "\"")
          .mode("overwrite")
          .csv(dir.toString)
      }
      res.copy(path = dir.toString)
    }
    Package(Tables.starSchema.name + "_csv", resources)
  }
}
