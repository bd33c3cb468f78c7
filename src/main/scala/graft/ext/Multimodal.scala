package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.6): image/audio/video as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted
  * in per-partition batches.
  *
  * The Spark-side plumbing — schema, batching, partitioning, typed
  * output — is real and tested. The actual codec call is STUBBED (no
  * image/audio libraries in this container): `decodeStub` derives
  * deterministic fake features from the bytes, and is the single seam to
  * replace with a real decoder (e.g. JNI/FFI codec invoked per batch).
  */
object Multimodal {

  /** Media row after decode: typed metadata per blob. */
  final case class MediaMeta(
      id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Attach a binary payload + basic metadata to an id/text pair —
    * stands in for reading real media blobs alongside scalar columns.
    */
  def withBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
      col(payloadCol).cast(BinaryType).as("blob"))
      .withColumn("n_bytes", octet_length(col("blob")))

  // ---------------------------------------------------------------- STUB
  /** ??? REAL DECODER GOES HERE ???
    * Deterministic fake decode: derives "image" dimensions from a
    * portable 48-bit hash of the blob bytes (md5 prefix — the same value
    * `Dedup.hash48` computes SQL-side, so the stub is oracle-checkable).
    * Replace the body with the real codec; the signature — bytes in,
    * typed features out, called once per row inside a partition batch —
    * is the production shape.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val h: Long =
      if (n == 0) 0L
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(bytes).take(6).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16)
      }
    MediaMeta(
      id = id,
      n_bytes = n,
      format = if (n % 2 == 0) "png" else "jpeg",
      width = (h % 640 + 1).toInt,
      height = (h / 640 % 480 + 1).toInt,
      n_frames = 1)
  }

  /** Batched decode over partitions: the executor-side pattern for codec
    * work — one iterator pass per partition, no per-row task overhead,
    * output is a typed Dataset. (Scala analogue of `mapInPandas`:
    * arbitrary per-batch native work between two typed schemas.)
    */
  def decode(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch boundary: a real implementation would init the codec
        // once here and feed it the whole partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** "Frame sampling" plumbing for video-like blobs: emit k byte-range
    * slices per blob with offsets — the schema/batch shape of real frame
    * extraction (each slice row would be a decoded frame tensor).
    */
  def sampleFrames(df: DataFrame, k: Int = 3): DataFrame = {
    val n = col("n_bytes")
    val idx = sequence(lit(0), lit(k - 1))
    val stride = greatest((n / k).cast(IntegerType), lit(1))
    df.select(col("id"), col("blob"), n,
        explode(transform(idx, i => i * stride)).as("offset"))
      .filter(col("offset") < n)
      .select(col("id"), col("offset"),
        substring(base64(col("blob")), 1, 16).as("frame_head"))
  }

  /** JSON-typed metadata column → typed struct/fields (events.props). */
  def extractJsonField(df: DataFrame, jsonCol: String, field: String): DataFrame =
    df.withColumn(field,
      get_json_object(col(jsonCol), s"$$.$field").cast(LongType))
}
