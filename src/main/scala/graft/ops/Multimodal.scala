package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract run as
  * batched per-partition functions over the bytes (the Scala analog of
  * `mapInPandas` — one executor task streams through a partition of payloads
  * without driver involvement).
  *
  * ==== STUB NOTICE ====
  * This container has no image/audio codecs, so [[decodeImageMeta]]'s
  * "decode" is a clearly-marked DETERMINISTIC FAKE: pure integer arithmetic
  * over the payload bytes (length, first byte, polynomial checksum). The
  * Spark-side plumbing — binary schema, partition-batched execution, typed
  * output, downstream explode — is real and oracle-tested; swapping the fake
  * for an actual codec changes only the body of `fakeDecode`.
  */
object Multimodal {

  /** Input/output rows of the decode stage. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class ImageMeta(
      doc_id: Long, width: Int, height: Int, channels: Int, checksum: Long)

  private val P = graft.functions.Hashing.P

  /** Attach a binary payload + metadata struct to the documents table (the
    * corpus's stand-in for real media bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("n_chars"), col("lang"), col("source")).as("meta"))

  /** DETERMINISTIC FAKE decode — stands in for an image codec. Pure integer
    * arithmetic over the bytes so the DuckDB oracle can replicate it. */
  private def fakeDecode(m: MediaIn): ImageMeta = {
    val bytes = m.payload
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % P; i += 1 }
    ImageMeta(
      doc_id = m.doc_id,
      width = 64 + (bytes.length % 577),
      height = 64 + ((first * 31 + bytes.length) % 417).toInt,
      channels = 3,
      checksum = h)
  }

  /** Decode stage: binary payloads → typed image metadata, executed
    * partition-batched on executors (`mapPartitions`), never on the driver.
    * At 100 TB each task decodes its partition's payloads in a streaming
    * fashion; output is columnar again immediately after. */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaIn] = media.select(col("doc_id"), col("payload")).as[MediaIn]
    typed.mapPartitions(batch => batch.map(fakeDecode)).toDF()
  }

  /** One (doc, dim, value) row of the feature stub. */
  final case class ImageFeature(doc_id: Long, dim: Int, value: Double)

  /** Feature-extraction stage — the media-embedding step of a multimodal
    * training pipeline, executed partition-batched like the decode. The
    * DETERMINISTIC FAKE maps the decode checksum to `dims` pseudo-features
    * with pure integer arithmetic plus ONE final IEEE division, so the
    * oracle replicates it exactly; a real extractor would replace the body
    * with a model forward pass over the payload. Features emit as scalar
    * (doc_id, dim, value) rows — columnar, explode-shaped, ANN-joinable. */
  def extractFeatures(decoded: DataFrame, dims: Int = 8): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    import graft.functions.Hashing.{A, B}
    val typed = decoded.select(col("doc_id"), col("checksum"))
      .as[(Long, Long)]
    typed.mapPartitions(_.flatMap { case (id, checksum) =>
      (0 until dims).iterator.map { d =>
        ImageFeature(id, d, ((checksum * A(d) + B(d)) % P).toDouble / P)
      }
    }).toDF()
  }

  /** Frame sampling: one row per sampled frame, frame count derived from the
    * media id, per-frame checksum chained off the decode checksum. A real
    * pipeline would seek into the payload per frame; the explode shape and
    * per-frame output schema are what carry over. */
  def sampleFrames(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("f", explode(expr("sequence(0, CAST(doc_id % 16 AS INT))")))
      .select(col("doc_id"), col("f"),
        expr(s"(checksum * 31 + f) % $P").as("frame_checksum"))
}
