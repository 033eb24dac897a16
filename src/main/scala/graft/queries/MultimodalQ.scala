package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.functions.Hashing.{polyHashDuck, P}
import graft.ops.Multimodal

/** Oracle-checked multimodal-plumbing queries. The decode is a deterministic
  * fake (see [[graft.ops.Multimodal]]) over ASCII payload bytes, so the
  * DuckDB oracle reproduces it with string arithmetic: byte k of the payload
  * == char code k of the text. */
object MultimodalQ {

  val all: Seq[Q] = Seq(

    // Binary payload → mapPartitions decode → typed metadata.
    Q("mm_decode_meta",
      (s, dir) =>
        Multimodal.decodeImageMeta(
            Multimodal.withPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(64 + (length(text) % 577) AS INTEGER) AS width,
              |  CAST(64 + ((unicode(substr(text, 1, 1))*31 + length(text)) % 417) AS INTEGER) AS height,
              |  CAST(3 AS INTEGER) AS channels,
              |  ${polyHashDuck("text")} AS checksum
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling: per-media frame explosion with chained checksums.
    Q("mm_frame_sample",
      (s, dir) =>
        Multimodal.sampleFrames(
            Multimodal.decodeImageMeta(
              Multimodal.withPayload(Catalog.load(s, dir, "documents"))))
          .orderBy("doc_id", "f"),
      Some(s"""WITH m AS (SELECT doc_id, ${polyHashDuck("text")} AS checksum FROM documents),
              |fr AS (SELECT doc_id, checksum,
              |              unnest(range(0, 1 + doc_id % 16)) AS f FROM m)
              |SELECT doc_id, CAST(f AS INTEGER) AS f,
              |       (checksum * 31 + f) % $P AS frame_checksum
              |FROM fr ORDER BY doc_id, f""".stripMargin))
  )
}
