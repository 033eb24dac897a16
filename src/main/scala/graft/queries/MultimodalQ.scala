package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.functions.Hashing.{polyHashDuck, A, B, P}
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

    // Feature extraction (embedding stub): checksum → 8 pseudo-features,
    // partition-batched; integer arithmetic + one IEEE division keeps the
    // oracle exact.
    Q("mm_feature_extract", {
      (s, dir) =>
        Multimodal.extractFeatures(
            Multimodal.decodeImageMeta(
              Multimodal.withPayload(Catalog.load(s, dir, "documents"))))
          .orderBy("doc_id", "dim")
      },
      Some {
        val aList = A.take(8).mkString("[", ",", "]")
        val bList = B.take(8).mkString("[", ",", "]")
        s"""WITH m AS (SELECT doc_id, ${polyHashDuck("text")} AS checksum FROM documents),
           |d AS (SELECT doc_id, checksum, unnest(range(0, 8)) AS dim FROM m)
           |SELECT doc_id, CAST(dim AS INTEGER) AS dim,
           |  CAST((checksum * list_extract($aList, CAST(dim AS INTEGER) + 1)
           |        + list_extract($bList, CAST(dim AS INTEGER) + 1)) % $P AS DOUBLE)
           |    / ${P}.0 AS value
           |FROM d ORDER BY doc_id, dim""".stripMargin
      }),

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
