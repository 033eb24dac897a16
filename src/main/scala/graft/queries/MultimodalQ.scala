package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.functions.Hashing.{polyHashDuck, A, B, P}
import graft.ops.Multimodal

/** Oracle-checked multimodal-plumbing queries. The codecs are real parsers
  * of real uncompressed containers (PPM P6 / RIFF WAVE — see
  * [[graft.ops.Multimodal]]); the payload generators wrap ASCII text bytes,
  * so the DuckDB oracle reproduces every decode output with string
  * arithmetic: byte k of the media payload == char code k of the text. */
object MultimodalQ {

  val all: Seq[Q] = Seq(

    // Binary PPM payload → mapPartitions header parse → typed metadata.
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

    // REAL PNG round trip (round 12): the deterministic text-byte raster is
    // encoded through the JDK's actual PNG writer (zlib deflate + filters)
    // and decoded back with ImageIO — and because PNG is LOSSLESS, the
    // decoded-raster checksum is an exact function of the text, so the
    // oracle replays dims + checksum with string arithmetic, exactly like
    // the PPM row but through a real compressed codec. A stride, filter,
    // or color-order bug anywhere in the round trip breaks the hash.
    Q("mm_decode_png",
      (s, dir) =>
        Multimodal.decodePngMeta(
            Multimodal.withPngPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text,
              |                  CAST(length(text) AS BIGINT) AS len,
              |                  4 + length(text) % 9 AS w,
              |                  4 + unicode(substr(text, 1, 1)) % 7 AS h
              |           FROM documents)
              |SELECT doc_id,
              |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
              |  CAST(3 AS INTEGER) AS channels,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(range(0, CAST(w*h*3 AS BIGINT)), k ->
              |      CAST(unicode(substr(text, CAST(k % len AS INT) + 1, 1)) AS BIGINT))),
              |    (a, v) -> (a*31 + v) % $P) AS checksum
              |FROM d ORDER BY doc_id""".stripMargin)),

    // PNG decode→resize COMPOSITION (round 13): the downstream raster op
    // consumes the REAL-codec decode output — ImageIO runs the full
    // zlib/filter decode, then the nearest-neighbor 2× downsample samples
    // (2r, 2c) pixels and folds R,G,B row-major. Lossless codec ⇒ the
    // oracle replays the sampled raster bytes with string arithmetic:
    // pixel (r, c) channel ch = char code ((3·(r·w + c) + ch) mod len).
    Q("mm_resize_png",
      (s, dir) =>
        Multimodal.resizePngImagesHalf(
            Multimodal.withPngPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text,
              |                  CAST(length(text) AS BIGINT) AS len,
              |                  CAST(4 + length(text) % 9 AS BIGINT) AS w,
              |                  CAST(4 + unicode(substr(text, 1, 1)) % 7 AS BIGINT) AS h
              |           FROM documents),
              |o AS (SELECT doc_id, text, len, w, h, (w + 1) // 2 AS out_w,
              |        (h + 1) // 2 AS out_h FROM d),
              |idx AS (SELECT doc_id, text, len, w, h, out_w, out_h,
              |   flatten(list_transform(range(0, out_h), r ->
              |     flatten(list_transform(range(0, out_w), c ->
              |       [3*((2*r)*w + 2*c), 3*((2*r)*w + 2*c) + 1,
              |        3*((2*r)*w + 2*c) + 2])))) AS ks FROM o)
              |SELECT doc_id, CAST(w AS INTEGER) AS in_w,
              |  CAST(h AS INTEGER) AS in_h,
              |  CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ks, k ->
              |    CAST(unicode(substr(text, CAST(k % len AS INT) + 1, 1)) AS BIGINT))),
              |    (a, v) -> (a*31 + v) % $P) AS checksum
              |FROM idx ORDER BY doc_id""".stripMargin)),

    // REAL JPEG decode (round 12): a smooth gradient raster encoded through
    // the JDK's DCT JPEG writer, decoded with ImageIO. Dims and channels
    // survive lossy coding and are oracle-checked; decoded PIXELS are
    // codec-defined, so pixel fidelity (determinism + mean-error bound) is
    // pinned in MultimodalSpec instead of a cross-engine hash.
    Q("mm_decode_jpeg",
      (s, dir) =>
        Multimodal.decodeJpegMeta(
            Multimodal.withJpegPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(8 + length(text) % 9 AS INTEGER) AS width,
             |  CAST(8 + unicode(substr(text, 1, 1)) % 7 AS INTEGER) AS height,
             |  CAST(3 AS INTEGER) AS channels
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL 2:1 audio decimation over the parsed PCM — the audio analog of
    // the image resize: header re-parse, every second sample kept, rate
    // halved. Data bytes are the text chars, so the oracle keeps the odd
    // 1-indexed positions.
    Q("mm_audio_resample",
      (s, dir) =>
        Multimodal.resampleAudioHalf(
            Multimodal.withAudioPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS orig_rate,
              |  CAST((8000 + (doc_id % 8) * 1000) // 2 AS INTEGER) AS new_rate,
              |  CAST(length(text) AS BIGINT) AS n_in,
              |  (CAST(length(text) AS BIGINT) + 1) // 2 AS n_out,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(range(0, (length(text) + 1) // 2), k ->
              |      CAST(unicode(substr(text, CAST(2*k + 1 AS INT), 1)) AS BIGINT))),
              |    (a, v) -> (a*31 + v) % $P) AS checksum
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL nearest-neighbor 2x downsample over the parsed raster: width
    // from the re-parsed container header, row-major stride addressing,
    // sampled (2r, 2c) pixels folded into a checksum — the resize step of
    // the brief's decode/feature/resize/frame-sample quartet.
    Q("mm_resize_half",
      (s, dir) =>
        Multimodal.resizeImagesHalf(
            Multimodal.withPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
              |            CAST(64 + (length(text) % 577) AS BIGINT) AS w
              |           FROM documents),
              |x AS (SELECT doc_id, text, len, w, (len + w - 1) // w AS in_h FROM d),
              |o AS (SELECT doc_id, text, len, w, in_h, (w + 1) // 2 AS out_w,
              |        (in_h + 1) // 2 AS out_h FROM x),
              |idx AS (SELECT doc_id, text, len, w, in_h, out_w, out_h,
              |   flatten(list_transform(range(0, out_h), r ->
              |     list_transform(range(0, out_w), c -> 2*r*w + 2*c))) AS ks FROM o)
              |SELECT doc_id, CAST(w AS INTEGER) AS in_w,
              |  CAST(in_h AS INTEGER) AS in_h,
              |  CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ks, k ->
              |    CAST(CASE WHEN k < len
              |         THEN unicode(substr(text, CAST(k AS INT) + 1, 1))
              |         ELSE 0 END AS BIGINT))), (a, v) -> (a*31 + v) % $P)
              |    AS checksum
              |FROM idx ORDER BY doc_id""".stripMargin)),

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

    // RIFF/WAVE audio: encode (text bytes as 8-bit mono PCM, per-doc sample
    // rate) → little-endian header parse → typed audio metadata.
    Q("mm_audio_meta",
      (s, dir) =>
        Multimodal.decodeAudioMeta(
            Multimodal.withAudioPayload(Catalog.load(s, dir, "documents")))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
              |  CAST(1 AS INTEGER) AS n_channels,
              |  CAST(8 AS INTEGER) AS bits,
              |  CAST(length(text) AS BIGINT) AS n_samples,
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
