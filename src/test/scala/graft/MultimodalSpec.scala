package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaIn

/** Direct byte-level tests of the real container parsers (PPM P6, RIFF
  * WAVE) — independent of the payload generators, so a generator/parser
  * bug pair cannot cancel out. */
class MultimodalSpec extends SparkSpec {

  test("decodePpm parses a hand-built P6 header and checksums the raster") {
    val raster = Array[Byte](1, 2, 3, 4, 5, 6)
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    val m = Multimodal.decodePpm(MediaIn(7L, ppm))
    assert(m.width === 2 && m.height === 1 && m.channels === 3)
    val expected = raster.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % graft.functions.Hashing.P)
    assert(m.checksum === expected)
  }

  test("decodePpm accepts multi-digit dims and arbitrary header whitespace") {
    val ppm = "P6  640\t480\n255 ".getBytes("US-ASCII") ++ Array[Byte](9)
    val m = Multimodal.decodePpm(MediaIn(1L, ppm))
    assert(m.width === 640 && m.height === 480)
    assert(m.checksum === 9L)
  }

  test("decodePpm rejects non-PPM payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(MediaIn(0L, "JFIF....".getBytes))
    }
  }

  test("decodeWav parses fields back from a generated container") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((3L, "hello wav", 9L, "en", "t"))
      .toDF("doc_id", "text", "n_chars", "lang", "source")
    val out = Multimodal.decodeAudioMeta(Multimodal.withAudioPayload(docs))
      .select("sample_rate", "n_channels", "bits", "n_samples").head
    assert(out.getInt(0) === 8000 + 3 * 1000)
    assert(out.getInt(1) === 1 && out.getInt(2) === 8)
    assert(out.getLong(3) === "hello wav".length.toLong)
  }

  test("decodeWav rejects a truncated or non-RIFF payload") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(MediaIn(0L, Array.fill[Byte](50)('x')))
    }
  }
}
