package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvCodec
import graft.sources.AvCodec.AvInfo

/** A/V container-header codec: synth → parse roundtrips plus the
  * reject paths (the same fixture discipline as ImageCodecSpec). */
class AvCodecSpec extends AnyFunSuite {

  test("wav roundtrip: rate/channels recovered from the fmt chunk") {
    for ((r, c, b) <- Seq((8000, 1, 16), (44100, 2, 16), (48000, 2, 24)))
      assert(AvCodec.parse(AvCodec.synthWav(r, c, b))
        === Some(AvInfo("wav", r, c, null)))
  }

  test("wav chunk scan skips a leading non-fmt chunk") {
    val base = AvCodec.synthWav(22050, 1, 16)
    // splice a 6-byte JUNK chunk (odd size exercises word alignment)
    val junk = "JUNK".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    assert(AvCodec.parse(spliced) === Some(AvInfo("wav", 22050, 1, null)))
  }

  test("mp4 ftyp major brand") {
    for (brand <- Seq("isom", "mp42", "avc1"))
      assert(AvCodec.parse(AvCodec.synthMp4(brand))
        === Some(AvInfo("mp4", 0, 0, brand)))
  }

  test("mp4 video: dims from moov/trak/tkhd, duration from mvhd") {
    assert(AvCodec.parse(AvCodec.synthMp4Video("mp42", 640, 360, 2500L))
      === Some(AvInfo("mp4", 0, 0, "mp42", 640, 360, 2500L)))
    // a bare ftyp (no moov) keeps zeros — headers-only is still valid
    assert(AvCodec.parse(AvCodec.synthMp4("isom"))
      === Some(AvInfo("mp4", 0, 0, "isom", 0, 0, 0L)))
  }

  test("wav duration: data-chunk bytes over the fmt byte rate") {
    // byteRate = 8000*1*2 = 16000; 1200 data bytes -> 75 ms exactly
    assert(AvCodec.parse(AvCodec.synthWav(8000, 1, 16, dataBytes = 1200))
      === Some(AvInfo("wav", 8000, 1, null, 0, 0, 75L)))
    // empty data chunk -> duration 0 (the legacy 44-byte shape)
    assert(AvCodec.parse(AvCodec.synthWav(8000, 1, 16))
      === Some(AvInfo("wav", 8000, 1, null)))
  }

  test("ogg bitstream serial") {
    assert(AvCodec.parse(AvCodec.synthOgg(31337))
      === Some(AvInfo("ogg", 0, 0, "31337")))
  }

  test("a truncated fmt chunk never reads neighbor bytes as a sample rate") {
    // fmt declaring size 4 (< the 16-byte PCM body): the bytes at +12
    // belong to the NEXT chunk and must not surface as metadata
    def le32b(v: Int) =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val bad = "RIFF".getBytes ++ le32b(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(4) ++ le32b(0) ++
      AvCodec.synthWav(8000, 1, 16).drop(12)
    // the real fmt chunk later in the stream still parses
    assert(AvCodec.parse(bad) === Some(AvInfo("wav", 8000, 1, null)))
    // with NO real fmt chunk at all, the truncated one yields None
    val onlyBad = "RIFF".getBytes ++ le32b(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(4) ++ le32b(0)
    assert(AvCodec.parse(onlyBad) === None)
  }

  test("a corrupt-sized tail keeps the prefix's duration, not just fmt") {
    // data chunk BEFORE fmt, then a negative-size junk chunk: the early
    // return must carry the already-parsed data-chunk duration
    def le32b(v: Int) =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val dataFirst = "RIFF".getBytes ++ le32b(36) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32b(1200) ++ new Array[Byte](1200) ++
      AvCodec.synthWav(8000, 1, 16).drop(12).dropRight(8) ++ // fmt only
      "junk".getBytes ++ le32b(-8)
    assert(AvCodec.parse(dataFirst)
      === Some(AvInfo("wav", 8000, 1, null, 0, 0, 75L)))
  }

  test("garbage and truncated inputs are rejected, not mis-parsed") {
    assert(AvCodec.parse("not a container at all".getBytes) === None)
    assert(AvCodec.parse(AvCodec.synthWav(8000, 1, 16).take(20)) === None)
    assert(AvCodec.parse(Array.empty[Byte]) === None)
    // an OGG page with a nonzero version byte is a future format: reject
    val v1 = AvCodec.synthOgg(1); v1(4) = 9
    assert(AvCodec.parse(v1) === None)
  }
}
