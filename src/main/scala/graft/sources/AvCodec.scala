package graft.sources

/** Real audio/video CONTAINER-header decoding for the multimodal column
  * pipeline — the A/V sibling of `ImageCodec` (same design: pure JVM,
  * no codec libraries; parse the container headers, leave sample/frame
  * decode to a codec dependency slotted into the same per-partition
  * stage). Reference analog: the mapper's media classification stage
  * treats binaries as opaque payload + typed metadata.
  *
  *   - WAV: "RIFF"+size+"WAVE", then a chunk scan to "fmt ":
  *     channels u16 LE at +10, sample rate u32 LE at +12, bits u16 LE
  *     at +22 of the chunk header (RIFF/WAVE spec).
  *   - MP4/ISO-BMFF: first box size u32 BE, type "ftyp", major brand
  *     4cc at byte 8 (ISO 14496-12 §4.3). Track dimensions live in
  *     moov/tkhd — below header depth, like pixel decode for images.
  *   - OGG: "OggS" capture pattern, version 0, bitstream serial u32 LE
  *     at byte 14 (RFC 3533 §6).
  */
object AvCodec {

  /** container: wav|mp4|ogg; rate/channels 0 when not applicable;
    * brand: ftyp 4cc for mp4, bitstream serial (decimal) for ogg. */
  final case class AvInfo(container: String, sampleRate: Int, channels: Int,
      brand: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  def parse(b: Array[Byte]): Option[AvInfo] =
    wav(b).orElse(mp4(b)).orElse(ogg(b))

  private def wav(b: Array[Byte]): Option[AvInfo] = {
    if (b.length < 36 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    // Long cursor + sign check: a hostile chunk size with the high bit
    // set is negative under le32 (e.g. -8 makes the advance ZERO — an
    // infinite loop hanging the task, worse than a throw), and an Int
    // cursor could wrap past 2^31 on a large legitimate size. Corrupt
    // sizing must return None, totally.
    var i = 12L // chunk scan: fmt need not be the first chunk
    while (i + 8 <= b.length) {
      val at = i.toInt // fits: i + 8 <= b.length <= Int.MaxValue
      val id = ascii(b, at, 4)
      val size = le32(b, at + 4)
      if (id == "fmt " && i + 24 <= b.length)
        return Some(AvInfo("wav", le32(b, at + 12), le16(b, at + 10), null))
      if (size < 0) return None
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  private def mp4(b: Array[Byte]): Option[AvInfo] =
    if (b.length >= 12 && ascii(b, 4, 4) == "ftyp")
      Some(AvInfo("mp4", 0, 0, ascii(b, 8, 4)))
    else None

  private def ogg(b: Array[Byte]): Option[AvInfo] =
    if (b.length >= 18 && ascii(b, 0, 4) == "OggS" && u8(b, 4) == 0)
      Some(AvInfo("ogg", 0, 0, le32(b, 14).toString))
    else None

  // ------------------------------------------------------- synthesizers

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32b(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be32b(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Canonical 44-byte WAV header (PCM, empty data chunk). */
  def synthWav(sampleRate: Int, channels: Int, bits: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * bits / 8
    "RIFF".getBytes ++ le32b(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(sampleRate) ++ le32b(byteRate) ++ le16b(channels * bits / 8) ++
      le16b(bits) ++ "data".getBytes ++ le32b(0)
  }

  /** Minimal ftyp box: major brand + one compatible brand. */
  def synthMp4(brand: String): Array[Byte] = {
    require(brand.length == 4, "4cc brand")
    be32b(20) ++ "ftyp".getBytes ++ brand.getBytes ++ be32b(0) ++ brand.getBytes
  }

  /** Minimal OGG page header (version 0, zero segments). */
  def synthOgg(serial: Int): Array[Byte] =
    "OggS".getBytes ++ Array[Byte](0, 2) ++ new Array[Byte](8) ++
      le32b(serial) ++ new Array[Byte](4 + 4 + 1)
}
