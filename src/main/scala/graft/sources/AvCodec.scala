package graft.sources

/** Real audio/video CONTAINER-header decoding for the multimodal column
  * pipeline — the A/V sibling of `ImageCodec` (same design: pure JVM,
  * no codec libraries; parse the container headers, leave sample/frame
  * decode to a codec dependency slotted into the same per-partition
  * stage). Reference analog: the mapper's media classification stage
  * treats binaries as opaque payload + typed metadata.
  *
  *   - WAV: "RIFF"+size+"WAVE", then a chunk scan to "fmt ":
  *     channels u16 LE at +10, sample rate u32 LE at +12, byte rate
  *     u32 LE at +16, bits u16 LE at +22 of the chunk header (RIFF/
  *     WAVE spec); duration = data-chunk size over byte rate.
  *   - MP4/ISO-BMFF: first box size u32 BE, type "ftyp", major brand
  *     4cc at byte 8 (ISO 14496-12 §4.3); track dimensions from the
  *     moov/trak/tkhd box walk (v0 tkhd: 16.16 fixed-point width at
  *     content +76, height +80), duration from moov/mvhd (v0:
  *     timescale at content +12, duration ticks +16, §8.2.2/§8.3.2).
  *   - OGG: "OggS" capture pattern, version 0, bitstream serial u32 LE
  *     at byte 14 (RFC 3533 §6). Duration needs the LAST page's
  *     granule position — a tail scan, out of header-decode scope.
  */
object AvCodec {

  /** container: wav|mp4|ogg; rate/channels/width/height/durationMs 0
    * when not applicable or not recoverable from the headers;
    * brand: ftyp 4cc for mp4, bitstream serial (decimal) for ogg. */
  final case class AvInfo(container: String, sampleRate: Int, channels: Int,
      brand: String, width: Int = 0, height: Int = 0, durationMs: Long = 0L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  def parse(b: Array[Byte]): Option[AvInfo] =
    wav(b).orElse(mp4(b)).orElse(ogg(b))

  /** THE RIFF/WAVE chunk scan — the single definition both the header
    * decode (wav) and the frame sampler (Multimodal.frameSample) walk,
    * so a totality fix lands in one place. Finds the first chunk named
    * `id`, returning (contentStart, declaredSize). Totality: Long
    * cursor + sign check — a hostile chunk size with the high bit set
    * is negative under le32 (e.g. -8 makes the advance ZERO, an
    * infinite loop hanging the task), and an Int cursor could wrap
    * past 2^31 on a large legitimate size; a corrupt-sized chunk ends
    * the scan (the well-formed prefix stays findable — a chunk BEFORE
    * the corruption point is still returned). */
  private[sources] def findChunk(b: Array[Byte], id: String,
      minSize: Int = 0): Option[(Int, Int)] = {
    if (b.length < 12 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var i = 12L // chunk scan: the target need not be the first chunk
    while (i + 8 <= b.length) {
      val at = i.toInt // fits: i + 8 <= b.length <= Int.MaxValue
      val size = le32(b, at + 4)
      if (size < 0) return None // corrupt tail: stop, totally
      // an id-matching chunk UNDER minSize is skipped, not returned: a
      // truncated fmt chunk must not shadow a valid one later in the
      // stream (spec-pinned)
      if (ascii(b, at, 4) == id && size >= minSize) return Some((at + 8, size))
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** (content start, byte length CLAMPED to bytes present) of the data
    * chunk: a truncated file (common in dump corpora) must expose the
    * samples it HOLDS, not the full declared size. */
  private[sources] def dataRange(b: Array[Byte]): Option[(Int, Int)] =
    findChunk(b, "data").map { case (start, size) =>
      (start, math.min(size.toLong, math.max(0L, b.length - start.toLong)).toInt)
    }

  private def wav(b: Array[Byte]): Option[AvInfo] =
    // minSize 16 (the PCM fmt body): the fmt fields are only real if
    // the chunk DECLARES them — a truncated fmt chunk must not read
    // the next chunk's bytes as a sample rate
    findChunk(b, "fmt ", minSize = 16).collect {
      case (at, _) if at + 16 <= b.length =>
        val rate = le32(b, at + 4)
        val channels = le16(b, at + 2)
        val byteRate = le32(b, at + 8)
        val durMs = dataRange(b) match {
          case Some((_, len)) if len > 0 && byteRate > 0 =>
            len.toLong * 1000L / byteRate
          case _ => 0L
        }
        AvInfo("wav", rate, channels, null, durationMs = durMs)
    }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** ISO-BMFF boxes of `b[from, to)` as (type, contentStart, contentEnd).
    * Totality: sizes are untrusted — size 0 means to-end (spec), size 1
    * (64-bit largesize) and any size < 8 or negative stop the walk; the
    * cursor is a Long so a near-2³¹ size cannot wrap it. */
  private def boxScan(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = from.toLong
    var open = true
    while (open && i + 8 <= to) {
      val at = i.toInt
      val size = be32(b, at)
      val end = if (size == 0) to.toLong else i + size
      if ((size != 0 && size < 8) || end > to) open = false
      else {
        out += ((ascii(b, at + 4, 4), at + 8, end.toInt))
        i = end
      }
    }
    out.result()
  }

  private def mp4(b: Array[Byte]): Option[AvInfo] =
    if (b.length >= 12 && ascii(b, 4, 4) == "ftyp") {
      val brand = ascii(b, 8, 4)
      // optional depth: a bare ftyp is still a valid mp4 header; dims
      // come from the first trak whose v0 tkhd carries a nonzero width
      // (16.16 fixed point -> integer part), duration from v0 mvhd
      var w = 0; var h = 0; var durMs = 0L
      for ((t, cs, ce) <- boxScan(b, 0, b.length) if t == "moov";
           (t2, cs2, ce2) <- boxScan(b, cs, ce)) t2 match {
        case "mvhd" if ce2 - cs2 >= 20 && (b(cs2) & 0xff) == 0 =>
          val timescale = be32(b, cs2 + 12)
          val ticks = be32(b, cs2 + 16)
          if (timescale > 0 && ticks > 0 && durMs == 0L)
            durMs = ticks.toLong * 1000L / timescale
        case "trak" if w == 0 =>
          for ((t3, cs3, ce3) <- boxScan(b, cs2, ce2)
               if t3 == "tkhd" && ce3 - cs3 >= 84 && (b(cs3) & 0xff) == 0
                 && w == 0) {
            w = be32(b, cs3 + 76) >>> 16
            h = be32(b, cs3 + 80) >>> 16
          }
        case _ => ()
      }
      Some(AvInfo("mp4", 0, 0, brand, w, h, durMs))
    } else None

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

  /** Canonical WAV header (PCM) + `dataBytes` zero sample bytes —
    * 44 bytes when dataBytes = 0 (the empty-data legacy shape). */
  def synthWav(sampleRate: Int, channels: Int, bits: Int,
      dataBytes: Int = 0): Array[Byte] = {
    val byteRate = sampleRate * channels * bits / 8
    "RIFF".getBytes ++ le32b(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(sampleRate) ++ le32b(byteRate) ++ le16b(channels * bits / 8) ++
      le16b(bits) ++ "data".getBytes ++ le32b(dataBytes) ++
      new Array[Byte](dataBytes)
  }

  /** Minimal ftyp box: major brand + one compatible brand. */
  def synthMp4(brand: String): Array[Byte] = {
    require(brand.length == 4, "4cc brand")
    be32b(20) ++ "ftyp".getBytes ++ brand.getBytes ++ be32b(0) ++ brand.getBytes
  }

  /** ftyp + moov{mvhd(timescale 1000 → ticks are ms), trak{tkhd(w, h
    * as 16.16 fixed point)}} — the layout the header walk reads; other
    * FullBox fields zeroed (spec-conformant defaults). */
  def synthMp4Video(brand: String, w: Int, h: Int, durMs: Long): Array[Byte] = {
    def box(t: String, content: Array[Byte]): Array[Byte] =
      be32b(content.length + 8) ++ t.getBytes ++ content
    val mvhd = new Array[Byte](100) // v0 content
    System.arraycopy(be32b(1000), 0, mvhd, 12, 4)
    System.arraycopy(be32b(durMs.toInt), 0, mvhd, 16, 4)
    val tkhd = new Array[Byte](84) // v0 content
    System.arraycopy(be32b(w << 16), 0, tkhd, 76, 4)
    System.arraycopy(be32b(h << 16), 0, tkhd, 80, 4)
    synthMp4(brand) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  /** Minimal OGG page header (version 0, zero segments). */
  def synthOgg(serial: Int): Array[Byte] =
    "OggS".getBytes ++ Array[Byte](0, 2) ++ new Array[Byte](8) ++
      le32b(serial) ++ new Array[Byte](4 + 4 + 1)
}
