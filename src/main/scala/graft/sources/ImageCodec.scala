package graft.sources

/** Real image-header decoding for the multimodal column pipeline — pure
  * JVM, no codec libraries: parses the container headers of the four
  * ubiquitous formats to (format, width, height). This replaces the
  * round 1-3 `fakeDecode` stub; full pixel decode would slot into the
  * same per-partition stage with a codec dependency.
  *
  *   - PNG: 8-byte signature, IHDR chunk: width/height big-endian at
  *     byte 16/20 (PNG spec §11.2.2).
  *   - GIF: "GIF87a"/"GIF89a", logical screen descriptor:
  *     width/height little-endian u16 at byte 6/8.
  *   - JPEG: FF D8 then marker scan to the first frame header (SOF0-15
  *     minus DHT/JPG/DAC): height/width big-endian u16 at +5/+7 of the
  *     segment (ITU T.81 §B.2.2). Skips APPn/COM/DQT etc. by length.
  *   - BMP: "BM", then BITMAPINFOHEADER (width/height little-endian
  *     i32 at 18/22, height may be negative for top-down) or the old
  *     BITMAPCOREHEADER (u16 at 18/20).
  */
object ImageCodec {

  final case class ImageInfo(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  def parse(b: Array[Byte]): Option[ImageInfo] =
    png(b).orElse(gif(b)).orElse(jpeg(b)).orElse(bmp(b))

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def png(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 24 && b.take(8).sameElements(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(ImageInfo("png", be32(b, 16), be32(b, 20)))
    else None

  private def gif(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(ImageInfo("gif", le16(b, 6), le16(b, 8)))
    else None

  private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced
      val marker = u8(b, i + 1)
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
        i += 2 // standalone markers, no length
      else if (marker == 0xd9 || marker == 0xda)
        return None // EOI / start-of-scan before any frame header
      else {
        val segLen = be16(b, i + 2)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return None
          return Some(ImageInfo("jpeg", be16(b, i + 7), be16(b, i + 5)))
        }
        i += 2 + segLen
      }
    }
    None
  }

  private def bmp(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val hdr = le32(b, 14)
      if (hdr >= 40) Some(ImageInfo("bmp", le32(b, 18), math.abs(le32(b, 22))))
      else if (hdr == 12) Some(ImageInfo("bmp", le16(b, 18), le16(b, 20)))
      else None
    } else None

  // ------------------------------------------------- synthetic headers

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def be32b(v: Int) = bytes(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
  private def be16b(v: Int) = bytes((v >>> 8) & 0xff, v & 0xff)
  private def le32b(v: Int) = bytes(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
  private def le16b(v: Int) = bytes(v & 0xff, (v >>> 8) & 0xff)

  /** Minimal VALID headers for the demo fixture + specs: the byte
    * layouts are real (a conformant parser reads the same dims); CRCs
    * and pixel data, irrelevant to header decode, are zeroed/omitted. */
  def synthPng(w: Int, h: Int): Array[Byte] = // 33 bytes
    pngSig ++ be32b(13) ++ "IHDR".getBytes ++ be32b(w) ++ be32b(h) ++
      bytes(8, 2, 0, 0, 0) ++ be32b(0)

  def synthGif(w: Int, h: Int): Array[Byte] = // 13 bytes
    "GIF89a".getBytes ++ le16b(w) ++ le16b(h) ++ bytes(0, 0, 0)

  def synthJpeg(w: Int, h: Int): Array[Byte] = // 41 bytes
    bytes(0xff, 0xd8) ++
      (bytes(0xff, 0xe0) ++ be16b(16) ++ "JFIF".getBytes ++
        bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      (bytes(0xff, 0xc0) ++ be16b(17) ++ bytes(8) ++ be16b(h) ++ be16b(w) ++
        bytes(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) ++
      bytes(0xff, 0xd9)

  def synthBmp(w: Int, h: Int): Array[Byte] = // 54 bytes
    "BM".getBytes ++ le32b(54) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      Array.fill(24)(0.toByte)

  /** 24bpp uncompressed BMP WITH real pixel data — the standard Windows
    * layout: 54-byte header, bottom-up rows, BGR byte order, rows padded
    * to 4 bytes. Encodes a grayscale image (r=g=b=v); any conformant
    * reader decodes the same pixels. */
  def encodeBmp24(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
    val rowSize = (w * 3 + 3) / 4 * 4
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    val header = "BM".getBytes ++ le32b(size) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      le32b(0) ++ le32b(rowSize * h) ++ Array.fill(16)(0.toByte)
    System.arraycopy(header, 0, out, 0, 54)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // file rows run bottom-up
      var x = 0
      while (x < w) {
        val v = (gray(srcRow * w + x) & 0xff).toByte
        val off = 54 + y * rowSize + x * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v // B G R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real pixel decode of a 24bpp uncompressed bottom-up BMP: returns
    * (w, h, integer luma per pixel in row-major top-down order) via the
    * ITU-R 601 integer weights (299r + 587g + 114b) / 1000 — exact on
    * grayscale payloads (luma = v). None on any other layout. */
  def decodeBmp24(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M' ||
      le16(b, 28) != 24 || le32(b, 30) != 0) return None
    val w = le32(b, 18); val h = le32(b, 22); val off = le32(b, 10)
    // Long arithmetic + DIVISION: hostile header dims overflow the Int
    // products (65536x65536 -> 0) and even the Long product
    // (Int.MaxValue² * 3 > Long.MaxValue, wrapping negative and passing
    // a `<` check) — rows-that-fit = (len - off) / rowSize cannot
    // overflow, so compare against that. A corrupt payload must return
    // None, not throw.
    val rowSize = (w.toLong * 3 + 3) / 4 * 4
    if (w <= 0 || h <= 0 || off < 54 ||
      (b.length.toLong - off) / rowSize < h.toLong) return None
    val rs = rowSize.toInt // fits: rowSize * h <= b.length was checked
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val dstRow = h - 1 - y
      var x = 0
      while (x < w) {
        val p = off + y * rs + x * 3
        val blue = u8(b, p); val green = u8(b, p + 1); val red = u8(b, p + 2)
        gray(dstRow * w + x) = (red * 299 + green * 587 + blue * 114) / 1000
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  /** 8×8 average-hash packed as four 16-bit bands: bit k = cell k's
    * luma >= the integer mean; band j holds bits 16j..16j+15
    * little-endian. Band equality is the Hamming-LSH bucket key —
    * hamming(a, b) <= 3 leaves at least one of the 4 bands identical
    * (pigeonhole), so a per-band equi-join finds every <=3-bit pair
    * without an all-pairs stage. Images larger than 8×8 box-downsample
    * before hashing; the fixture images are exactly 8×8 so the whole
    * decode→hash path stays integer-replayable. */
  def aHashBands(gray: Array[Int]): Array[Int] = {
    require(gray.length == 64, s"aHash expects an 8x8 image, got ${gray.length} px")
    val mean = gray.sum / 64
    Array.tabulate(4) { j =>
      var v = 0
      var i = 0
      while (i < 16) {
        if (gray(16 * j + i) >= mean) v |= 1 << i
        i += 1
      }
      v
    }
  }
}
