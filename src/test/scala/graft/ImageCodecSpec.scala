package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ImageCodec, Multimodal}
import graft.sources.ImageCodec.ImageInfo

/** Header-decode cases for the real multimodal decoder. */
class ImageCodecSpec extends AnyFunSuite {

  test("synthetic headers round-trip through the parser") {
    assert(ImageCodec.parse(ImageCodec.synthPng(640, 480))
      .contains(ImageInfo("png", 640, 480)))
    assert(ImageCodec.parse(ImageCodec.synthGif(320, 200))
      .contains(ImageInfo("gif", 320, 200)))
    assert(ImageCodec.parse(ImageCodec.synthJpeg(1920, 1080))
      .contains(ImageInfo("jpeg", 1920, 1080)))
    assert(ImageCodec.parse(ImageCodec.synthBmp(256, 128))
      .contains(ImageInfo("bmp", 256, 128)))
  }

  test("JPEG: marker scan skips APPn/COM/DQT segments to reach SOF") {
    // FF D8, APP1 (Exif-style, 8 bytes), COM (6 bytes), then SOF2
    // (progressive — also a frame header), then EOI
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val b = Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xe1).map(_.toByte) ++ be16(8) ++ Array.fill(6)(7.toByte)) ++
      (Array(0xff, 0xfe).map(_.toByte) ++ be16(6) ++ Array.fill(4)(3.toByte)) ++
      (Array(0xff, 0xc2).map(_.toByte) ++ be16(17) ++ Array(8.toByte) ++
        be16(77) ++ be16(99) ++ Array.fill(10)(0.toByte)) ++
      Array(0xff, 0xd9).map(_.toByte)
    assert(ImageCodec.parse(b).contains(ImageInfo("jpeg", 99, 77)))
  }

  test("JPEG: DHT (C4) is not a frame header; SOS before SOF fails") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sos = Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xc4).map(_.toByte) ++ be16(4) ++ Array.fill(2)(0.toByte)) ++
      Array(0xff, 0xda).map(_.toByte)
    assert(ImageCodec.parse(sos).isEmpty)
  }

  test("BMP: negative (top-down) height is absolute; core header variant") {
    val b = ImageCodec.synthBmp(100, 50)
    // write height -50 little-endian at offset 22
    val neg = b.clone()
    val h = -50
    neg(22) = (h & 0xff).toByte; neg(23) = ((h >> 8) & 0xff).toByte
    neg(24) = ((h >> 16) & 0xff).toByte; neg(25) = ((h >> 24) & 0xff).toByte
    assert(ImageCodec.parse(neg).contains(ImageInfo("bmp", 100, 50)))
  }

  test("truncated and non-image payloads fall back to unknown") {
    assert(ImageCodec.parse("hello world".getBytes).isEmpty)
    assert(ImageCodec.parse(ImageCodec.synthPng(1, 1).take(15)).isEmpty)
    assert(ImageCodec.parse(Array.empty[Byte]).isEmpty)
    val m = Multimodal.decode(7L, "not an image".getBytes)
    assert(m.format == "unknown" && m.width == 0 && m.height == 0 &&
      m.nBytes == 12L)
  }

  test("GIF87a variant is accepted") {
    val b = ImageCodec.synthGif(10, 20)
    b(4) = '7'.toByte
    assert(ImageCodec.parse(b).contains(ImageInfo("gif", 10, 20)))
  }

  test("BMP24 pixel roundtrip across padded and unpadded row widths") {
    val r = new scala.util.Random(0xB127)
    // w=3 → 9-byte rows padded to 12; w=4 → exact; w=5 → 15 padded to 16
    for ((w, h) <- Seq((3, 2), (4, 4), (5, 3), (8, 8), (1, 1))) {
      val gray = Array.fill(w * h)(r.nextInt(256))
      val bytes = ImageCodec.encodeBmp24(w, h, gray)
      assert(bytes.length == 54 + (w * 3 + 3) / 4 * 4 * h)
      // the header parser agrees with the pixel decoder
      assert(ImageCodec.parse(bytes).contains(ImageInfo("bmp", w, h)))
      val Some((dw, dh, luma)) = ImageCodec.decodeBmp24(bytes)
      assert((dw, dh) == (w, h))
      // grayscale payload: luma = v exactly (299+587+114 = 1000)
      assert(luma.toSeq == gray.toSeq)
    }
  }

  test("decodeBmp24 rejects non-BMP, truncated, and compressed payloads") {
    assert(ImageCodec.decodeBmp24(ImageCodec.synthPng(8, 8)).isEmpty)
    val good = ImageCodec.encodeBmp24(8, 8, Array.fill(64)(7))
    assert(ImageCodec.decodeBmp24(good.take(100)).isEmpty)
    val compressed = good.clone()
    compressed(30) = 1 // biCompression = BI_RLE8
    assert(ImageCodec.decodeBmp24(compressed).isEmpty)
  }

  test("aHash bands: bit packing, and <=3-flip pairs always share a band") {
    val base = Array.tabulate(64)(k => (k * 7) % 256)
    val bands = ImageCodec.aHashBands(base)
    val mean = base.sum / 64
    for (k <- 0 until 64) {
      val bit = (bands(k / 16) >> (k % 16)) & 1
      assert(bit == (if (base(k) >= mean) 1 else 0), s"cell $k")
    }
    // flip <=3 cells hard across the mean: some band must stay equal
    val r = new scala.util.Random(0xA5)
    for (_ <- 0 until 20) {
      val mod = base.clone()
      val cells = r.shuffle((0 until 64).toList).take(r.nextInt(3) + 1)
      // nudge without moving the mean out from under the other bits
      cells.foreach(c => mod(c) = if (mod(c) >= mean) 0 else 255)
      val mb = ImageCodec.aHashBands(mod)
      val hamming = (0 until 64).count { k =>
        ((bands(k / 16) >> (k % 16)) & 1) != ((mb(k / 16) >> (k % 16)) & 1)
      }
      if (hamming <= 3)
        assert((0 until 4).exists(j => bands(j) == mb(j)),
          s"no shared band at hamming=$hamming")
    }
  }
}
