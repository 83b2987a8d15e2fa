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
}
