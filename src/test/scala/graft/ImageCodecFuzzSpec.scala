package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ImageCodec, Multimodal}

/** Totality fuzz for the multimodal decode path — the bytes twin of the
  * degenerate-row sweeps. At 100 TB corrupt, truncated, and adversarial
  * payloads are certainties, and a decode that THROWS kills the task
  * (and every other row in its partition); the contract is total:
  * `parse`/`decodeBmp24` return an Option, `Multimodal.decode` returns
  * the "unknown" fallback, on ANY byte input. Deterministic seeds so a
  * failure replays. */
class ImageCodecFuzzSpec extends AnyFunSuite {

  /** Drives every per-row decode stage; fails if any throws. */
  private def mustBeTotal(b: Array[Byte], label: => String): Unit =
    try {
      ImageCodec.parse(b)
      ImageCodec.decodeBmp24(b)
      Multimodal.decode(1L, b)
      Multimodal.resizeImage(224)(1L, b)
      Multimodal.imageFeatures(1L, b)
      Multimodal.frameSample(4)(1L, b).take(8).foreach(_ => ())
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case e: Throwable =>
        fail(s"decode threw on $label (${b.length} bytes): $e")
    }

  private def validPayloads: Seq[(String, Array[Byte])] = Seq(
    "png" -> ImageCodec.synthPng(640, 480),
    "gif" -> ImageCodec.synthGif(320, 200),
    "jpeg" -> ImageCodec.synthJpeg(1920, 1080),
    "bmp" -> ImageCodec.synthBmp(256, 128),
    "bmp24" -> ImageCodec.encodeBmp24(8, 8, Array.tabulate(64)(k => (k * 7) % 256)))

  test("random byte soup never throws") {
    val r = new scala.util.Random(0xF022)
    for (i <- 0 until 2000) {
      val b = new Array[Byte](r.nextInt(200))
      r.nextBytes(b)
      mustBeTotal(b, s"soup#$i")
    }
  }

  test("byte soup behind each format's magic never throws") {
    // random tails after a recognized signature reach the deepest
    // parser branches (JPEG's marker scan, BMP's header-size switch)
    val r = new scala.util.Random(0x51C)
    val magics = Seq(
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "GIF89a".getBytes, Array(0xff, 0xd8).map(_.toByte), "BM".getBytes)
    for (m <- magics; i <- 0 until 500) {
      val tail = new Array[Byte](r.nextInt(120))
      r.nextBytes(tail)
      mustBeTotal(m ++ tail, s"magic+soup#$i")
    }
  }

  test("every truncation of every valid container never throws") {
    for ((fmt, p) <- validPayloads; n <- 0 to p.length)
      mustBeTotal(p.take(n), s"$fmt truncated to $n/${p.length}")
  }

  test("single-byte mutations of valid containers never throw") {
    val r = new scala.util.Random(0xBEEF)
    for ((fmt, p) <- validPayloads; i <- 0 until 400) {
      val m = p.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      mustBeTotal(m, s"$fmt mutation#$i")
    }
  }

  test("hostile header dimensions parse without blowing up downstream") {
    // dims near/over Int range: parse may report them verbatim (or as
    // negative under two's complement) but nothing may throw or
    // allocate pixel buffers — decodeBmp24's long-arithmetic bounds
    // check and resizeImage's None fallback are the lines of defense
    val hostiles = Seq(
      "png-max" -> ImageCodec.synthPng(Int.MaxValue, Int.MaxValue),
      "png-wrap" -> ImageCodec.synthPng(0x80000000, 0x80000001),
      "gif-max" -> ImageCodec.synthGif(0xffff, 0xffff),
      "jpeg-max" -> ImageCodec.synthJpeg(0xffff, 0xffff),
      "bmp-max" -> ImageCodec.synthBmp(Int.MaxValue, Int.MaxValue),
      // the documented 65536x65536 case: Int products overflow to 0
      "bmp-64k" -> ImageCodec.synthBmp(65536, 65536))
    for ((label, b) <- hostiles) {
      mustBeTotal(b, label)
      assert(ImageCodec.decodeBmp24(b).isEmpty, s"$label decoded pixels")
    }
  }
}
