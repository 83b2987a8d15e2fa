package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: payloads travel as
  * opaque `binary` columns beside typed metadata; decode/feature steps
  * run per-partition so codec init amortizes across a partition (the
  * Spark analog of batched pandas UDFs).
  *
  * The decode step is REAL since round 4 (ImageCodec header parse for
  * PNG/JPEG/GIF/BMP), and since round 12 the downstream kernels are
  * real too: box-filter resample + luma-histogram/gradient features
  * over ImageCodec.decodeBmp24 pixels, WAV frame windows hashed from
  * actual payload bytes. Payloads that don't decode take the
  * documented total fallback (zero row / no rows) — one corrupt
  * payload costs its rows, never the job.
  */
object Multimodal {

  final case class MediaMeta(mediaId: Long, nBytes: Long, checksum: Long,
      format: String, width: Int, height: Int)

  /** Header decode + rolling checksum; total function (see fallback). */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    ImageCodec.parse(bytes) match {
      case Some(info) =>
        MediaMeta(id, bytes.length.toLong, h, info.format, info.width, info.height)
      case None =>
        MediaMeta(id, bytes.length.toLong, h, "unknown", 0, 0)
    }
  }

  /** The per-partition decode stage over (id, payload) rows. */
  def decodeAll(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec/model handles)
      it.map { case (id, bytes) => decode(id, bytes) }
    }
  }

  /** Demo wiring over `documents`: treat UTF-8 text bytes as the opaque
    * payload — exercises the non-image fallback path end-to-end. */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    decodeAll(docs.select(col("doc_id"), encode(col("text"), "UTF-8"))
      .as[(Long, Array[Byte])])
  }

  /** Aspect-preserving fit of (w, h) into a target×target box —
    * integer geometry, never below 1 px a side. */
  def fitBox(target: Int, w: Int, h: Int): (Int, Int) =
    // Long products: dim * target wraps Int for a valid-but-extreme
    // dimension (e.g. 10M×1 at target 256); results fit Int (≤ target)
    if (w <= 0 || h <= 0) (0, 0)
    else if (w >= h) (target, math.max(1, (h.toLong * target / w).toInt))
    else (math.max(1, (w.toLong * target / h).toInt), target)

  /** REAL integer box-filter resample (downscale): destination pixel
    * (x, y) is the floor-average of the source box
    * [x·w/tw, (x+1)·w/tw) × [y·h/th, (y+1)·h/th) — the classic area
    * average with integer bounds, so every engine that replays the
    * arithmetic (the DuckDB oracle does) lands on identical pixels.
    * Requires tw <= w and th <= h (boxes are then never empty). */
  def resizeBox(w: Int, h: Int, tw: Int, th: Int,
      gray: Array[Int]): Array[Int] = {
    require(tw >= 1 && th >= 1 && tw <= w && th <= h,
      s"box resample needs 1 <= ($tw, $th) <= ($w, $h)")
    require(gray.length == w * h, s"expected ${w * h} px, got ${gray.length}")
    Array.tabulate(tw * th) { idx =>
      val x = idx % tw; val y = idx / tw
      // Long products: (x+1)*w wraps Int for a valid extreme image
      // (10M×1 at target 256 → 2.56G), making the box empty and s/n
      // throw — the bounds themselves always fit Int (≤ w, ≤ h)
      val x0 = (x.toLong * w / tw).toInt; val x1 = ((x + 1).toLong * w / tw).toInt
      val y0 = (y.toLong * h / th).toInt; val y1 = ((y + 1).toLong * h / th).toInt
      // Long sum: a legitimate huge box (e.g. 36000x8000 -> 8x2 leaves
      // 18M px/box) overflows an Int accumulator at mean luma ~120,
      // silently emitting negative pixels while the BIGINT oracle
      // computes the true average
      var s = 0L; var n = 0L
      var sy = y0
      while (sy < y1) {
        var sx = x0
        while (sx < x1) { s += gray(sy * w + sx); n += 1L; sx += 1 }
        sy += 1
      }
      (s / n).toInt
    }
  }

  private def polyFold(xs: Array[Int]): Long = {
    var h = 0L
    var i = 0
    while (i < xs.length) { h = (h * 31 + xs(i)) % 2147483647L; i += 1 }
    h
  }

  final case class ResizedImage(mediaId: Long, width: Int, height: Int,
      targetW: Int, targetH: Int, resizedSum: Long, resizedHash: Long)

  /** Resize stage over a REAL decoded image: aspect-preserving fit into
    * a target×target box, then the box-filter resample over the actual
    * decoded luma pixels; the output carries the resampled image as an
    * exact integer digest (sum + polynomial hash over the row-major
    * pixels). Non-decodable payloads take the total fallback (all
    * zero) — one corrupt image costs its row, never the job. */
  def resizeImage(target: Int)(id: Long, bytes: Array[Byte]): ResizedImage =
    ImageCodec.decodeBmp24(bytes) match {
      case Some((w, h, gray)) if w >= target || h >= target =>
        val (tw, th) = fitBox(target, w, h)
        val rv = resizeBox(w, h, tw, th, gray)
        ResizedImage(id, w, h, tw, th, rv.map(_.toLong).sum, polyFold(rv))
      case Some((w, h, gray)) =>
        // already inside the box: identity resample (real pixels out)
        ResizedImage(id, w, h, w, h, gray.map(_.toLong).sum, polyFold(gray))
      case None => ResizedImage(id, 0, 0, 0, 0, 0L, 0L)
    }

  final case class MediaFeatures(mediaId: Long, h0: Long, h1: Long,
      h2: Long, h3: Long, h4: Long, h5: Long, h6: Long, h7: Long,
      gradEnergy: Long)

  /** REAL feature extract over decoded luma pixels: the 8-bin luma
    * histogram (bin = v/32) plus total gradient energy (sum of
    * |horizontal| + |vertical| neighbor deltas) — a compact, exactly
    * integer-replayable descriptor of brightness distribution and
    * edge content (the deterministic stand-in an ML encoder would
    * replace, with the same fixed-width numeric schema). Non-decodable
    * payloads → all-zero row (total). */
  def imageFeatures(id: Long, bytes: Array[Byte]): MediaFeatures =
    ImageCodec.decodeBmp24(bytes) match {
      case Some((w, h, gray)) =>
        val hist = new Array[Long](8)
        var i = 0
        while (i < gray.length) {
          hist(math.min(7, math.max(0, gray(i) / 32))) += 1L; i += 1
        }
        var grad = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = gray(y * w + x)
            if (x + 1 < w) grad += math.abs(gray(y * w + x + 1) - v)
            if (y + 1 < h) grad += math.abs(gray((y + 1) * w + x) - v)
            x += 1
          }
          y += 1
        }
        MediaFeatures(id, hist(0), hist(1), hist(2), hist(3), hist(4),
          hist(5), hist(6), hist(7), grad)
      case None =>
        MediaFeatures(id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    }

  final case class Frame(mediaId: Long, frameIdx: Long, frameHash: Long)

  /** REAL frame sampling over a WAV payload: the data chunk's samples
    * split into fixed `frameBytes` windows (the audio analog of video
    * frames); every `every`-th window is emitted with the polynomial
    * hash of its ACTUAL payload bytes — the one-to-many flatMap shape
    * of media sampling, over real decoded content. Non-WAV or corrupt
    * payloads yield no frames (total). */
  def frameSample(every: Int, frameBytes: Int = 64)(
      id: Long, bytes: Array[Byte]): Iterator[Frame] = {
    // the ONE RIFF chunk scan (AvCodec.dataRange) — not a second copy
    AvCodec.dataRange(bytes) match {
      case None => Iterator.empty
      case Some((start, len)) =>
        val nFrames = (len + frameBytes - 1) / frameBytes
        (0L until nFrames.toLong by every.toLong).iterator.map { i =>
          val from = start + i.toInt * frameBytes
          val to = math.min(from + frameBytes, start + len)
          var h = 0L
          var j = from
          while (j < to) { h = (h * 31 + (bytes(j) & 0xff)) % 2147483647L; j += 1 }
          Frame(id, i, h)
        }
    }
  }

}
