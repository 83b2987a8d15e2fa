package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: payloads travel as
  * opaque `binary` columns beside typed metadata; decode/feature steps
  * run per-partition so codec init amortizes across a partition (the
  * Spark analog of batched pandas UDFs).
  *
  * The decode step is REAL since round 4: ImageCodec parses PNG/JPEG/
  * GIF/BMP container headers to (format, width, height) — no codec
  * libraries needed. Payloads that aren't images (or are truncated)
  * take the documented fallback: format "unknown", 0×0, checksum and
  * size still computed. Full pixel decode would slot into the same
  * mapPartitions stage.
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

  final case class ResizedMeta(mediaId: Long, format: String,
      width: Int, height: Int, targetW: Int, targetH: Int,
      resampleChecksum: Long)

  /** Resize stage: aspect-preserving fit into a target×target box —
    * the geometry is real integer math; the pixel resample itself is
    * the stubbed step, stood in by a deterministic checksum mix so the
    * stage stays total and testable. Non-decodable payloads (0×0)
    * pass through untouched. */
  def resizePlan(target: Int)(m: MediaMeta): ResizedMeta = {
    val (tw, th) =
      if (m.width <= 0 || m.height <= 0) (0, 0)
      else if (m.width >= m.height)
        (target, math.max(1, m.height * target / m.width))
      else (math.max(1, m.width * target / m.height), target)
    ResizedMeta(m.mediaId, m.format, m.width, m.height, tw, th,
      (m.checksum * 131 + tw.toLong * 31 + th) % 2147483647L)
  }

  final case class MediaFeatures(mediaId: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** Feature-extract stage (model stub): k-th milli-quantized feature
    * is a deterministic LCG of the payload checksum. A real encoder
    * slots into the same mapPartitions stage with this exact schema
    * (fixed-width numeric features per media id). */
  def featureExtract(m: MediaMeta): MediaFeatures = {
    def f(k: Int): Long =
      ((m.checksum + k.toLong * 2654435761L) % 2147483647L) % 2001L - 1000L
    MediaFeatures(m.mediaId, f(0), f(1), f(2), f(3))
  }

  final case class Frame(mediaId: Long, frameIdx: Long, frameHash: Long)

  /** Frame-sample stage: every `every`-th of the payload's nominal
    * frames (one per 64 bytes — a real demuxer replaces the count);
    * the one-to-many flatMap shape of video sampling, with a
    * deterministic per-frame hash standing in for the decoded frame. */
  def frameSample(every: Int)(m: MediaMeta): Iterator[Frame] = {
    val nFrames = m.nBytes / 64 + 1
    (0L until nFrames by every.toLong).iterator
      .map(i => Frame(m.mediaId, i, (m.checksum * 31 + i) % 2147483647L))
  }
}
