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
}
