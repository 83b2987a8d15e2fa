package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: payloads travel as
  * opaque `binary` columns beside typed metadata; decode/feature steps
  * run per-partition so a real codec would amortize model/codec init
  * across a partition (the Spark analog of batched pandas UDFs).
  *
  * DECODE IS A STUB: this container ships no image/audio codecs, so
  * `fakeDecode` derives deterministic pseudo-features from the bytes
  * (documented, clearly marked). The Spark-side plumbing — schema,
  * binary transport, partition batching, feature struct — is real and
  * tested; swap `fakeDecode` for a codec call to productionize.
  */
object Multimodal {

  final case class MediaMeta(mediaId: Long, nBytes: Long, checksum: Long,
      width: Int, height: Int)

  /** STUB decoder: stands in for e.g. JPEG decode + resize. Deterministic
    * from bytes alone: rolling checksum + fake dimensions. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    MediaMeta(id, bytes.length.toLong, h,
      width = (h % 640).toInt + 1, height = (h % 480).toInt + 1)
  }

  /** Attach a binary payload column + run the per-partition decode stage.
    * Input: (id: Long, payload: Array[Byte]). */
  def decodeAll(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec/model handles)
      it.map { case (id, bytes) => fakeDecode(id, bytes) }
    }
  }

  /** Demo wiring over `documents`: treat UTF-8 text bytes as the opaque
    * payload (no real media in the test tables). */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    decodeAll(docs.select(col("doc_id"), encode(col("text"), "UTF-8"))
      .as[(Long, Array[Byte])])
  }
}
