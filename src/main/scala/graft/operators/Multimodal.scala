package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension scope): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batched per-partition passes.
  *
  * The image/audio codec libraries are not in this container, so the
  * decoder is a clearly-marked DETERMINISTIC STUB deriving fake
  * dimensions from the payload byte length; everything around it — the
  * binary column, the Dataset encoder round-trip, the mapPartitions
  * batch shape (one decoder init per partition, streamed rows), the
  * typed output schema — is the real plumbing a production decode would
  * use, and is what the oracle verifies.
  */
object Multimodal {

  /** Typed metadata row produced by the decode pass. */
  final case class MediaMeta(doc_id: Long, width: Long, height: Long,
                             channels: Long, n_frames: Long, payload_len: Long,
                             content_hash: String)

  /** DECODE STUB — deterministic fake in place of a real image decoder.
    * A real implementation would parse the payload header (e.g. PNG
    * IHDR); the stub derives plausible dimensions from byte length so
    * results are oracle-checkable.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long, Long) = {
    val n = payload.length.toLong
    (64L + n % 577L, 64L + (n * 31L) % 417L, 3L, 1L + n % 7L)
  }

  private def md5Hex(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    d.map(b => f"$b%02x").mkString
  }

  /** Batched decode pass: binary payload column → typed metadata.
    * mapPartitions so a real decoder would be initialized once per
    * partition (the expensive part at scale), not once per row.
    */
  def decodeMeta(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder/codec init would happen here, once per partition
        rows.map { case (id, payload) =>
          val (w, h, c, f) = decodeStub(payload)
          MediaMeta(id, w, h, c, f, payload.length.toLong, md5Hex(payload))
        }
      }
  }

  /** Frame sampling over decoded metadata: one row per frame with its
    * deterministic byte offset — the plumbing a video frame-extraction
    * pass would use (explode stays columnar; a real extractor would then
    * mapPartitions over (payload, offset) slices).
    */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta.select(col("doc_id"), col("payload_len"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("payload_len div n_frames")).as("frame_offset"))

  /** Demo media table: documents' text bytes standing in for image
    * payloads (same shape a real `binary` scan would have).
    */
  def fakeMediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
}
