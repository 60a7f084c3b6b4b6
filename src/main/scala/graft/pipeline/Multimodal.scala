package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs;
  * decode / feature-extract run as *batched partition-local* functions —
  * the Scala analog of `mapInPandas` (batch shape: one iterator of rows
  * per partition; the decode library is invoked per batch, not per row).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (byte-length + first-byte histogram
  * features). The Spark-side contract — schema, partitioning, batch
  * iteration — is real and tested; swap `decodeStub` for a JNI/codec call
  * in production.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Int,
    first_byte: Int, checksum: Long, feat: Array[Float])

  /** Attach a binary payload column from a string column (test harness:
    * text bytes stand in for encoded media). */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB — deterministic fake decode. A real deployment decodes the
    * payload with an image/audio codec here; everything around it (batch
    * shape, schema, partition locality) is production-real. */
  private def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = (crc * 31 + (payload(i) & 0xff)) & 0x7fffffffL; i += 1 }
    val feat = new Array[Float](8)
    i = 0
    while (i < payload.length) { feat(i % 8) += (payload(i) & 0xff) / 255.0f; i += 1 }
    (crc, feat)
  }

  /** Batched partition-local feature extraction (mapPartitions = the
    * Scala `mapInPandas`): rows stream through per partition; the decoder
    * initializes once per partition, not per row. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (e.g., codec context)
      it.map { r =>
        val (crc, feat) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.media_type, r.payload.length,
          if (r.payload.nonEmpty) r.payload(0) & 0xff else -1, crc, feat)
      }
    }
  }

  /** DataFrame-level pipeline: docs → media → features. */
  def featuresOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(asMedia(docs, idCol, textCol).as[MediaRecord]).toDF()
  }
}
