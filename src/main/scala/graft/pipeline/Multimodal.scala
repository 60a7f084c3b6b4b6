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

  /** STUB — deterministic fake resize: a real deployment decodes,
    * rescales and re-encodes; the fake emits a `w*h`-byte payload
    * deterministically subsampled from the input. Binary→binary transform
    * with parameters — the real resize plumbing shape. */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val n = w * h
    media.mapPartitions { it =>
      it.map { r =>
        val out = new Array[Byte](n)
        if (r.payload.nonEmpty) {
          var i = 0
          while (i < n) {
            out(i) = r.payload((i.toLong * r.payload.length / n).toInt)
            i += 1
          }
        }
        r.copy(payload = out)
      }
    }
  }

  case class MediaFrame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as fixed-size frames and keep
    * every `everyN`-th — the one-row-to-many-rows contract of video
    * frame extraction (flatMap per partition; a real decoder seeks
    * keyframes here). frameBytes stands in for the codec's frame size. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int,
      frameBytes: Int = 16): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames).filter(_ % everyN == 0).map { f =>
          MediaFrame(r.media_id, f,
            java.util.Arrays.copyOfRange(r.payload, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
  }

  /** Features → embedding column shape consumed by the similarity
    * pipeline ([[Similarity]]): (vec_id, embedding Array[Float]). */
  def asEmbeddings(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"), col("feat").as("embedding"))
}
