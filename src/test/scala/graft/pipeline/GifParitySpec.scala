package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pooled per-partition GIF writer must emit BYTE-identical
  * containers to the per-call `encodeGif` path — the codec-pinning
  * discipline for every pooled writer (a reused `ImageWriter` that
  * carried sequence state across records would corrupt containers
  * silently; byte equality over many records catches it). */
class GifParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pooled syntheticGifs bytes == per-call encodeGif bytes, across records and partitions") {
    import spark.implicits._
    val ids = (0L until 80L).toDF("doc_id").repartition(7)
    val pooled = Multimodal.syntheticGifs(ids, "doc_id")
      .collect().map(m => m.media_id -> m.payload).toMap
    assert(pooled.size == 80)
    (0L until 80L).foreach { id =>
      assert(java.util.Arrays.equals(pooled(id), Multimodal.encodeGif(id)),
        s"pooled writer bytes diverge from the per-call encoder at id=$id")
    }
  }
}
