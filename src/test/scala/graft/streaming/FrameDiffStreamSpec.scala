package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** [[FrameDiffStream]] parity with the batch
  * [[Multimodal.frameDiffs]]: the same GIF corpus decoded to gray
  * rasters, streamed in two micro-batches split MID-MEDIA (so crossing
  * pairs must diff against checkpointed state), must reproduce the
  * batch diff sums and scene flags exactly. */
class FrameDiffStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("streamed frame diffs equal batch frameDiffs across a mid-media split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0L until 40L).toDF("doc_id")
    val gifs = Multimodal.syntheticGifs(docs, "doc_id").collect()

    val batch = Multimodal.frameDiffs(
        Multimodal.syntheticGifs(docs, "doc_id"))
      .collect()
      .map(d => (d.media_id, d.frame_no) ->
        (d.width, d.height, d.diff_sum, d.scene_change)).toMap
    assume(batch.nonEmpty)

    // decode every frame to its gray raster (driver-side fixture decode)
    val frames = gifs.flatMap { m =>
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      reader.setInput(in)
      val n = reader.getNumImages(true)
      val rows = (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = for (y <- 0 until h; x <- 0 until w)
          yield img.getRGB(x, y) & 0xff
        FrameDiffStream.FrameRow(m.media_id, f.toLong, w.toLong, h.toLong,
          gray)
      }
      reader.dispose(); in.close()
      rows
    }

    val stream = MemoryStream[FrameDiffStream.FrameRow]
    val q = FrameDiffStream.frameDiffs(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("framediff_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("fd_ckpt").toString)
      .start()
    try {
      // split mid-media: frame 0 of every gif in batch 1, the rest in
      // batch 2 — every (0,1) pair crosses the split
      val (b1, b2) = frames.partition(_.frame_no == 0L)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("framediff_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == batch)
  }
}
