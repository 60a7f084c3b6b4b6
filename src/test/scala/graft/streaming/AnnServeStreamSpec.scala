package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** Streamed query serving against the static residual index must equal
  * the batch serve of the same queries — across a multi-batch split,
  * with per-batch isolation (a query arriving in batch 2 must not see
  * batch 1's queries and vice versa). */
class AnnServeStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("streamed serve equals batch serve per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (0L, Array(0.875f, 0.125f, 0.5f, 0.0f)),
      (1L, Array(0.875f, 0.125f, 0.0f, 0.5f)),
      (2L, Array(0.875f, 0.125f, 0.375f, 0.125f)),
      (3L, Array(0.875f, 0.125f, 0.125f, 0.375f)),
      (9L, Array(0.125f, 0.875f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val trained = Seq(
      (0L, Array(875000L, 125000L, 0L, 0L)),
      (1L, Array(125000L, 875000L, 0L, 0L))).toDF("cent_id", "cv")
    val cb = corpus.filter($"vec_id" < 2L)
    // the static artifact, localCheckpointed like a loaded store
    val index = Similarity.ivfPqResidualIndex(corpus, trained, cb,
      "vec_id", "embedding", numSubspaces = 2, subDim = 2)
      .localCheckpoint(true)

    val q1 = Seq((100L, Array(0.875f, 0.125f, 0.5f, 0.25f)))
    val q2 = Seq((101L, Array(0.125f, 0.875f, 0.25f, 0.5f)),
      (102L, Array(0.875f, 0.125f, 0.25f, 0.5f)))
    def batchServe(qs: Seq[(Long, Array[Float])]): Set[(Long, Long, Long, Long, Long)] = {
      val qdf = qs.toDF("vec_id", "embedding")
      Similarity.ivfPqResidualServe(index,
          Similarity.ivfProbes(qdf, trained, "vec_id", "embedding", 1),
          qdf, trained, cb, "vec_id", "embedding", 2, 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    }

    val stream = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, Long, Long)]]
    val writer = AnnServeStream.serveWriter(
      stream.toDS().toDF("vec_id", "embedding"), index, trained, cb,
      "vec_id", "embedding", numSubspaces = 2, subDim = 2, k = 3,
      nprobe = 1) { (out, id) =>
      got.synchronized {
        got(id) = out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      }
    }
    val query = writer
      .option("checkpointLocation",
        Files.createTempDirectory("annserve").toString)
      .start()
    try {
      stream.addData(q1: _*)
      query.processAllAvailable()
      stream.addData(q2: _*)
      query.processAllAvailable()
    } finally query.stop()

    assert(got(0L) == batchServe(q1))
    assert(got(1L) == batchServe(q2))
    assert(got(0L).nonEmpty && got(1L).nonEmpty)
    // batch isolation: no query id leaks across micro-batches
    assert(got(0L).forall(_._1 == 100L))
    assert(got(1L).forall(r => r._1 == 101L || r._1 == 102L))
  }
}
