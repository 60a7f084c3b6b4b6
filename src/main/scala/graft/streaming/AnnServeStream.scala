package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Similarity

/** Online ANN serving — the arrival-time face of the q215/q218
  * residual-index path: queries arrive as a STREAM while the index,
  * centroids and codebook are STATIC artifacts (built offline; q218's
  * cent_id-partitioned at-rest store), and every micro-batch is served
  * through the SAME [[Similarity.ivfPqResidualServe]] the batch path
  * runs. `foreachBatch` is Spark's own idiom for per-batch batch
  * semantics against static relations — probe routing needs a
  * per-query window rank, which has no incremental streaming form and
  * needs none: queries are independent rows, so batch-per-microbatch
  * IS the exact semantics, not an approximation. AnnServeStreamSpec
  * pins stream ≡ batch across a multi-batch split.
  *
  * Scale shape per micro-batch: identical to the batch path — probes
  * and the LUT derive from the (small) arriving batch and broadcast;
  * the static index is touched only on probed cells (partition-pruned
  * when read from the q218 store). */
object AnnServeStream {

  /** A writer that serves each arriving query micro-batch from the
    * static residual index and hands the scored top-k to `onBatch`. */
  def serveWriter(queries: DataFrame, index: DataFrame, trained: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, subDim: Int, k: Int, nprobe: Int)
      (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val probes = Similarity.ivfProbes(batch, trained, idCol, vecCol,
        nprobe)
      onBatch(
        Similarity.ivfPqResidualServe(index, probes, batch, trained,
          codebook, idCol, vecCol, numSubspaces, subDim, k),
        batchId)
    }
}
