package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension, BASELINE.json).
  *
  * Two paths:
  *  - brute force: queries × corpus cross join with a broadcast query set —
  *    exact, O(Q·N), the correctness baseline;
  *  - LSH-bucketed: sign-bit bucket (IVF-style coarse quantizer) prunes
  *    the corpus per query with multi-probe, then exact re-rank. At 100 TB
  *    the bucket column is a partition key: each query probes a handful of
  *    partitions instead of the full corpus.
  *
  * Scoring uses the exact integer-quantized dot product
  * ([[graft.functions.VectorFunctions.dotExact]]) so ranking is
  * deterministic and engine-portable (doubles would differ in the last ulp
  * across summation orders); embeddings here are unit-norm so dot ≡ cosine
  * ranking-wise. `cosine` is emitted alongside for human consumption.
  */
object Similarity {

  /** Brute-force top-k: for each query vector, the k nearest corpus rows
    * by quantized dot product (desc), ties by corpus id. Self-pairs are
    * excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      quantize(col(vecCol)).as("q_corpus"), col(vecCol).as("v_corpus"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("q_query"), col(vecCol).as("v_query"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("dot_q", dotExact(col("q_query"), col("q_corpus")))
    val w = Window.partitionBy("query_id").orderBy(col("dot_q").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine", cosine(col("v_query"), col("v_corpus")))
      .select("query_id", "rank", "corpus_id", "dot_q", "cosine")
  }

  /** LSH-bucketed ANN: corpus is bucketed by the sign pattern of the first
    * `nBits` components; each query probes its own bucket plus all buckets
    * at Hamming distance 1 (multi-probe), then exact re-ranks. Recall is
    * approximate by construction; the bucket join replaces the full cross
    * join. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      quantize(col(vecCol)).as("q_corpus"),
      signBucket(col(vecCol), nBits).as("bucket"))
    // multi-probe: own bucket + flip each bit once
    val probes = (0 to nBits).map { i =>
      if (i == 0) signBucket(col(vecCol), nBits)
      else signBucket(col(vecCol), nBits).bitwiseXOR(lit(1L << (i - 1)))
    }
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("q_query"),
      explode(array(probes.map(_.cast("long")): _*)).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("dot_q", dotExact(col("q_query"), col("q_corpus")))
      .select("query_id", "corpus_id", "dot_q").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("dot_q").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
