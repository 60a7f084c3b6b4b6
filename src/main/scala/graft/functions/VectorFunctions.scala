package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for the similarity-search pipeline.
  * All stay inside Catalyst higher-order functions (codegen, no UDF).
  *
  * The *exact* integer-quantized variants exist so correctness oracles in
  * other engines compare bit-identically: a float dot product's value can
  * differ in the last ulp between engines depending on summation order,
  * but `Σ floor(x*1e6) * floor(y*1e6)` over int64 is engine-independent.
  */
object VectorFunctions {

  /** Quantize a float/double vector to int64 (1e-6 resolution). */
  def quantize(vec: Column, scale: Double = 1e6): Column =
    transform(vec, x => floor(x.cast("double") * lit(scale)).cast("long"))

  /** Exact int64 dot product of two quantized vectors. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Double-precision dot product (sequential fold, deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize an embedding (the standard ANN preprocessing step so
    * dot product ≡ cosine); zero vectors pass through unchanged. */
  def l2normalize(vec: Column): Column = {
    val n = norm(vec)
    when(n > 0, transform(vec, x => x.cast("double") / n)).otherwise(vec)
  }

  /** Coarse LSH bucket for an embedding: sign bits of the first `nBits`
    * components. Cheap, deterministic, engine-portable; used to prune the
    * candidate set before exact re-ranking (IVF-style scale path). */
  def signBucket(vec: Column, nBits: Int = 8): Column = {
    val bits = (0 until nBits).map { i =>
      when(element_at(vec, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
