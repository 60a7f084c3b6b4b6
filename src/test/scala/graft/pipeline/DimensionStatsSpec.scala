package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DimensionStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-dimension rollup matches hand-computed values") {
    val rows = Similarity.dimensionStats(
        Seq(
          (0L, Seq(1f, 0f, -2f)),
          (1L, Seq(3f, 0f, 2f)),
          (2L, Seq(2f, 0f, 0f))
        ).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    // dim 1: quantized 1e6, 3e6, 2e6 → sum 6e6, mean 2e6, no zeros
    assert(rows(1L).getLong(1) == 3L)
    assert(rows(1L).getLong(2) == 6000000L)
    assert(rows(1L).getDouble(3) == 2000000.0)
    assert(rows(1L).getLong(6) == 0L)
    // dim 2: dead dimension — all zeros
    assert(rows(2L).getLong(2) == 0L && rows(2L).getLong(6) == 3L)
    assert(rows(2L).getLong(4) == 0L && rows(2L).getLong(5) == 0L)
    // dim 3: min is the negative coordinate
    assert(rows(3L).getLong(4) == -2000000L)
    assert(rows(3L).getLong(5) == 2000000L)
    assert(rows(3L).getLong(6) == 1L)
  }
}
