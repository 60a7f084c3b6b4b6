package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TruncationEnergySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Similarity.truncationEnergy(
      Seq(
        (0L, Seq(3f, 4f, 0f, 0f)), // energy lives entirely in the half
        (1L, Seq(0f, 0f, 3f, 4f)), // ...and entirely outside it
        (2L, Seq(0f, 0f, 0f, 0f)), // zero vector → null energies
        (3L, Seq(1f, 1f, 1f, 1f, 1f)) // odd-ish dim: 5 → half 2, quarter 1
      ).toDF("vec_id", "embedding"), "vec_id", "embedding")
    .collect().map(r => r.getLong(0) -> r).toMap

  test("closed forms: prefix norm ratio under sqrt") {
    // v0: half = [3,4] carries all 25 → 1.0; quarter = [3] → 3/5
    assert(rows(0L).getDouble(3) === 1.0)
    assert(rows(0L).getDouble(4) === 0.6)
    // v1: half = [0,0] → 0.0
    assert(rows(1L).getDouble(3) === 0.0)
  }

  test("zero vector yields null, not a division blow-up") {
    assert(rows(2L).isNullAt(3) && rows(2L).isNullAt(4))
    assert(rows(2L).getLong(2) == 0L)
  }

  test("prefix lengths floor the fraction (dim 5 → half 2, quarter 1)") {
    // all-ones dim 5: full 5, half 2, quarter 1 (in units of 1e12)
    val full = rows(3L).getLong(2)
    assert(full == 5L * 1000000000000L)
    assert(math.abs(rows(3L).getDouble(3) - math.sqrt(2.0 / 5.0)) < 1e-6)
    assert(math.abs(rows(3L).getDouble(4) - math.sqrt(1.0 / 5.0)) < 1e-6)
  }
}
