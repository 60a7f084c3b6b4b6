package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourceDivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jsd(docs: Seq[(String, String)]): Map[(String, String), (Long, Double)] =
    TextMetrics.sourceDivergence(
        docs.toDF("source", "text"), "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

  test("identical distributions have zero divergence") {
    val m = jsd(Seq(("s1", "a b c"), ("s2", "a b c")))
    assert(m(("s1", "s2")) == ((3L, 0.0)))
  }

  test("disjoint vocabularies hit the ln2 ceiling via the remainder term") {
    // no shared tokens → the pair has NO join row and is absent; a pair
    // sharing one token but otherwise disjoint shows the remainder
    val m = jsd(Seq(("s1", "a x x x"), ("s2", "a y y y")))
    val (nShared, v) = m(("s1", "s2"))
    assert(nShared == 1L)
    // closed form: shared 'a' (p=q=1/4) contributes 0; remainder
    // 0.5·ln2·(3/4 + 3/4) = 0.75·ln2
    assert(math.abs(v - 0.75 * math.log(2.0)) < 1e-6)
  }

  test("jsd is bounded by ln 2 and grows with distributional skew") {
    val near = jsd(Seq(("s1", "a a a b"), ("s2", "a a b b")))(("s1", "s2"))._2
    val far = jsd(Seq(("s1", "a a a b"), ("s2", "a b b b")))(("s1", "s2"))._2
    assert(near > 0.0 && far > near)
    assert(far <= math.log(2.0) + 1e-9)
  }
}
