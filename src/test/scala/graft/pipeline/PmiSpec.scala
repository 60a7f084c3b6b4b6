package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: Seq[String], window: Int = 2, minCount: Long = 1L) =
    TextMetrics.pmiCooccurrence(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", window, minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

  test("pair generation respects the lookahead window and doc boundaries") {
    // "a b a b": lookahead-2 ordered pairs = ab(1,2) aa(1,3) ba(2,3) bb(2,4) ab(3,4)
    val m = run(Seq("a b a b"))
    assert(m.keySet === Set(("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")))
    assert(m(("a", "b"))._1 == 2L)
    assert(m(("a", "a"))._1 == 1L)
    // two docs never pair across the boundary
    val two = run(Seq("a a", "b b"))
    assert(two.keySet === Set(("a", "a"), ("b", "b")))
  }

  test("pmi matches the closed form; totals count pre-threshold pairs") {
    val m = run(Seq("a b a b"))
    // c_ab=2, t_pair=5, c_a=c_b=2, t_tok=4 → ln((2/5)/((2/4)*(2/4))) = ln(1.6)
    assert(math.abs(m(("a", "b"))._4 - math.log(1.6)) < 1e-6)
    assert(m(("a", "b"))._2 == 2L && m(("a", "b"))._3 == 2L)
    // with minCount=2 only (a,b) survives, but its pmi is unchanged:
    // the totals are computed over ALL pairs, not the surviving ones
    val t = run(Seq("a b a b"), minCount = 2L)
    assert(t.keySet === Set(("a", "b")))
    assert(t(("a", "b"))._4 === m(("a", "b"))._4)
  }

  test("window=1 is adjacent bigrams only") {
    val m = run(Seq("a b c"), window = 1)
    assert(m.keySet === Set(("a", "b"), ("b", "c")))
  }
}
