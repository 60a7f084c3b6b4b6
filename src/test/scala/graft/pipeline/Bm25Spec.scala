package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val terms = Seq("join", "slow", "vector", "spark")

  private lazy val rows = {
    val docs = Seq(
      (1L, "join join slow"),
      (2L, "vector the the the"),
      (3L, "spark"),
      (4L, "the the")).toDF("doc_id", "text")
    TextMetrics.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("docs with no query-term hit are absent; hit counts are per-term") {
    assert(!rows.contains(4L))
    assert(rows(1L)._1 == 2L && rows(1L)._2 == 3L) // join×2 + slow×1
    assert(rows(2L)._1 == 1L && rows(2L)._2 == 1L)
    assert(rows(3L)._1 == 1L && rows(3L)._2 == 1L)
  }

  test("scores match the closed-form BM25 (k1=1.2, b=0.75)") {
    // N=4 docs, Σdl=10, avgdl=2.5; every query term has df=1
    val idf = math.log((4 - 1 + 0.5) / (1 + 0.5) + 1) // ln(10/3)
    def s(tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.5)))
    assert(math.abs(rows(1L)._3 - (s(2, 3) + s(1, 3))) < 1e-6)
    assert(math.abs(rows(2L)._3 - s(1, 4)) < 1e-6)
    assert(math.abs(rows(3L)._3 - s(1, 1)) < 1e-6)
  }

  test("shorter documents outscore longer ones at equal tf") {
    assert(rows(3L)._3 > rows(2L)._3)
  }
}
