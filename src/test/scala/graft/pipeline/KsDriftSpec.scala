package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KsDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drift(docs: Seq[(String, String)]) =
    TextMetrics.ksDrift(docs.toDF("source", "text"), "source", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap

  private def words(n: Int) = (1 to n).map("w" + _).mkString(" ")

  test("identical distributions give zero drift") {
    val m = drift(Seq("a" -> words(3), "a" -> words(5),
      "b" -> words(3), "b" -> words(5)))
    assert(m("a") == ((2L, 0L, 3L, Some(0.0))))
    assert(m("b")._2 == 0L)
  }

  test("fully separated distributions give KS = 1 at the boundary value") {
    // a: lengths {2,3}; b: lengths {8,9} → ECDF gap 1.0 at n_tokens=3
    val m = drift(Seq("a" -> words(2), "a" -> words(3),
      "b" -> words(8), "b" -> words(9)))
    val (n, dmax, at, ks) = m("a")
    assert(n == 2L && at == 3L)
    assert(dmax == 4L) // cum_a(3)=2 · N_b=2 − 0 · 2
    assert(ks == Some(1.0))
  }

  test("KS matches the closed form for a partial shift") {
    // a: {2,4}; b: {2,6} → at v=4: |2·2 − 1·2| = 2 → ks = 2/(2·2) = 0.5
    val m = drift(Seq("a" -> words(2), "a" -> words(4),
      "b" -> words(2), "b" -> words(6)))
    assert(m("a") == ((2L, 2L, 4L, Some(0.5))))
  }

  test("a single-group corpus yields null (no rest to compare against)") {
    val m = drift(Seq("a" -> words(2), "a" -> words(4)))
    assert(m("a")._4 == None)
  }
}
