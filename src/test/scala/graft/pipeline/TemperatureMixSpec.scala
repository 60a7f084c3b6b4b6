package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 docs of "a", 16 of "b", 64 of "c": sqrt-temperature rates are
  // exactly 100, 50, 25 — no floor boundary ambiguity
  private lazy val report = {
    val docs = (0 until 84).map { i =>
      val g = if (i < 4) "a" else if (i < 20) "b" else "c"
      (i.toLong, s"text $i", g)
    }.toDF("doc_id", "text", "grp")
    TextMetrics.temperatureMixReport(docs, "doc_id", "grp")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("rates follow floor(100*sqrt(n_min/n)) with the smallest group kept whole") {
    assert(report("a")._1 == 4L && report("a")._2 == 100L)
    assert(report("b")._1 == 16L && report("b")._2 == 50L)
    assert(report("c")._1 == 64L && report("c")._2 == 25L)
  }

  test("kept counts are bounded by the gate and full for rate 100") {
    assert(report("a")._3 == 4L, "rate-100 group keeps every document")
    report.values.foreach { case (n, _, kept) => assert(kept <= n) }
  }

  test("kept counts equal a direct replay of the hash gate") {
    val fp = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = fp.digest(s"tmix:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val expectB = (4 until 20).count(i => bucket(i.toLong) < 50)
    val expectC = (20 until 84).count(i => bucket(i.toLong) < 25)
    assert(report("b")._3 == expectB.toLong)
    assert(report("c")._3 == expectC.toLong)
  }
}
