package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SplitBalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cell masses, shares, and deviation numerators are exact") {
    val docs = (0 until 40).map(i => (i.toLong, "s0", "a b c"))
      .toDF("doc_id", "source", "text")
    val rows = TextMetrics.splitBalance(docs, "doc_id", "source", "text",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))))
      .toMap
    // replay the hash gate to know the true cell sizes
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val n = (0 until 40).map(i => bucket(i.toLong)).groupBy {
      case b if b < 80 => "train"
      case b if b < 90 => "val"
      case _ => "test"
    }.view.mapValues(_.size.toLong).toMap
    rows.foreach { case (split, (nDocs, nTok, expPct, share, dev)) =>
      assert(nDocs == n(split), s"cell $split")
      assert(nTok == nDocs * 3, "3 tokens per doc")
      val exp = if (split == "train") 80L else 10L
      assert(expPct == exp)
      assert(math.abs(share - 100.0 * nDocs / 40.0) < 1e-6)
      assert(dev == math.abs(nDocs * 100L - exp * 40L))
    }
    assert(rows.values.map(_._1).sum == 40L)
  }
}
