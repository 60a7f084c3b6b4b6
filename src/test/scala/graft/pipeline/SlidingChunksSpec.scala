package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SlidingChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String, window: Int, stride: Int) =
    TextMetrics.slidingChunks(
        Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text",
        window, stride)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // (id, start, n)
      .sortBy(_._1)

  test("stride < window produces overlapping windows covering every token") {
    // 10 tokens, window 4, stride 3 → starts 1,4,7 (+ ceil((10-4)/3)=2)
    val c = chunks((1 to 10).map("t" + _).mkString(" "), 4, 3)
    assert(c.toSeq == Seq((0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L)))
  }

  test("a trailing remainder gets its own partial window") {
    // 12 tokens, window 4, stride 3 → starts 1,4,7,10 (last has 3 tokens)
    val c = chunks((1 to 12).map("t" + _).mkString(" "), 4, 3)
    assert(c.length == 4)
    assert(c.last == ((3L, 10L, 3L)))
  }

  test("short documents yield exactly one chunk; stride=window degenerates to q45") {
    assert(chunks("a b", 4, 3).toSeq == Seq((0L, 1L, 2L)))
    val disjoint = chunks((1 to 9).map("t" + _).mkString(" "), 4, 4)
    assert(disjoint.toSeq == Seq((0L, 1L, 4L), (1L, 5L, 4L), (2L, 9L, 1L)))
  }

  test("consecutive chunks share window-stride tokens") {
    val toks = (1 to 10).map("t" + _)
    val rows = TextMetrics.slidingChunks(
        Seq((0L, toks.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 4, 3)
      .collect().map(_.getString(4))
    // md5 of the expected slices
    def h(s: Seq[String]) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(rows.toSeq == Seq(h(toks.slice(0, 4)), h(toks.slice(3, 7)), h(toks.slice(6, 10))))
  }
}
