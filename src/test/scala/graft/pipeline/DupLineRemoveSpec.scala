package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand fixtures for [[TextMetrics.dupLineRemove]] (within-document
  * duplicate-line removal, first occurrence kept). */
class DupLineRemoveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, String)] =
    TextMetrics.dupLineRemove(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap

  test("repeats removed, first kept, order preserved") {
    val got = run(Seq(
      1L -> "nav\nbody one\nnav\nbody two\nnav",
      2L -> "a\nb\nc"))
    assert(got(1L) == (5L, 2L, 3L, md5("nav\nbody one\nbody two")))
    assert(got(2L) == (3L, 0L, 3L, md5("a\nb\nc")))
  }

  test("case matters; empty lines dedup like any other line") {
    val got = run(Seq(3L -> "X\nx\n\nmid\n\nX"))
    // lines: X, x, '', mid, '', X → dups: second '', second X
    assert(got(3L) == (6L, 2L, 4L, md5("X\nx\n\nmid")))
  }

  test("single-line and all-duplicate documents") {
    val got = run(Seq(4L -> "only", 5L -> "s\ns\ns\ns"))
    assert(got(4L) == (1L, 0L, 1L, md5("only")))
    assert(got(5L) == (4L, 3L, 1L, md5("s")))
  }
}
