package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** C4 line-cleaning invariants (hand-computed fixtures). */
class C4CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextMetrics.c4LineClean(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), r.getBoolean(5)))).toMap

  test("line rules: terminal punctuation AND >= minWords words") {
    val out = run(Seq(
      (1L, "one two three four five.\nsix seven eight nine ten!\n" +
        "eleven twelve thirteen fourteen fifteen?"),     // 3 survivors
      (2L, "too short line.\nno terminal punctuation here at all\n" +
        "this one is long enough to survive."),          // 1 survivor
      (3L, "")))                                         // empty doc
    assert(out(1L)._1 == 3L && out(1L)._2 == 3L && out(1L)._5)
    assert(out(2L)._1 == 3L && out(2L)._2 == 1L && !out(2L)._5)
    assert(out(3L) == ((0L, 0L, 0L, None, false)))
  }

  test("clean hash is the md5 of surviving lines rejoined with newline") {
    val survivors = "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!"
    val out = run(Seq(
      (1L, "drop me\n" + survivors + "\nshort one.")))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(survivors.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._4.contains(expected))
    // kept_chars sums the survivors' own lengths — the join '\n' is not counted
    assert(out(1L)._3 == survivors.replace("\n", "").length)
  }

  test("blank and whitespace-only lines are not counted") {
    val out = run(Seq(
      (1L, "\n  \na b c d e.\n\n")))
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
  }

  test("null text behaves as an empty document") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a b c d e."))
      .toDF("doc_id", "text")
    val out = TextMetrics.c4LineClean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L && out(2L) == 1L)
  }

  test("doc rule threshold is configurable") {
    val two = "a b c d e.\nf g h i j."
    val out1 = TextMetrics.c4LineClean(Seq((1L, two)).toDF("doc_id", "text"),
      "doc_id", "text", minKeptLines = 2)
      .collect().head.getBoolean(5)
    val out2 = TextMetrics.c4LineClean(Seq((1L, two)).toDF("doc_id", "text"),
      "doc_id", "text", minKeptLines = 3)
      .collect().head.getBoolean(5)
    assert(out1 && !out2)
  }
}
