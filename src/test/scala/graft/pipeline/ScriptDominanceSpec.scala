package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unicode-script dominance ([[TextMetrics.scriptDominance]], q241):
  * hand-counted fixtures per script block, the fixed tie precedence,
  * the carved-out non-letters (× ÷), and the degenerate rows. */
class ScriptDominanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextMetrics.scriptDominance(rows.toDF("doc_id", "text").repartition(3),
        "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1),
          (2 to 8).map(r.getLong).toVector, r.getLong(9), r.getString(10),
          if (r.isNullAt(11)) null else r.getDouble(11)))
      }.toMap

  test("hand-counted script blocks; dominant + confidence by hand") {
    // counts order: latin, cyrillic, greek, arabic, devanagari, hangul, cjk
    val out = run(Seq(
      (1L, "abc où"),          // 5 latin (é-range ù counts), 1 space
      (2L, "мир и «да»"),      // 6 cyrillic, 2 spaces, 2 quotes
      (3L, "日本語 かな"),      // 3 cjk-block + 2 kana = 5 cjk
      (4L, "ab мир"),          // 2 latin vs 3 cyrillic -> cyrillic
      (5L, "3 × 4 ÷ 2"),       // NO letters: × ÷ carved out of latin
      (6L, "")))
    assert(out(1L) == ((6L, Vector(5L, 0, 0, 0, 0, 0, 0), 5L, "latin", 1.0)))
    assert(out(2L) == ((10L, Vector(0, 6L, 0, 0, 0, 0, 0), 6L, "cyrillic", 1.0)))
    assert(out(3L) == ((6L, Vector(0, 0, 0, 0, 0, 0, 5L), 5L, "cjk", 1.0)))
    val (_, c4, l4, d4, conf4) = out(4L)
    assert(c4 == Vector(2L, 3L, 0, 0, 0, 0, 0) && l4 == 5L &&
      d4 == "cyrillic" && conf4 == 0.6)
    assert(out(5L)._4 == "none" && out(5L)._5 == null)
    assert(out(6L) == ((0L, Vector(0, 0, 0, 0, 0, 0, 0), 0L, "none", null)))
  }

  test("tie precedence: equal counts resolve to the FIRST listed script") {
    // 2 latin vs 2 cyrillic: latin listed first wins the tie
    val out = run(Seq((1L, "ab ми"), (2L, "ми ab")))
    assert(out(1L)._4 == "latin" && out(2L)._4 == "latin")
    assert(out(1L)._5 == 0.5)
  }

  test("greek, arabic, hangul, devanagari blocks count; mixed doc " +
      "confidence is the dominant share") {
    val out = run(Seq(
      (1L, "γειά"),        // 4 greek
      (2L, "مرحبا"),       // 5 arabic
      (3L, "안녕하세요"),   // 5 hangul
      (4L, "नमस्ते"),      // 6 devanagari codepoints (incl. matras)
      (5L, "abcd γγ")))    // 4 latin, 2 greek -> latin 4/6
    assert(out(1L)._4 == "greek" && out(2L)._4 == "arabic")
    assert(out(3L)._4 == "hangul" && out(4L)._4 == "devanagari")
    assert(out(5L)._4 == "latin" && out(5L)._5 == 0.666667)
  }
}
