package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Script-routed language ID ([[TextMetrics.scriptRoutedLangId]],
  * q254): direct single-script labels, the kana-presence ja/zh split
  * inside the merged CJK class, the trigram router on the Latin arm,
  * and the degenerate no-letters row. */
class ScriptLangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-script routing: direct labels, ja/zh kana split, Latin " +
      "trigram arm, no-letters und") {
    val profiles = TextMetrics.trigramProfiles.toDF("lang", "ngram", "weight")
    val rows = Seq(
      (1L, "the thing is the best"),  // latin -> trigram 'en'
      (2L, "der und ein sch ich"),    // latin -> trigram 'de'
      (3L, "你好世界"),                // han only -> zh
      (4L, "こんにちは世界"),           // kana present -> ja
      (5L, "ภาษาไทย"),                // thai -> th
      (6L, "안녕하세요"),               // hangul -> ko
      (7L, "привет мир"),             // cyrillic -> ru
      (8L, "مرحبا"),                  // arabic -> ar
      (9L, "γειά σου"),               // greek -> el
      (10L, "नमस्ते"),                 // devanagari -> hi
      (11L, "12 34 ***"))             // no letters -> none/und
    val out = TextMetrics.scriptRoutedLangId(
        rows.toDF("doc_id", "text").repartition(3), "doc_id", "text",
        profiles)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out(1L) == (("latin", "en")))
    assert(out(2L) == (("latin", "de")))
    assert(out(3L) == (("cjk", "zh")))
    assert(out(4L) == (("cjk", "ja")))
    assert(out(5L) == (("thai", "th")))
    assert(out(6L) == (("hangul", "ko")))
    assert(out(7L) == (("cyrillic", "ru")))
    assert(out(8L) == (("arabic", "ar")))
    assert(out(9L) == (("greek", "el")))
    assert(out(10L) == (("devanagari", "hi")))
    assert(out(11L) == (("none", "und")))
  }
}
