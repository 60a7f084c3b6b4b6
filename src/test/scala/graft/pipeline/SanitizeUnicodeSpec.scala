package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextMetrics.sanitizeUnicode]] (q255): zero-width deletion FUSES
  * the word, layout characters become plain spaces, controls become
  * spaces, tab/LF/CR and NUL are untouched, and the per-class ledger
  * counts what the rewrite then discards. */
class SanitizeUnicodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextMetrics.sanitizeUnicode(rows.toDF("doc_id", "text")
        .repartition(3), "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6)))
      }.toMap

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("deletion fuses, spacing preserves separation, keepers survive") {
    val out = run(Seq(
      (1L, "a\u200Bb"),          // zwsp deleted -> "ab" (one word)
      (2L, "x\u00A0y\u2009z"),   // nbsp + thin space -> "x y z"
      (3L, "p\u0007q\u000Br"),   // bell + vtab -> "p q r"
      (4L, "tab\there\nln\rcr"), // \t \n \r untouched
      (5L, "soft\u00ADhyphen"),  // shy deleted -> "softhyphen"
      (6L, "\uFEFFbom\u2060wj"), // bom + word joiner deleted
      (7L, "")))
    assert(out(1L) == ((1L, 0L, 0L, 3L, 2L, md5("ab"))))
    assert(out(2L) == ((0L, 0L, 2L, 5L, 5L, md5("x y z"))))
    assert(out(3L) == ((0L, 2L, 0L, 5L, 5L, md5("p q r"))))
    assert(out(4L) == ((0L, 0L, 0L, 14L, 14L,
      md5("tab\there\nln\rcr"))))
    assert(out(5L) == ((1L, 0L, 0L, 11L, 10L, md5("softhyphen"))))
    assert(out(6L) == ((2L, 0L, 0L, 7L, 5L, md5("bomwj"))))
    assert(out(7L) == ((0L, 0L, 0L, 0L, 0L, md5(""))))
    // the three tables are disjoint and NUL is deliberately outside
    // all of them (SQL literals cannot carry it)
    val all = TextMetrics.ZeroWidthDeleteChars +
      TextMetrics.ControlToSpaceChars + TextMetrics.UnicodeSpaceChars
    assert(all.distinct.length == all.length)
    assert(!all.contains('\u0000'))
    // plain ASCII space must never land in any table either (ADVICE
    // r19: in ZeroWidthDeleteChars the translate pass would silently
    // DELETE spaces corpus-wide) — both pins, NUL and space
    assert(!all.contains(' '))
    assert(!all.contains('\t') && !all.contains('\n') && !all.contains('\r'))
  }
}
