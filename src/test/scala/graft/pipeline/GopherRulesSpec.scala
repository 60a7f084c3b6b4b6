package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def flags(text: String): Map[String, Long] = {
    val row = TextMetrics.gopherRules(
      Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text").collect().head
    row.schema.fieldNames.drop(1).map(n =>
      n -> row.getLong(row.fieldIndex(n))).toMap
  }

  // 60 words, sane lengths, two distinct stopwords → every rule passes
  private val good =
    (1 to 58).map(i => s"word$i").mkString("the and ", " ", "") // the + and + 58

  test("a well-formed document passes all seven rules") {
    val f = flags(good)
    assert(f("n_words") == 60L)
    assert(f.filterKeys(_.startsWith("r_")).values.forall(_ == 1L), f.toString)
    assert(f("pass") == 1L)
  }

  test("each rule fires on its own violation") {
    assert(flags("the of short text")("r_word_count") == 0L)
    // 60 one-char words → mean length 1 < 3
    val ones = ("a " * 59) + "a"
    assert(flags(ones)("r_mean_word_len") == 0L)
    // hashes on every word → symbol ratio 1.0 > 0.1
    assert(flags(good.split(" ").map("#" + _).mkString(" "))("r_symbol_ratio") == 0L)
    // every line a bullet → bullet fraction 1.0 > 0.9
    assert(flags(good.split(" ").map("- " + _).mkString("\n"))("r_bullet_lines") == 0L)
    // every line ends with an ellipsis → 1.0 ≥ 0.3
    assert(flags(good.split(" ").map(_ + "...").mkString("\n"))("r_ellipsis_lines") == 0L)
    // 60 numeric words → alpha fraction 0 < 0.8
    assert(flags((1 to 60).mkString(" "))("r_alpha_words") == 0L)
    // only one distinct stop word
    assert(flags(("the " * 59) + "the")("r_stopwords") == 0L)
  }

  test("pass is the conjunction of the rule flags") {
    val f = flags((1 to 60).mkString(" ")) // numeric: alpha + stopwords fail
    assert(f("r_alpha_words") == 0L && f("r_stopwords") == 0L)
    assert(f("pass") == 0L)
    assert(flags(good)("pass") == 1L)
  }
}
