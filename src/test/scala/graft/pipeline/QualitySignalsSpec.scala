package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualitySignalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def signals(text: String): Map[String, Any] = {
    val row = TextMetrics.qualitySignals(
      Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("counts on a constructed two-line document") {
    val s = signals("Ab1 cd. ab1\nAb1 x!")
    assert(s("n_chars") == 18L)
    assert(s("n_lines") == 2L)
    assert(s("n_sents") == 2L)
    // lowercased tokens: ab1, cd., ab1, ab1, x! → 5 tokens, 3 types
    assert(s("n_tokens") == 5L)
    assert(s("n_types") == 3L)
    assert(s("ttr") == 0.6)
    assert(s("tokens_per_line") == 2.5)
  }

  test("character-class fractions") {
    val s = signals("AB12cd....") // 10 chars: 4 alpha, 2 digit, 2 upper
    assert(s("frac_alpha") == 0.4)
    assert(s("frac_digit") == 0.2)
    assert(s("frac_upper") == 0.2)
  }

  test("null text degrades to zeros, not nulls or NaN") {
    val row = TextMetrics.qualitySignals(
      Seq((0L, Option.empty[String])).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(row.getDouble(row.fieldIndex("ttr")) == 0.0)
    assert(row.getDouble(row.fieldIndex("frac_alpha")) == 0.0)
    assert(row.getDouble(row.fieldIndex("tokens_per_line")) == 0.0)
  }
}
