package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextMetrics.langIdNgram]] (the zero-shuffle count_substrs kernel
  * form) against [[TextMetrics.langIdNgramExploded]] (the original
  * explode → join → aggregate form) — two mechanisms, one function:
  * overlapping-occurrence weighting, ties to the smaller lang, 'und'
  * on zero hits, and the guards that keep the kernel's char-substring
  * matching equal to the window semantics. */
class LangIdKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val profiles =
    TextMetrics.trigramProfiles.toDF("lang", "ngram", "weight")

  test("kernel form equals the exploded form on adversarial fixtures " +
      "and on the real corpus") {
    val fixtures = Seq(
      (1L, "the the the and ing"),       // repeated grams, en
      (2L, "der und ein sch ich die"),   // de
      (3L, "ththththe"),                 // OVERLAPPING occurrences
      (4L, "xq zv kp"),                  // zero hits -> und/0
      (5L, ""),                          // empty
      (6L, "ab"),                        // shorter than a gram
      (7L, "que que"),                   // fr/es shared gram tie path
      (8L, "THE AND ING"))               // lower() applied in both
      .toDF("doc_id", "text").repartition(3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(
      rows(TextMetrics.langIdNgram(fixtures, "doc_id", "text", profiles)) ==
      rows(TextMetrics.langIdNgramExploded(fixtures, "doc_id", "text",
        profiles)))
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(
      rows(TextMetrics.langIdNgram(docs, "doc_id", "text", profiles)) ==
      rows(TextMetrics.langIdNgramExploded(docs, "doc_id", "text",
        profiles)))
  }

  test("kernel guards: non-trigram and supplementary grams refuse " +
      "loudly (they would silently diverge from window semantics)") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    val shortG = Seq(("xx", "ab", 1L)).toDF("lang", "ngram", "weight")
    val e1 = intercept[IllegalArgumentException] {
      TextMetrics.langIdNgram(d, "doc_id", "text", shortG)
    }
    assert(e1.getMessage.contains("3 characters"))
    val supp = new String(Character.toChars(0x1F600)) + "a"
    val suppG = Seq(("xx", supp, 1L)).toDF("lang", "ngram", "weight")
    val e2 = intercept[IllegalArgumentException] {
      TextMetrics.langIdNgram(d, "doc_id", "text", suppG)
    }
    assert(e2.getMessage.contains("supplementary"))
  }
}
