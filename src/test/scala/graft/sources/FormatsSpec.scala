package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[Formats.roundtrip]] — the quoting/typing cases the clean corpus
  * never exercises: embedded delimiters, quotes, newlines,
  * digit-looking strings (which inferSchema would corrupt but the
  * explicit schema must preserve as strings). */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val nasty = Seq(
    (1L, "plain text"),
    (2L, "comma, inside"),
    (3L, "a \"quoted\" word"),
    (4L, "line\nbreak"),
    (5L, "12345"),          // digit-looking: must stay a string
    (6L, " leading and trailing "),
    (7L, "tab\there"))

  test("CSV round trip preserves every adversarial value under the explicit schema") {
    val df = nasty.toDF("id", "v")
    val path = java.nio.file.Files.createTempDirectory("fmt_csv").toString
    // no multiLine here on purpose: the helper's own pinned defaults
    // must survive the embedded-newline row (a review found the claim
    // held only when the CALLER remembered the option)
    val back = Formats.roundtrip(df, "csv", path, Map("header" -> "true"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == nasty.toMap)
    assert(back(5L) == "12345") // string, not coerced
  }

  test("JSON-lines round trip is lossless under the explicit schema") {
    val df = nasty.toDF("id", "v")
    val path = java.nio.file.Files.createTempDirectory("fmt_json").toString
    val back = Formats.roundtrip(df, "json", path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == nasty.toMap)
    assert(back(5L) == "12345") // string, not re-inferred as a number
  }

  test("ORC round trip is lossless and schema-exact") {
    val df = nasty.toDF("id", "v")
    val path = java.nio.file.Files.createTempDirectory("fmt_orc").toString
    val rt = Formats.roundtrip(df, "orc", path)
    // file sources relax nullability on read; names and types must hold
    assert(rt.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rt.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      nasty.toMap)
  }
}
