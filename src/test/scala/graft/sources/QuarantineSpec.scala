package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** [[Quarantine]] — malformed lines route to the side output with the
  * raw payload intact; schema-valid lines parse clean. The contract
  * boundary: quarantine is for lines the PARSER rejects — a
  * well-formed object with missing fields parses clean with null
  * columns (field validity belongs to the data contracts, q98). */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val schema = new StructType()
    .add("id", "long").add("text", "string")

  test("splitParsed: malformed variants quarantined with raw lines, clean rows parse") {
    import spark.implicits._
    val lines = Seq(
      """{"id": 1, "text": "alpha"}""", // clean
      """{corrupt {"id": 2, "text": "beta"}""", // garbage prefix
      """{"id": 3, "text": "gam""", // truncated mid-string
      "", // empty line
      """{"id": 4}""", // valid JSON, missing field: parses clean
      """not json at all""")
      .toDF("line").repartition(3)
    val (clean, bad) = Quarantine.splitParsed(lines, "line", schema)
    val cleanRows = clean.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(cleanRows == Set((1L, "alpha"), (4L, null)))
    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines == Set(
      """{corrupt {"id": 2, "text": "beta"}""",
      """{"id": 3, "text": "gam""",
      "",
      """not json at all"""))
  }

  test("auditReport: counts plus the clean-side character proof") {
    import spark.implicits._
    val lines = Seq(
      """{"id": 1, "text": "abc"}""",
      """{"id": 2, "text": "de"}""",
      "BROKEN")
      .toDF("line")
    val got = Quarantine.auditReport(lines, "line", schema, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("clean" -> ((2L, 5L)), "quarantined" -> ((1L, 0L))))
  }
}
