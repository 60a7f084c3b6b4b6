package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Native stem_tokens expression: value parity with the UDF form across
  * interpreted and codegen paths, null handling, SQL-text availability. */
class StemTokensSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = Seq(
    (1L, Seq("running", "tables", "happily", "agreed", "caresses")),
    (2L, Seq("", "a", "sky")),
    (3L, Seq.empty[String]),
    (4L, null.asInstanceOf[Seq[String]]))

  test("native expression equals the UDF form, including nulls and empties") {
    val df = fixtures.toDF("id", "toks")
    val both = df.select(col("id"),
      TextFunctions.stemTokens(col("toks")).as("native"),
      TextFunctions.stemTokensUdfForm(col("toks")).as("viaUdf"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[collection.Seq[String]]("native") == r.getAs[collection.Seq[String]]("viaUdf"),
        s"id=${r.getLong(0)}")
    }
  }

  test("stem_tokens resolves from SQL text via GraftExtensions") {
    fixtures.take(1).toDF("id", "toks").createOrReplaceTempView("stem_in")
    val out = spark.sql("SELECT stem_tokens(toks) AS s FROM stem_in")
      .collect().head.getAs[collection.Seq[String]]("s")
    assert(out == Seq("run", "tabl", "happili", "agre", "caress"))
  }

  test("interpreted eval matches codegen output") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // direct interpreted eval of the expression kernel
    val in = new GenericArrayData(
      Array[AnyRef](UTF8String.fromString("running"), null, UTF8String.fromString("agreed")))
    val out = StemTokens.evalArray(in)
    assert(out.getUTF8String(0).toString == "run")
    assert(out.isNullAt(1))
    assert(out.getUTF8String(2).toString == "agre")
  }
}
