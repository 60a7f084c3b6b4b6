package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compression-ratio quality signal ([[TextMetrics.compressionRatio]],
  * q238): byte counts against a direct driver-side Deflater
  * computation, the redundancy ordering a compression signal exists to
  * expose, and the edge rows (empty, null). */
class DeflateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deflateLen(s: String): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  test("kernel byte counts equal a direct Deflater computation; ratio " +
      "is the decimal-round of the integers") {
    val texts = Seq(
      1L -> ("la " * 200),                                    // loop
      2L -> ("the quick brown fox jumps over the lazy dog. " +
        "pack my box with five dozen liquor jugs. " +
        "how vexingly quick daft zebras jump. " +
        "sphinx of black quartz judge my vow. " +
        "the five boxing wizards jump quickly. " +
        "a quart jar of oil mixed with zinc oxide makes " +
        "a very bright paint."),                              // natural
      3L -> (0 until 120).map(i =>
        java.lang.Long.toString(i * 2654435761L % 2176782336L, 36))
        .mkString(" "),                                       // high entropy
      4L -> "x")
    val out = TextMetrics.compressionRatio(
        texts.toDF("doc_id", "text").repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    texts.foreach { case (id, s) =>
      val (raw, defl, ratio) = out(id)
      assert(raw == s.getBytes("UTF-8").length.toLong, s"raw at $id")
      assert(defl == deflateLen(s), s"deflate at $id")
      val want = BigDecimal(defl.toDouble / raw.toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio == want, s"ratio at $id")
    }
    // the signal's reason to exist: loops compress below natural text,
    // natural text below high-entropy noise
    assert(out(1L)._3 < out(2L)._3 && out(2L)._3 < out(3L)._3,
      s"redundancy ordering broke: $out")
  }

  test("empty and null texts: zero bytes, null ratio (never divide)") {
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextMetrics.compressionRatio(out, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.isNullAt(3)))).toMap
    assert(rows(1L) == ((0L, true)))
    assert(rows(2L) == ((0L, true)))
  }
}
