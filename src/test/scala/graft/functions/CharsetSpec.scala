package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Charset front door ([[CharsetKernels]], `detect_charset` /
  * `decode_bytes`): BOM sniffing, the strict UTF-8 validator against
  * hand-built byte sequences (overlongs, surrogates, truncations), and
  * the Latin-1 fallback's byte-exact roundtrip. */
class CharsetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("strict UTF-8 validator: valid multibyte accepted; overlongs, " +
      "surrogates, bare continuations, truncations rejected") {
    assert(CharsetKernels.isValidUtf8(utf8("plain ascii")))
    assert(CharsetKernels.isValidUtf8(utf8("café — ±µ 😀 中文")))
    assert(CharsetKernels.isValidUtf8(Array.empty[Byte]))
    // overlong '/' (C0 AF), overlong U+0000 3-byte (E0 80 80)
    assert(!CharsetKernels.isValidUtf8(Array(0xC0, 0xAF).map(_.toByte)))
    assert(!CharsetKernels.isValidUtf8(Array(0xE0, 0x80, 0x80).map(_.toByte)))
    // encoded surrogate U+D800 (ED A0 80)
    assert(!CharsetKernels.isValidUtf8(Array(0xED, 0xA0, 0x80).map(_.toByte)))
    // past U+10FFFF (F4 90 80 80) and illegal lead bytes F5/FF
    assert(!CharsetKernels.isValidUtf8(Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte)))
    assert(!CharsetKernels.isValidUtf8(Array(0xF5.toByte)))
    assert(!CharsetKernels.isValidUtf8(Array(0xFF.toByte)))
    // bare continuation; truncated 2/3/4-byte heads
    assert(!CharsetKernels.isValidUtf8(Array(0x80.toByte)))
    assert(!CharsetKernels.isValidUtf8(Array(0xC3.toByte)))
    assert(!CharsetKernels.isValidUtf8(utf8("café").dropRight(1)))
    assert(!CharsetKernels.isValidUtf8(utf8("😀").dropRight(1)))
  }

  test("detection + decode: BOMs strip, UTF-16 endians decode, invalid " +
      "UTF-8 falls back to byte-exact Latin-1") {
    val text = "héllo wörld ±"
    val cases = Seq(
      ("utf-8", utf8(text), text),
      ("utf-8-bom", Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8(text), text),
      ("utf-16le", Array(0xFF, 0xFE).map(_.toByte) ++
        text.getBytes(StandardCharsets.UTF_16LE), text),
      ("utf-16be", Array(0xFE, 0xFF).map(_.toByte) ++
        text.getBytes(StandardCharsets.UTF_16BE), text),
      ("latin-1", text.getBytes(StandardCharsets.ISO_8859_1), text),
      // Latin-1 roundtrip is BYTE-exact: every 0x80..0xFF byte maps to
      // its codepoint, nothing is dropped or replaced
      ("latin-1", (0x80 to 0xFF).map(_.toByte).toArray,
        new String((0x80 to 0xFF).map(_.toByte).toArray,
          StandardCharsets.ISO_8859_1)),
      ("utf-8", Array.empty[Byte], ""))
    cases.zipWithIndex.foreach { case ((want, bytes, wantText), i) =>
      assert(CharsetKernels.charsetOf(bytes) == want, s"case $i label")
      assert(CharsetKernels.decode(bytes).toString == wantText, s"case $i text")
    }
  }

  test("the expressions run inside a plan (codegen path) and agree with " +
      "the kernel") {
    val rows = Seq(
      (1L, utf8("plain")),
      (2L, Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ utf8("bom'd")),
      (3L, "café".getBytes(StandardCharsets.ISO_8859_1)),
      (4L, Array(0xFF, 0xFE).map(_.toByte) ++
        "wide".getBytes(StandardCharsets.UTF_16LE)))
    val out = rows.toDF("id", "raw")
      .select(col("id"), call_function("detect_charset", col("raw")).as("cs"),
        call_function("decode_bytes", col("raw")).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out(1L) == (("utf-8", "plain")))
    assert(out(2L) == (("utf-8-bom", "bom'd")))
    assert(out(3L) == (("latin-1", "café")))
    assert(out(4L) == (("utf-16le", "wide")))
  }
}
