package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column-level text/timestamp primitives: T1 parse, T4/T2 token
  * pipeline, T5/T6/T10 formatting, shingles and hashes. */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("T1: Twitter timestamp format round-trips through parse") {
    val df = Seq("Mon Feb 29 23:59:59 +0000 2016", "Wed Jan 01 00:00:00 +0000 2020")
      .toDF("s")
    val back = df.select(
      TextFunctions.formatTwitterTime(
        TextFunctions.parseTwitterTime(col("s"))).as("r"))
      .as[String].collect()
    assert(back.toSeq == Seq("Mon Feb 29 23:59:59 +0000 2016",
      "Wed Jan 01 00:00:00 +0000 2020"))
  }

  test("T2 index terms: tokenize, drop 1-char, drop stopwords, stem — keeps duplicates") {
    val got = Seq("The Table tables a of TABLE x")
      .toDF("t").select(TextFunctions.indexTerms(col("t")).as("r"))
      .as[Seq[String]].head()
    // 'the'/'of' stopwords, 'a'/'x' short; 'table'/'tables' both stem to
    // 'tabl' and BOTH occurrences survive
    assert(got == Seq("tabl", "tabl", "tabl"))
  }

  test("T5/T6: lon,lat string and lat-first WKT") {
    assert(one[String](TextFunctions.lonLat(lit(7.25), lit(-50.5))) == "7.25,-50.5")
    assert(one[String](TextFunctions.wktPointLatFirst(lit(50), lit(7))) == "POINT(50 7)")
  }

  test("T10: screen-name whitespace cleanup") {
    assert(one[String](TextFunctions.cleanUserName(lit("u 1 2\t3"))) == "u123")
  }

  test("shingles: sliding n-grams, whole-text fallback under n tokens") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokenize(col("t")), 3).as("r"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokenize(col("t")), 3).as("r"))
      .as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("minhash signature is the min salted md5 and varies with salt") {
    val sh = array(lit("x"), lit("y"))
    val s0 = one[String](TextFunctions.minhashSig(sh, 0))
    val s1 = one[String](TextFunctions.minhashSig(sh, 1))
    // deterministic, matches a direct computation
    val md5s0 = Seq("0:x", "0:y").map(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString)
    assert(s0 == md5s0.min)
    assert(s0 != s1)
  }

  test("tokenizeScala is the exact kernel twin of the Column tokenize") {
    // the one word-extraction definition shared by training (Column
    // form, empties dropped by length > 0) and the mapPartitions encode
    // kernels (Bpe.encode / Unigram.encode) — drift here would let an
    // encode-time word contain a character absent from the trained
    // singles and fail segmentation at runtime (round-14 ADVICE)
    val cases = Seq("Hello  World", " lead\ttab\nnewline\fff\rcr trail ",
      "UPPER MiXeD", "", "   ", "a", "punct,stays! together",
      "Éléphant Über",
      // no-space scripts (Scala literals — never Spark chr())
      "漢字テスト", "abc中文def",
      "ภาษาไทย mixed",
      "一", "一二", "en 中 en 文")
    cases.foreach { s =>
      val viaColumn = Seq(s).toDF("t")
        .select(filter(TextFunctions.tokenize(col("t")),
          w => length(w) > 0).as("r"))
        .collect()(0).getSeq[String](0)
      assert(TextFunctions.tokenizeScala(s).toSeq == viaColumn, s"input '$s'")
    }
    assert(TextFunctions.tokenizeScala(null).isEmpty)
  }

  test("tokenize: no-space-script runs become char bigrams; ASCII is " +
      "bit-identical to the plain whitespace split") {
    // closed-form bigram semantics: run of length L -> L-1 bigrams
    // (L=1 -> unigram); OTHER runs split out whole; per-run routing
    // handles mixed tokens without a per-document script verdict
    assert(TextFunctions.tokenizeScala("漢字試験").toSeq ==
      Seq("漢字", "字試", "試験"))
    assert(TextFunctions.tokenizeScala("一").toSeq == Seq("一"))
    assert(TextFunctions.tokenizeScala("abc中文def").toSeq ==
      Seq("abc", "中文", "def"))
    // Thai routes; Hangul does NOT (Korean uses spaces)
    assert(TextFunctions.tokenizeScala("ไทย").toSeq == Seq("ไท", "ทย"))
    assert(TextFunctions.tokenizeScala("한국어").toSeq == Seq("한국어"))
    // supplementary (Ext-B) ideographs stay OUTSIDE the no-space set —
    // BMP-only by design, surrogate pairs ride through whole
    val extB = new String(Character.toChars(0x20000))
    assert(TextFunctions.tokenizeScala(s"a${extB}b").toSeq ==
      Seq(s"a${extB}b"))
    // ASCII / separator-scripted text: the Column form equals the OLD
    // split(lower, ws) byte-for-byte INCLUDING empty tokens (size()
    // consumers depend on the empty-token parity)
    val asciiCases = Seq("Hello  World", " lead trail ", "", "   ", "a b ")
    asciiCases.foreach { s =>
      val got = Seq(s).toDF("t")
        .select(TextFunctions.tokenize(col("t")).as("r"))
        .collect()(0).getSeq[String](0)
      val old = Seq(s).toDF("t")
        .select(split(lower(col("t")), "[ \\t\\n\\f\\r]+").as("r"))
        .collect()(0).getSeq[String](0)
      assert(got == old, s"input '$s': $got vs $old")
    }
  }

  test("fingerprint: first 15 md5 hex chars as a long, non-negative") {
    val f = one[Long](TextFunctions.fingerprint(lit("hello")))
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes).map("%02x".format(_)).mkString
    assert(f == java.lang.Long.parseLong(md5hex.take(15), 16))
    assert(f >= 0L)
  }
}
