package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-level BPE ([[Bpe.trainMergesBytes]]/[[Bpe.encodeBytes]]) —
  * the independent-reimplementation pins of BpeSpec plus the claims
  * unique to the byte variant: totality over arbitrary Unicode (no
  * possible out-of-alphabet word — unseen codepoints tokenize as byte
  * singles) and the roundtrip guarantee (concatenating a word's
  * pieces reproduces its UTF-8 bytes exactly, even when a multi-byte
  * codepoint is split across pieces). */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hexSyms is the word's UTF-8 bytes as lowercase hex pairs") {
    assert(Bpe.hexSyms("ab").toSeq == Seq("61", "62"))
    assert(Bpe.hexSyms("é").toSeq == Seq("c3", "a9"))
    assert(Bpe.hexSyms("中").toSeq == Seq("e4", "b8", "ad"))
    // supplementary plane: 4 bytes
    assert(Bpe.hexSyms(new String(Character.toChars(0x1F680))).toSeq ==
      Seq("f0", "9f", "9a", "80"))
  }

  test("learns the byte merge sequence on a hand-checkable corpus") {
    // "low low lower": 6c+6f (count 3) first, then 6c6f+77 (3)
    val m = Bpe.trainMergesBytes(
        Seq((0, "low low lower")).toDF("id", "text"), "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1L, "6c", "6f", 3L)))
    assert(m(1) === ((2L, "6c6f", "77", 3L)))
  }

  test("matches the independent reference implementation on real data") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Bpe.trainMergesBytes(docs, "text", numMerges = 12)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // reference word counts via the SHARED tokenizer (ADVICE r18: a
    // private split(lower, "\\s+") could silently drift from
    // trainMergesBytes — Java \s includes \x0B, and it skips the
    // no-space-script bigram routing — if regenerated testdata ever
    // carries such characters; one tokenization, both sides)
    val wordCounts = docs
      .select(col("text")).collect().iterator
      .flatMap(r => graft.functions.TextFunctions.tokenizeScala(
        r.getString(0)))
      .filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
    val want = Bpe.referenceMergesSyms(
      wordCounts.toSeq.map { case (w, c) => (Bpe.hexSyms(w).toVector, c) },
      12)
    assert(got === want)
  }

  test("totality + roundtrip: unseen emoji/CJK bytes tokenize as byte " +
      "singles and pieces concatenate back to the word's bytes") {
    // merges trained on ASCII never fire on the plant's bytes
    val merges = Seq(("6c", "6f"), ("6c6f", "77"))
    val ranks = merges.zipWithIndex.toMap
    val words = Seq("low", "中文", "👍", "naïve", "ไทย")
    words.foreach { w =>
      val pieces = Bpe.mergeGreedy(Bpe.hexSyms(w), ranks)
      // roundtrip: hex concat of pieces == hex of the word's bytes
      assert(pieces.mkString == Bpe.hexSyms(w).mkString, s"word '$w'")
      // greedy equals the rank-order replay (the referenceEncode
      // equivalence, byte alphabet)
      assert(pieces.toVector ==
        Bpe.referenceEncodeSyms(Bpe.hexSyms(w).toVector, merges),
        s"word '$w'")
    }
    // the ASCII word actually merges; the unseen-byte words are all
    // singles (totality: nothing UNKs, nothing drops)
    assert(Bpe.mergeGreedy(Bpe.hexSyms("low"), ranks).toSeq == Seq("6c6f77"))
    assert(Bpe.mergeGreedy(Bpe.hexSyms("👍"), ranks).length == 4)
  }

  test("encodeBytes: per-doc counters and hash over a closed-form doc") {
    val df = Seq((1L, "low low 中")).toDF("doc_id", "text")
    val merges = Seq(("6c", "6f"), ("6c6f", "77"))
    val r = Bpe.encodeBytes(df, "doc_id", "text", merges).collect()(0)
    // words: low, low, 中 (single CJK char stays one unigram token
    // through the script-aware tokenizer)
    assert(r.getLong(1) == 3L) // n_words
    assert(r.getLong(2) == 3L + 3L + 3L) // n_bytes: 3 + 3 + 3 (中 = e4 b8 ad)
    assert(r.getLong(3) == 1L + 1L + 3L) // n_tokens: lo w->low merged fully
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("6c6f77|6c6f77|e4 b8 ad".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getString(4) == want)
  }
}
