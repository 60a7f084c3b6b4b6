package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WordPiece greedy longest-match encoding ([[WordPiece]], q248):
  * hand-computed fixtures for the algorithm the q248 oracle replays
  * through its independent relational construction — greedy longest
  * at every position, `##` continuations, the all-or-nothing `[UNK]`
  * rule, and the kernel through Spark. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq("un", "##aff", "##able", "##ffable", "aff",
    "a", "b", "l", "e", "f", "u", "n", "##a", "##b", "##l", "##e",
    "##f", "##u", "##n")

  private def enc(w: String): Seq[String] =
    WordPiece.encodeWord(w, vocab.toSet, 7)

  test("greedy longest-match-first, not shortest and not optimal") {
    // at position 2 of "unaffable" both ##a and ##aff and ##ffable…
    // greedy takes ##aff (longest match THERE), then ##able
    assert(enc("unaffable") == Seq("un", "##aff", "##able"))
    // word-initial pieces are bare: "affable" starts with aff
    assert(enc("affable") == Seq("aff", "##able"))
    // single-char fallback keeps pure-vocab-letter words total
    assert(enc("fun") == Seq("f", "##u", "##n"))
  }

  test("all-or-nothing UNK: one unmatched position voids the word") {
    assert(enc("unz") == Seq(WordPiece.Unk)) // no ##z
    assert(enc("zun") == Seq(WordPiece.Unk)) // no initial z
    assert(enc("un!") == Seq(WordPiece.Unk))
    assert(enc("") == Seq.empty)
  }

  test("a word literally starting with ## never matches continuation " +
      "pieces at position 0 (the oracle's word-initial arm)") {
    // "##un": position 0 may only take word-initial (non-##) pieces;
    // '#' has no initial piece, so the whole word is UNK — matching
    // the relational oracle's NOT LIKE '##%' rule (a latent
    // cross-engine divergence on markdown-style tokens otherwise)
    assert(enc("##un") == Seq(WordPiece.Unk))
    assert(enc("#un") == Seq(WordPiece.Unk))
  }

  test("maxPieceLen caps the probe: a piece longer than the cap is " +
      "never taken even when present") {
    // with cap 3, ##able (4 chars after ##) is out of reach at
    // position 5, so the tail falls to single-char continuations
    assert(WordPiece.encodeWord("unaffable", vocab.toSet, 3) ==
      Seq("un", "##aff", "##a", "##b", "##l", "##e"))
  }

  test("encode through Spark: per-occurrence rows, positions, flags") {
    val docs = Seq(
      (1L, "fun unaffable x9"),
      (2L, "  affable  fun ")).toDF("doc_id", "text")
    val out = WordPiece.encode(docs, "doc_id", "text", vocab)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out((1L, 1L)) == (("fun", "f ##u ##n", 3L, false)))
    assert(out((1L, 2L)) == (("unaffable", "un ##aff ##able", 3L, false)))
    assert(out((1L, 3L)) == (("x9", "[UNK]", 1L, true)))
    // leading/trailing whitespace: positions index the FILTERED words
    assert(out((2L, 1L))._1 == "affable")
    assert(out((2L, 2L))._1 == "fun")
    assert(out.size == 5)
  }
}
