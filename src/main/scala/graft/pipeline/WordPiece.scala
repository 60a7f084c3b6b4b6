package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** WordPiece encoding — the third tokenizer ALGORITHM beside BPE
  * (q71/q76: apply trained merges) and Unigram (q209/q210: Viterbi
  * over piece costs): BERT-family greedy longest-match-first. Each
  * word is consumed left to right; at every position the LONGEST
  * vocabulary piece matching there is taken (word-initial pieces are
  * bare, continuations carry the `##` prefix), and a word with NO
  * matching piece at any reached position becomes one `[UNK]` token
  * whole — the all-or-nothing rule that distinguishes WordPiece from
  * BPE's always-total merge application.
  *
  * Spark shape: one mapPartitions kernel over (doc, wpos, word) rows
  * with the vocabulary broadcast as a hash set (greedy longest-match
  * probes at most maxPieceLen candidates per position — no regex, no
  * per-row allocation beyond the piece list). The oracle replays the
  * SAME semantics through an INDEPENDENT relational construction
  * (per-position longest-match argmax + a recursive pointer walk), so
  * the two engines cannot share a bug. Word extraction is
  * [[TextFunctions.tokenizeScala]] — the one shared definition, so
  * encode-time words cannot drift from the Column-form tokenizer.
  *
  * Scale shape: map-side only (the kernel runs where the text lives;
  * only pieces leave), vocabulary broadcast once per executor. */
object WordPiece {

  val Unk: String = "[UNK]"

  /** Greedy longest-match encode of one word against `vocab`
    * (word-initial pieces bare, continuations `##`-prefixed in the
    * vocab). Returns the piece list, or a single [[Unk]] when any
    * reached position has no match. */
  def encodeWord(word: String, vocab: Set[String],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      val prefix = if (pos == 0) "" else "##"
      var l = math.min(maxPieceLen, n - pos)
      var hit: String = null
      while (hit == null && l >= 1) {
        val cand = prefix + word.substring(pos, pos + l)
        // a word that literally STARTS with "##" must not match a
        // continuation piece at position 0 (word-initial pieces are
        // the non-## vocabulary entries — the oracle's NOT LIKE '##%'
        // arm; without this, "##ta"-shaped tokens diverge the engines)
        if (vocab.contains(cand) &&
            !(pos == 0 && cand.startsWith("##"))) hit = cand
        else l -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      pos += l
    }
    out.toSeq
  }

  /** Documents → one row per (doc, word position): the word, its
    * space-joined pieces, the piece count, and the UNK flag. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "wordpiece: empty vocabulary")
    val spark = docs.sparkSession
    val vocabSet = vocab.toSet
    val maxLen = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    val bc = spark.sparkContext.broadcast((vocabSet, maxLen))
    val in = docs.select(col(idCol).cast("long"), col(textCol))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("wpos", LongType, nullable = false),
      StructField("word", StringType, nullable = false),
      StructField("pieces", StringType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("is_unk", BooleanType, nullable = false)))
    in.mapPartitions { rows =>
      val (vs, ml) = bc.value
      rows.flatMap { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        TextFunctions.tokenizeScala(text).iterator.zipWithIndex.map {
          case (w, i) =>
            val ps = encodeWord(w, vs, ml)
            Row(id, (i + 1).toLong, w, ps.mkString(" "),
              ps.length.toLong, ps == Seq(Unk))
        }
      }
    }(Encoders.row(outSchema))
  }
}
