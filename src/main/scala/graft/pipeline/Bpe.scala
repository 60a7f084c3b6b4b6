package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** Deterministic BPE merge training — the tokenizer-construction step of
  * a training-data pipeline (the merges a byte-pair-encoding tokenizer
  * applies are LEARNED from corpus statistics exactly like this).
  *
  * Algorithm (classic Sennrich BPE over word frequencies): words split
  * into character symbols; each round counts adjacent symbol pairs
  * weighted by word frequency, merges the most frequent pair (ties by
  * lexicographic (left, right) — deterministic across engines,
  * partitionings and reruns), and rewrites the symbol sequences.
  *
  * Scale shape — the same profile as real tokenizer trainers (HF
  * `tokenizers` aggregates word counts first): the CORPUS is read once,
  * into a (word, count) relation of vocabulary cardinality; every
  * training round then runs on that compact relation — one pair-count
  * hash aggregate (map-side combined), a 1-row argmax broadcast back,
  * and a map-side rewrite. No round touches the corpus; driver traffic
  * per round is the single winning pair. `localCheckpoint` every round
  * keeps the iterative lineage linear (house discipline, see
  * Similarity.trainCentroids / Dedup.nearDupClusters).
  *
  * Not SQL-expressible (iterative greedy argmax) → no DuckDB oracle;
  * BpeSpec pins the merge sequence against an independent single-pass
  * Scala reimplementation on the same inputs (stronger than a golden
  * hash — two implementations, one answer).
  */
object Bpe {

  /** @return one row per learned merge: (merge_rank from 1, left, right,
    *         pair_count) in learning order. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "trainMerges: numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    // the one corpus-scale pass: word frequencies
    val words = docs
      .select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // symbol state: word → current symbol sequence (starts as characters)
    var state = words
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // adjacent pairs weighted by word count; argmax with the
      // deterministic (count DESC, left ASC, right ASC) total order
      val top = state
        .select(col("cnt"), explode(
          when(size(col("syms")) >= 2,
            sequence(lit(1), size(col("syms")) - 1))
            .otherwise(array().cast("array<int>"))).as("_i"),
          col("syms"))
        .select(element_at(col("syms"), col("_i")).as("l"),
          element_at(col("syms"), col("_i") + 1).as("r"), col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, pc))
        // rewrite: merge every non-overlapping (l, r) occurrence left
        // to right — a fold over the symbol array (vocabulary-sized
        // relation, map-side; the lambda is interpreted but runs on
        // |vocab| rows, not the corpus). The null sentinel keeps the
        // fold total on the first element; finish drops it.
        val merged = aggregate(
          col("syms"),
          array(lit(null).cast("string")),
          (acc, s) => when(
            element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s))),
          acc => slice(acc, lit(2), size(acc) - 1))
        state = state.select(merged.as("syms"), col("cnt")).localCheckpoint()
        rank += 1
      }
    }
    merges.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /** BPE tokenizer APPLICATION — encode a corpus with learned merges
    * ([[trainMerges]] output, in rank order). Per word: repeatedly merge
    * the adjacent pair with the LOWEST merge rank present (greedy
    * lowest-rank-first, the standard BPE encode; deterministic because
    * ranks are unique), until no learnable pair remains. Emits per doc
    * the word/char/BPE-token counts (n_chars/n_tokens is the compression
    * the tokenizer buys) and an md5 over the full token stream (tokens
    * joined with spaces, words with `|`) pinning the encode byte-exactly.
    *
    * Scale shape: the merge table is vocabulary-sized → a plain
    * broadcast; the corpus pass is one mapPartitions kernel — no
    * shuffle, scan-bound, embarrassingly parallel. Only fixed-width
    * counters and one hash per doc leave the partition. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val rankOf: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    require(rankOf.size == merges.size, "encode: duplicate merge pair")
    val bc = spark.sparkContext.broadcast(rankOf)
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("n_words", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("tokens_hash", StringType, nullable = true)))
    in.mapPartitions { rows =>
      val ranks = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val t = if (r.isNullAt(1)) "" else r.getString(1)
        // mirrors TextFunctions.tokenize (lower-case, split on \s+)
        val words = t.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
        var nCh = 0L
        var nTok = 0L
        val sb = new java.lang.StringBuilder
        words.foreach { w =>
          nCh += w.length
          val toks = encodeWord(w, ranks)
          nTok += toks.length
          if (sb.length > 0) sb.append('|')
          var i = 0
          while (i < toks.length) {
            if (i > 0) sb.append(' ')
            sb.append(toks(i))
            i += 1
          }
        }
        val hash = if (words.isEmpty) null else {
          md.reset()
          md.digest(sb.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        }
        Row(r.get(0), words.length.toLong, nCh, nTok, hash)
      }
    }(Encoders.row(outSchema))
      .toDF(idCol, "n_words", "n_chars", "n_tokens", "tokens_hash")
  }

  /** One word under greedy lowest-rank-first merging. */
  private[pipeline] def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms = Array.tabulate(w.length)(i => w.substring(i, i + 1))
    var go = syms.length >= 2
    while (go) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) go = false
      else {
        // ranks are unique, so `best` names exactly one pair; merge its
        // occurrences non-overlapping left to right (the training
        // rewrite order)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
        go = syms.length >= 2
      }
    }
    syms
  }

  /** Independent reference encoder for the spec: REPLAY the merge list
    * in rank order (merge all occurrences of pair 1 everywhere, then
    * pair 2, …). Equivalent to the greedy lowest-rank-first kernel
    * because a pair involving a merged symbol can only have been learned
    * AFTER the merge that created that symbol — so no lower-rank pair
    * can appear once its rank has been passed — but implemented with a
    * genuinely different control flow. */
  private[pipeline] def referenceEncode(w: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = w.toCharArray.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          nb += (l + r); i += 2
        } else { nb += syms(i); i += 1 }
      }
      syms = nb.result()
    }
    syms
  }

  /** Independent reference implementation for the spec: single-threaded
    * BPE over collected (word, count) pairs, same tie order. */
  private[pipeline] def referenceMerges(wordCounts: Map[String, Long],
      numMerges: Int): Seq[(Long, String, String, Long)] = {
    var state = wordCounts.toSeq.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        // count ALL adjacent (overlapping) pairs — "aaa" yields (a,a)
        // twice — matching the distributed position-explode counter; only
        // the REWRITE below merges non-overlapping left to right
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), pc) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, pc))
        state = state.map { case (syms, c) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              nb += (l + r); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), c)
        }
        rank += 1
      }
    }
    out.result()
  }
}
