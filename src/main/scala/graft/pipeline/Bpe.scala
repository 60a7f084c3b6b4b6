package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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
    *         pair_count) in learning order.
    *
    * Scale bound: ONE driver round-trip (a 1-row argmax collect over the
    * vocabulary-sized pair relation) per merge — exact sequential BPE
    * is inherently this loop. Fine at numMerges ≲ 10³; a production
    * tokenizer's ~50k merges means ~50k sequential driver rounds, each
    * re-aggregating pair counts. [[trainMergesBatched]] is the scale
    * path: it accepts a top-k batch of mutually non-interacting pairs
    * per round, cutting driver rounds by ~batchK at the cost of a
    * slightly different (still deterministic) merge order. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "trainMerges: numMerges must be >= 1")
    val spark = docs.sparkSession
    // symbol state: word → current symbol sequence (starts as characters)
    mergeLoop(wordCountsOf(docs, textCol)
        .select(split(col("w"), "").as("syms"), col("cnt"))
        .localCheckpoint(),
      numMerges)(spark)
  }

  /** Byte-level BPE training — [[trainMerges]] with the UTF-8 BYTES of
    * each word as the base alphabet (symbols are lowercase hex pairs,
    * merged symbols their concatenation): the GPT-2-style variant that
    * makes the tokenizer TOTAL over arbitrary Unicode — an unseen
    * codepoint is just unseen bytes, each already a symbol, so nothing
    * can ever be out-of-alphabet (char BPE passes unseen CHARS through,
    * but its learned merges never fire on them; WordPiece UNKs the
    * whole word). Merge loop, determinism contract and scale shape are
    * [[trainMerges]]'s verbatim — only the initial symbolization
    * differs. */
  def trainMergesBytes(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, "trainMergesBytes: numMerges must be >= 1")
    val spark = docs.sparkSession
    mergeLoop(wordCountsOf(docs, textCol)
        .select(hexSymsCol(col("w")).as("syms"), col("cnt"))
        .localCheckpoint(),
      numMerges)(spark)
  }

  /** The one corpus-scale pass shared by both trainers: word
    * frequencies via the script-aware shared tokenizer. */
  private def wordCountsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** A word's UTF-8 bytes as lowercase-hex pair symbols, Column form
    * (vocabulary-sized relation — the regex is one pass per WORD, not
    * per corpus row). */
  private def hexSymsCol(w: Column): Column =
    regexp_extract_all(
      lower(hex(org.apache.spark.sql.functions.encode(w, "UTF-8"))),
      lit("[0-9a-f]{2}"), lit(0))

  /** All 256 byte symbols, interned once — a per-byte format call in
    * the encode kernel was the whole-sweep slowest query (String.format
    * is locale-aware and allocation-heavy; millions of calls per
    * partition), and the table also makes every emitted symbol a
    * SHARED reference. */
  private val hexTable: Array[String] =
    Array.tabulate(256)(i => f"$i%02x")

  /** Kernel twin of [[hexSymsCol]] (the tokenizeScala discipline). */
  private[pipeline] def hexSyms(w: String): Array[String] = {
    val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Array.tabulate(b.length)(i => hexTable(b(i) & 0xff))
  }

  /** The sequential greedy merge loop over a (syms, cnt) relation —
    * the [[trainMerges]] body, shared with [[trainMergesBytes]]. */
  private def mergeLoop(init: DataFrame, numMerges: Int)(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    var state = init
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

  /** Batched BPE training — the 50k-merge scale path for
    * [[trainMerges]]: each round collects the top `batchK` pairs by the
    * same (count DESC, left, right) total order and greedily accepts
    * the prefix-priority subset that is mutually NON-INTERACTING — no
    * accepted pair's left/right/merged symbol equals any symbol of an
    * earlier-accepted pair — then applies all accepted merges in one
    * rewrite. Disjoint pairs commute (merging one cannot create,
    * destroy, or re-count occurrences of another), so the batch rewrite
    * equals applying the accepted merges sequentially; driver rounds
    * drop by ~|batch| per round.
    *
    * Deviation from exact sequential BPE, by design: a merge can CREATE
    * new pairs (merging (x,y) under "w x y z" births (w,xy) and (xy,z))
    * whose counts may exceed a later batch member's — exact sequential
    * BPE would rank those first. Batching trades that reordering for
    * ~batchK× fewer driver rounds (the BatchBPE trade); `batchK = 1`
    * reproduces [[trainMerges]] exactly. Output is deterministic across
    * partitionings and reruns; [[referenceMergesBatched]] pins the
    * semantics with an independent single-threaded implementation. */
  def trainMergesBatched(docs: DataFrame, textCol: String, numMerges: Int,
      batchK: Int = 16): DataFrame = {
    require(numMerges >= 1, "trainMergesBatched: numMerges must be >= 1")
    require(batchK >= 1, "trainMergesBatched: batchK must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    val words = docs
      .select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var state = words
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
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
        .limit(batchK).collect()
        .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
      val accepted = selectNonInteracting(top,
        (numMerges - rank + 1).toInt)
      if (accepted.isEmpty) exhausted = true
      else {
        accepted.foreach { case (l, r, pc) =>
          merges += ((rank, l, r, pc)); rank += 1
        }
        // one rewrite applies every accepted merge: the fold's tail
        // check chains one `when` per accepted pair — disjoint symbols
        // make the branches mutually exclusive, so left-to-right
        // non-overlapping semantics per pair are preserved
        val merged = aggregate(
          col("syms"),
          array(lit(null).cast("string")),
          (acc, s) => accepted.foldLeft(when(lit(false), acc)) {
            case (w, (l, r, _)) => w.when(
              element_at(acc, -1) === lit(l) && s === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          }.otherwise(concat(acc, array(s))),
          acc => slice(acc, lit(2), size(acc) - 1))
        state = state.select(merged.as("syms"), col("cnt")).localCheckpoint()
      }
    }
    merges.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Greedy prefix-priority non-interacting subset of candidate pairs
    * (already in (count DESC, left, right) order): accept a pair iff
    * none of its left / right / concatenated symbol strings collides
    * with any string of an earlier-accepted pair (the concatenation
    * check also blocks the "ab"+"c" vs "a"+"bc" string-collision edge),
    * up to `limit` acceptances. Shared by the distributed and reference
    * batched trainers so the selection rule cannot drift. */
  private[pipeline] def selectNonInteracting(
      candidates: Seq[(String, String, Long)],
      limit: Int): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[String]
    val out = Seq.newBuilder[(String, String, Long)]
    var n = 0
    candidates.foreach { case cand @ (l, r, _) =>
      if (n < limit && !used(l) && !used(r) && !used(l + r)) {
        out += cand
        used += l; used += r; used += (l + r)
        n += 1
      }
    }
    out.result()
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
        val words = TextFunctions.tokenizeScala(t)
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

  /** Byte-level BPE encode — [[encode]] over [[trainMergesBytes]]
    * output: per word the UTF-8 bytes become hex-pair symbols, the same
    * greedy lowest-rank-first merging applies, and the emitted pieces
    * are hex strings (a piece need not decode alone — splitting a
    * multi-byte codepoint across pieces is legal byte-level behavior;
    * concatenating a word's pieces always reproduces its bytes, the
    * TOTALITY guarantee ByteBpeSpec pins). Emits per doc
    * (n_words, n_bytes, n_tokens, tokens_hash) — the byte-domain twin
    * of [[encode]]'s char-domain counters; same broadcast + one
    * map-side pass, nothing but counters and a hash leaves the scan. */
  def encodeBytes(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val rankOf: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    require(rankOf.size == merges.size, "encodeBytes: duplicate merge pair")
    val bc = spark.sparkContext.broadcast(rankOf)
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("n_words", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("tokens_hash", StringType, nullable = true)))
    in.mapPartitions { rows =>
      val ranks = bc.value
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val t = if (r.isNullAt(1)) "" else r.getString(1)
        val words = TextFunctions.tokenizeScala(t)
        var nBy = 0L
        var nTok = 0L
        val sb = new java.lang.StringBuilder
        words.foreach { w =>
          val syms = hexSyms(w)
          nBy += syms.length
          val toks = mergeGreedy(syms, ranks)
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
        Row(r.get(0), words.length.toLong, nBy, nTok, hash)
      }
    }(Encoders.row(outSchema))
      .toDF(idCol, "n_words", "n_bytes", "n_tokens", "tokens_hash")
  }

  /** One word under greedy lowest-rank-first merging. */
  private[pipeline] def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Array[String] =
    mergeGreedy(Array.tabulate(w.length)(i => w.substring(i, i + 1)), ranks)

  /** Greedy lowest-rank-first merging over an initial symbol sequence
    * (char symbols for [[encodeWord]], hex byte symbols for
    * [[encodeBytes]]). */
  private[pipeline] def mergeGreedy(syms0: Array[String],
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms = syms0
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
      merges: Seq[(String, String)]): Vector[String] =
    referenceEncodeSyms(w.toCharArray.map(_.toString).toVector, merges)

  private[pipeline] def referenceEncodeSyms(syms0: Vector[String],
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = syms0
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
      numMerges: Int): Seq[(Long, String, String, Long)] =
    referenceMergesSyms(wordCounts.toSeq.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c) }, numMerges)

  /** [[referenceMerges]] over pre-symbolized sequences — the byte-level
    * spec passes [[hexSyms]] output here. */
  private[pipeline] def referenceMergesSyms(
      state0: Seq[(Vector[String], Long)],
      numMerges: Int): Seq[(Long, String, String, Long)] = {
    var state = state0
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

  /** Independent single-threaded reference for [[trainMergesBatched]]:
    * same candidate order, same [[selectNonInteracting]] rule, but the
    * counting and rewrite run as plain Scala collection passes — two
    * implementations, one answer (the [[referenceMerges]] device). */
  private[pipeline] def referenceMergesBatched(wordCounts: Map[String, Long],
      numMerges: Int, batchK: Int): Seq[(Long, String, String, Long)] = {
    var state = wordCounts.toSeq.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
          i += 1
        }
      }
      val top = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
        .take(batchK).map { case ((a, b), c) => (a, b, c) }
      val accepted = selectNonInteracting(top, (numMerges - rank + 1).toInt)
      if (accepted.isEmpty) done = true
      else {
        accepted.foreach { case (l, r, pc) =>
          out += ((rank, l, r, pc)); rank += 1
        }
        val table = accepted.map { case (l, r, _) => (l, r) -> (l + r) }.toMap
        state = state.map { case (syms, c) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && table.contains((syms(i), syms(i + 1)))) {
              nb += table((syms(i), syms(i + 1))); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), c)
        }
      }
    }
    out.result()
  }
}
