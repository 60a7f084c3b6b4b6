package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.TextFunctions

/** SentencePiece-style unigram-LM tokenizer training (Kudo 2018, hard-EM
  * form) — the second half of the tokenizer story beside [[Bpe]]: seed a
  * substring inventory from corpus statistics, iteratively re-estimate
  * piece frequencies from each word's best segmentation, and prune the
  * lowest-mass pieces until the target vocabulary remains.
  *
  * Determinism, engine-portability, and the integer-cost device: piece
  * probabilities c/T are folded into INTEGER Viterbi costs
  * `cost = floor(1e9 · ln(T/c))` (ln over exact integer operands is
  * bit-identical across this repo's engines — the q17/q52 evidence), and
  * the DP minimizes the PACKED objective `128·Σcost + k` (k = piece
  * count, words capped at 127 chars), so "max probability, ties to fewer
  * pieces" is one integer min — reproducible across partitionings,
  * reruns, and replayable in SQL as a rolling-state recursive CTE (the
  * q210 oracle). Remaining ties (equal cost AND equal piece count) break
  * to the shortest candidate piece at each boundary.
  *
  * Scale shape (the [[Bpe.trainMerges]] profile): the corpus is read
  * ONCE into a (word, count) relation of vocabulary cardinality; seeds
  * come from one substring-explode aggregate over it; each EM round is
  * one map-side Viterbi pass over that compact relation with the piece
  * table BROADCAST, one piece-keyed hash aggregate, and one
  * table-sized collect. No round touches the corpus.
  *
  * Training is iterative-greedy → not SQL-expressible → q209 is
  * rows-only by the q36/q71 contract; UnigramSpec pins the trained
  * table against an independent single-threaded reimplementation
  * (two implementations, one answer) and the golden spec pins the
  * sf0.001 dump. The ENCODE, by contrast, is oracle-checked end-to-end
  * through q210's embedded-cost-table SQL twin.
  */
object Unigram {

  /** Max piece length — fixed so the SQL oracle's rolling Viterbi state
    * (one column per lookback position) matches by construction. */
  val MaxPieceLen = 4

  /** Train the piece inventory. @return (piece, smoothed count) in
    * (count DESC, piece ASC) order — singles always survive pruning so
    * every corpus word stays segmentable. */
  def trainPieces(docs: DataFrame, textCol: String, seedMulti: Int = 60,
      targetMulti: Int = 40, emIters: Int = 2): Seq[(String, Long)] =
    trainFull(docs, textCol, seedMulti, targetMulti, emIters)._1

  /** [[trainPieces]] plus the cost table the FINAL E-step segmented
    * under (costsOf the penultimate piece table) — the extra artifact
    * the q209 oracle needs: replaying the last E-step's Viterbi under
    * these costs and adding the +1 smoothing reproduces the trained
    * table's usage column exactly, which turns the training OUTPUT into
    * a SQL-checkable relation even though training itself is iterative. */
  def trainFull(docs: DataFrame, textCol: String, seedMulti: Int = 60,
      targetMulti: Int = 40, emIters: Int = 2)
      : (Seq[(String, Long)], Map[String, Long]) = {
    require(seedMulti >= targetMulti && targetMulti >= 1 && emIters >= 1,
      "trainPieces: need seedMulti >= targetMulti >= 1, emIters >= 1")
    val spark = docs.sparkSession
    // the one corpus-scale pass: word frequencies
    val words = docs
      .select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // seed inventory: every substring of length 1..MaxPieceLen, weighted
    // by word frequency (one explode over the vocabulary-sized relation)
    val subs = words
      .select(col("w"), col("cnt"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("cnt"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("w")) - col("i") + 1))).as("l"))
      .select(col("w").substr(col("i"), col("l")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      .localCheckpoint() // singles + top-multi both read it
    val singles = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = subs.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece"))
      .limit(seedMulti)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var table: Map[String, Long] = (singles ++ multis).toMap
    var lastCosts: Map[String, Long] = Map.empty

    var r = 0
    while (r < emIters) {
      // E-step: Viterbi-segment every word against the broadcast costs,
      // aggregate piece usage weighted by word count (map-side combine)
      lastCosts = costsOf(table)
      val bc = spark.sparkContext.broadcast(lastCosts)
      val usageSchema = StructType(Seq(
        StructField("piece", org.apache.spark.sql.types.StringType, false),
        StructField("u", LongType, false)))
      val usage = words.flatMap { row =>
        val w = row.getString(0)
        val cnt = row.getLong(1)
        viterbiSegment(w, bc.value).map(p => (p, cnt))
      }(Encoders.product[(String, Long)])
        .toDF("piece", "u")
        .groupBy(col("piece")).agg(sum(col("u")).as("u"))
        .collect().map(rr => rr.getString(0) -> rr.getLong(1)).toMap
      // M-step with +1 smoothing (unused singles must keep mass — they
      // are the segmentation fallback), then prune multis to the target
      val smoothed = table.keysIterator
        .map(p => p -> (usage.getOrElse(p, 0L) + 1L)).toMap
      val keptMultis = smoothed.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(targetMulti)
      table = (smoothed.iterator.filter(_._1.length == 1) ++ keptMultis).toMap
      r += 1
    }
    (table.toSeq.sortBy { case (p, c) => (-c, p) }, lastCosts)
  }

  /** Integer Viterbi costs from a (piece → count) table:
    * `floor(1e9 · ln(T/c))` — the exact derivation the q210 oracle
    * replays from the embedded (piece, cost) rows. */
  def costsOf(table: Map[String, Long]): Map[String, Long] = {
    val t = table.valuesIterator.sum
    require(t > 0, "costsOf: empty piece table")
    table.map { case (p, c) =>
      p -> math.floor(math.log(t.toDouble / c.toDouble) * 1e9).toLong
    }
  }

  /** One word's min-cost segmentation under the packed objective
    * `128·Σcost + k` (strict-improvement DP, lookback lengths ascending
    * — so full ties keep the shortest piece at each boundary). Loud on
    * unsegmentable input: a missing single-char piece is a trainer bug,
    * never a silent skip. */
  private[pipeline] def viterbiSegment(w: String,
      costs: Map[String, Long]): Array[String] = {
    val n = w.length
    require(n <= 127, s"viterbiSegment: word exceeds 127 chars: ${w.take(20)}…")
    val best = Array.fill(n + 1)(Long.MaxValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var pos = 1
    while (pos <= n) {
      var l = 1
      val lMax = math.min(MaxPieceLen, pos)
      while (l <= lMax) {
        if (best(pos - l) != Long.MaxValue) {
          val c = costs.getOrElse(w.substring(pos - l, pos), -1L)
          if (c >= 0L) {
            val cand = best(pos - l) + 128L * c + 1L
            if (cand < best(pos)) { best(pos) = cand; back(pos) = l }
          }
        }
        l += 1
      }
      pos += 1
    }
    if (best(n) == Long.MaxValue)
      throw new IllegalStateException(
        s"viterbiSegment: no segmentation for '$w' (single-char piece missing)")
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var p = n
    while (p > 0) { val l = back(p); out += w.substring(p - l, p); p -= l }
    out.reverseIterator.toArray
  }

  /** Unigram tokenizer APPLICATION — per doc word/char/token counts
    * under the trained integer costs (the [[Bpe.encode]] shape: one
    * broadcast, one mapPartitions kernel, no shuffle). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      costs: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(costs)
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField("n_words", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    in.mapPartitions { rows =>
      val cs = bc.value
      rows.map { r =>
        val t = if (r.isNullAt(1)) "" else r.getString(1)
        val words = TextFunctions.tokenizeScala(t)
        var nCh = 0L
        var nTok = 0L
        words.foreach { w =>
          nCh += w.length
          nTok += viterbiSegment(w, cs).length
        }
        Row(r.get(0), words.length.toLong, nCh, nTok)
      }
    }(Encoders.row(outSchema))
      .toDF(idCol, "n_words", "n_chars", "n_tokens")
  }

  /** Independent single-threaded reference trainer for the spec: same
    * seeding, EM, smoothing, pruning and tie rules, but plain Scala
    * collection passes and a memoized recursive segmenter — two
    * implementations, one answer (the [[Bpe.referenceMerges]] device). */
  private[pipeline] def referenceTrain(wordCounts: Map[String, Long],
      seedMulti: Int = 60, targetMulti: Int = 40,
      emIters: Int = 2): Seq[(String, Long)] = {
    val seedCounts = collection.mutable.Map.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 1 to MaxPieceLen
           if i + l <= w.length) {
        val p = w.substring(i, i + l)
        seedCounts(p) = seedCounts.getOrElse(p, 0L) + c
      }
    }
    val singles = seedCounts.filter(_._1.length == 1)
    val multis = seedCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var table: Map[String, Long] = (singles ++ multis).toMap
    (1 to emIters).foreach { _ =>
      val costs = costsOf(table)
      val usage = collection.mutable.Map.empty[String, Long]
      wordCounts.foreach { case (w, c) =>
        referenceSegment(w, costs).foreach { p =>
          usage(p) = usage.getOrElse(p, 0L) + c
        }
      }
      val smoothed = table.map { case (p, _) =>
        p -> (usage.getOrElse(p, 0L) + 1L) }
      val kept = smoothed.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(targetMulti)
      table = (smoothed.filter(_._1.length == 1) ++ kept).toMap
    }
    table.toSeq.sortBy { case (p, c) => (-c, p) }
  }

  /** Reference segmenter: memoized recursion over prefix ENDS with an
    * explicit piece list per state (the DP above is an iterative array
    * with a backtrace). The tie rule is part of the operator's
    * semantics — candidate lengths ascending, strict improvement only —
    * so both implementations share the prefix orientation; what differs
    * is the control flow and state representation. */
  private[pipeline] def referenceSegment(w: String,
      costs: Map[String, Long]): List[String] = {
    val memo = new Array[(Long, List[String])](w.length + 1)
    def go(end: Int): (Long, List[String]) = {
      if (end == 0) (0L, Nil)
      else if (memo(end) != null) memo(end)
      else {
        var bestC = Long.MaxValue
        var bestS: List[String] = Nil
        for (l <- 1 to math.min(MaxPieceLen, end)) {
          val p = w.substring(end - l, end)
          costs.get(p).foreach { c =>
            val (tc, ts) = go(end - l)
            if (tc != Long.MaxValue) {
              val cand = tc + 128L * c + 1L
              if (cand < bestC) { bestC = cand; bestS = p :: ts }
            }
          }
        }
        memo(end) = (bestC, bestS)
        memo(end)
      }
    }
    val (c, s) = go(w.length)
    require(c != Long.MaxValue, s"referenceSegment: no segmentation for '$w'")
    s.reverse
  }
}
