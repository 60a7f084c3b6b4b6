package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (north-star extension) — the
  * hashed-n-gram importance-weighting step of a pretraining data
  * pipeline (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every document in a raw pool by how
  * much more likely its hashed unigram+bigram features are under a
  * target-domain bag-of-grams model than under the raw pool's own model,
  * then keep the highest-weight documents.
  *
  * The published method draws Gumbel noise for the resampling step; the
  * deterministic top-k-by-weight variant implemented here is the
  * paper's heldout-selection ablation, and the one a reproducible
  * pipeline wants (a salted-hash Gumbel can be layered on the emitted
  * weight column without touching this operator).
  *
  * Cross-engine discipline: grams hash through the md5-15-hex
  * fingerprint device (`TextFunctions.fingerprint`, oracle mirror
  * `('0x'||substr(md5(g),1,15))::BIGINT`); per-bucket log-ratios are
  * computed once in the double domain (`ln` agrees bit-for-bit across
  * engines on identical input — the q17/q52/q53 device) and weights are
  * summed as DECIMAL, never as double (double addition is
  * order-dependent under partitioning).
  *
  * Scale shape (the 100 TB story): ONE corpus scan — text explodes to
  * grams and immediately collapses to the compact (doc, bucket, count)
  * relation (at most `buckets` rows per document) with map-side partial
  * counting; the bucket model (`buckets` rows) and the 1-row totals
  * aggregate derive FROM that relation and broadcast back, so the text
  * itself never crosses a shuffle and nothing corpus-sized is ever
  * collected to the driver. The final top-k is a TakeOrdered, not a
  * global sort.
  */
object Dsir {

  /** The compact hashed-gram feature relation: one row per
    * (document, bucket) with the document's count of unigrams+bigrams
    * hashing into that bucket, plus the boolean target flag and any
    * `passthrough` columns (must be functionally dependent on `idCol` —
    * they ride the aggregate key so the result needs no join back to
    * the corpus).
    *
    * Gram generation is the positions-explode device (interpreted
    * `transform` lambdas cost 20× here — see q34/q66): one explode over
    * `1..2n-1` where positions `1..n` emit unigrams and `n+1..2n-1`
    * emit space-joined bigrams, fused by whole-stage codegen.
    */
  def hashedGramCounts(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int = 256, salt: String = "dsir",
      passthrough: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, "hashedGramCounts: buckets must be >= 2")
    val carry = passthrough.map(col)
    val toks = docs.select(Seq(col(idCol), targetFlag.as("_tgt"),
      TextFunctions.tokenize(col(textCol)).as("_t")) ++ carry: _*)
    val n = size(col("_t"))
    val grams = toks
      .select(Seq(col(idCol), col("_tgt"), col("_t"),
        // null text tokenizes to null → size is null → empty positions;
        // sequence(1, 0) would DESCEND, hence the explicit guard
        explode(when(n >= 1, sequence(lit(1), n * 2 - 1))
          .otherwise(array().cast("array<int>"))).as("_i")) ++ carry: _*)
      .select(Seq(col(idCol), col("_tgt"),
        when(col("_i") <= n, element_at(col("_t"), col("_i")))
          .otherwise(concat(
            element_at(col("_t"), col("_i") - n), lit(" "),
            element_at(col("_t"), col("_i") - n + 1))).as("_gram")) ++ carry: _*)
    grams
      .select(Seq(col(idCol), col("_tgt"),
        pmod(TextFunctions.fingerprint(
          concat(lit(salt + ":"), col("_gram"))), lit(buckets.toLong))
          .as("bucket")) ++ carry: _*)
      .groupBy(col(idCol) +: col("_tgt") +: col("bucket") +: carry: _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Per-document DSIR importance weights for the NON-target (raw-pool)
    * documents: `logw = Σ_b c_db · (ln p_b − ln q_b)` where `p` is the
    * add-one-smoothed target bucket distribution and `q` the raw pool's,
    * both estimated from the same single-scan feature relation.
    * Returns `(idCol, passthrough..., n_grams, logw)` with `logw`
    * rounded to 6 decimals in the decimal domain and emitted as DOUBLE.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int = 256, salt: String = "dsir",
      passthrough: Seq[String] = Nil): DataFrame = {
    val db = hashedGramCounts(docs, idCol, textCol, targetFlag, buckets,
      salt, passthrough)
    // consumed twice (model estimation + scoring probe): materialize so
    // the corpus scan + explode runs once, not per consumer (the q52/q53
    // shared-tf lesson — AQE does not reuse the exchange here)
    val feats = db.localCheckpoint(true)
    val model = feats.groupBy(col("bucket")).agg(
      sum(when(col("_tgt"), col("c")).otherwise(0L)).as("ct"),
      sum(when(!col("_tgt"), col("c")).otherwise(0L)).as("cs"))
    val totals = model.agg(sum(col("ct")).as("t_tot"), sum(col("cs")).as("s_tot"))
    val m = lit(buckets.toLong)
    val logRatio = model.crossJoin(broadcast(totals))
      .select(col("bucket"),
        // both divisions double-first: Spark "/" on longs is integer
        // division, and the oracle's BIGINT/BIGINT is true division
        (log((col("ct") + 1).cast("double") / (col("t_tot") + m).cast("double")) -
          log((col("cs") + 1).cast("double") / (col("s_tot") + m).cast("double")))
          .cast("decimal(18,10)").as("_lr"))
    val carry = passthrough.map(col)
    feats.filter(!col("_tgt"))
      .join(broadcast(logRatio), "bucket")
      .groupBy(col(idCol) +: carry: _*)
      .agg(sum(col("c")).as("n_grams"),
        // decimal(18,10) × decimal(10,0) is exact; decimal addition is
        // partition-order-independent (the q53 surprisal device)
        sum(col("_lr") * col("c").cast("decimal(10,0)")).as("_sum"))
      .select(col(idCol) +: carry :+ col("n_grams") :+
        round(col("_sum"), 6).cast("double").as("logw"): _*)
  }

  /** Deterministic DSIR selection: the `k` raw-pool documents most
    * target-like by importance weight (ties broken by `idCol` — the
    * whole ranking is exact-decimal-backed, so the cut is stable under
    * any partitioning). */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, k: Int, buckets: Int = 256,
      passthrough: Seq[String] = Nil): DataFrame = {
    require(k >= 1, "selectTopK: k must be >= 1")
    importanceWeights(docs, idCol, textCol, targetFlag, buckets,
      passthrough = passthrough)
      .orderBy(col("logw").desc, col(idCol).asc)
      .limit(k)
  }
}
