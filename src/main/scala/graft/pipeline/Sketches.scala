package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic, mergeable, ORACLE-CHECKABLE sketches — the q142
  * histogram-percentile discipline applied to the other two sketch
  * primitives a 100 TB pipeline leans on: count-min (frequency
  * estimates under fixed memory) and HyperLogLog (distinct counts
  * under fixed memory).
  *
  * The usual objection to hashing sketches in a correctness gate is
  * merge-order nondeterminism — Spark's own `approx_count_distinct` /
  * GK percentiles are bit-unstable across partitionings. These two are
  * NOT: every register is an order-independent integer aggregate (sums
  * for CMS counters, max for HLL registers) over engine-portable
  * md5-derived hashes, so the sketch state — and therefore the
  * estimate — is bit-identical for any partitioning, any cluster
  * size, and across engines; DuckDB twins reproduce them exactly.
  *
  * Scale shape: both sketches are one corpus pass into a
  * registers-bounded relation (d×w counters / m registers per group),
  * mergeable by construction (sum/max), broadcast back for estimate
  * lookups. Nothing row-scale crosses a single task.
  */
object Sketches {

  /** The repo's engine-portable 60-bit integer hash (md5 hex prefix →
    * int64; the q28 fingerprint device) with a salt. */
  private def hash60(salt: String, c: Column): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")

  /** Count-min sketch over corpus token frequencies, reported for the
    * exact top-`k` tokens (the q84 Misra-Gries candidate device picks
    * them, so the comparison needs no vocab-cardinality rank): `depth`
    * salted hash rows × `width` counter buckets, counter = SUM of
    * occurrences hashing to it (order-independent), estimate = MIN over
    * rows of the token's counters. CMS guarantees est >= exact (only
    * collisions inflate, never deflate) with overestimate bounded by
    * ~N/width per row — emitting exact AND estimate side by side makes
    * the bound auditable in the output itself.
    *
    * Counter build aggregates the VOCAB-level counts (groupBy token
    * first), not raw occurrences — `depth`× fewer shuffled rows for an
    * identical sketch (counters are sums of sums). */
  /** The `depth` (row, bucket) pairs of an item — one struct per salted
    * hash row. Shared by the batch counter build, the top-k probe, and
    * the streaming twin's batch-side hash prep. */
  private[graft] def cmsRows(itemCol: String, depth: Int,
      width: Int): Seq[Column] =
    (0 until depth).map { r =>
      struct(lit(r.toLong).as("r"),
        (hash60(s"cms$r:", col(itemCol)) % width).as("bucket"))
    }

  /** The d×w counter matrix from a weighted item relation — counters
    * are sums of sums, so feeding vocabulary-level counts is identical
    * to (and `depth`× cheaper to shuffle than) per-occurrence rows. */
  def cmsCounters(weighted: DataFrame, itemCol: String, weightCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    weighted
      .select(explode(array(cmsRows(itemCol, depth, width): _*)).as("rb"),
        col(weightCol))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum(col(weightCol)).as("counter"))

  /** Per-occurrence hashed rows for the STREAMING twin
    * ([[graft.streaming.CmsStream]]): each item row becomes `depth`
    * (r, bucket, w) updates, computed batch-side per micro-batch so the
    * stateful operator does pure integer adds. */
  def cmsHashed(items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    items
      .select(explode(array(cmsRows(itemCol, depth, width): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"),
        lit(1L).as("w"))

  /** Join-cardinality estimation by CMS inner product (the AGMS/sketch
    * device query planners use when neither side's key histogram fits
    * anywhere): |A ⋈ B| = Σ_k a(k)·b(k), estimated per sketch row as
    * the bucket-wise counter dot product and reported as the MIN over
    * rows — collisions only INFLATE a dot product, so like the point
    * estimate this is a one-sided overestimate, and emitting the exact
    * size beside it makes the error auditable in the output itself.
    *
    * Exact side: key-histogram join (groupBy each side, join on key,
    * Σ product) — the join's size without materializing the join.
    * Sketch side: two d×w counter matrices ([[cmsCounters]], the
    * engine-portable salted-md5 rows), joined on (row, bucket) —
    * absent buckets contribute 0, so inner join is exact. Both sides'
    * registers are int64 behind loud overflow guards. One row out:
    * (exact_pairs, cms_estimate, over_ratio). */
  def cmsJoinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1,
      "cmsJoinCardinality: depth and width must be >= 1")
    val la = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
      .localCheckpoint(true) // feeds the exact join AND the sketch
    val rb = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(true)
    def guardedMul(a: Column, b: Column, what: String): Column =
      when(assert_true(a <= lit(3037000498L) && b <= lit(3037000498L),
        lit(s"cmsJoinCardinality: $what product exceeds int64 — " +
          "sample or pre-aggregate before estimating")).isNull, a * b)
    // post-sum guard (the giniConcentration maxterm×n device): each
    // product fits int64, but Σ over n of them can still wrap silently
    // under Spark's non-ANSI sum where DuckDB's HUGEINT raises
    def guardedSum(p: Column, what: String): Column = {
      val s = struct(sum(p).as("s"), max(p).as("mx"),
        count(p).as("n"))
      val checked = when(assert_true(
        s.getField("mx").isNull ||
          s.getField("mx") <= lit(Long.MaxValue) /
            greatest(s.getField("n"), lit(1L)),
        lit(s"cmsJoinCardinality: $what sum exceeds int64 — sample or " +
          "pre-aggregate before estimating")).isNull,
        coalesce(s.getField("s"), lit(0L)))
      checked
    }
    val exact = la.join(rb, Seq("k"))
      .select(guardedMul(col("ca"), col("cb"), "key-count").as("p"))
      .agg(guardedSum(col("p"), "pair").as("exact_pairs"))
    val cl = cmsCounters(la, "k", "ca", depth, width)
    val cr = cmsCounters(rb, "k", "cb", depth, width)
      .withColumnRenamed("counter", "counter_b")
    val est = cl.join(cr, Seq("r", "bucket"))
      .select(col("r"),
        guardedMul(col("counter"), col("counter_b"), "counter").as("p"))
      .groupBy(col("r")).agg(guardedSum(col("p"), "dot").as("dot"))
      .agg(min(col("dot")).as("cms_estimate"))
    exact.crossJoin(est)
      .select(col("exact_pairs"), col("cms_estimate"),
        when(col("exact_pairs") === 0L, lit(null).cast("double"))
          .otherwise(round((col("cms_estimate").cast("double") /
              col("exact_pairs").cast("double")).cast("decimal(28,10)"), 6)
            .cast("double")).as("over_ratio"))
  }

  def cmsTopK(docs: DataFrame, textCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(k >= 1 && depth >= 1 && width >= 1,
      "cmsTopK: k, depth, width must be >= 1")
    val tokCounts = docs
      .select(explode(TextFunctions.tokenize(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // vocab-bounded; feeds counters AND top-k
    val rows = cmsRows("token", depth, width)
    val counters = cmsCounters(tokCounts, "token", "cnt", depth, width)
    // top-k rank via the bucketed global-rank device (tokCounts is
    // vocab-cardinality — a bare Window.orderBy would single-task it;
    // the Ranks single-task-sort invariant, see Ranks.bucketedGlobalRank)
    val top = Ranks.bucketedGlobalRank(
        tokCounts.withColumn("_negcnt", -col("cnt")),
        "_negcnt", "token", "rank")
      .filter(col("rank") <= k)
      .select(col("rank"), col("token"), col("cnt").as("n_exact"))
    val probes = top.select(col("rank"), col("token"), col("n_exact"),
        explode(array(rows: _*)).as("rb"))
      .select(col("rank"), col("token"), col("n_exact"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col("rank"), col("token"), col("n_exact"))
      .agg(min(col("counter")).as("n_cms"))
  }

  /** HyperLogLog distinct-count sketch per group (`m` registers,
    * Flajolet et al. 2007): bucket and rank-of-first-one come from two
    * independently salted 60-bit hashes; register = MAX rho per bucket
    * (order-independent), rho clamped at 40 so the exact-integer
    * estimator below cannot overflow (rho > 40 needs ~2^40 distinct
    * values per bucket — far beyond any target scale).
    *
    * The harmonic-mean estimator is computed EXACTLY in integers before
    * the final float ops: with R = max register,
    * S = Σ_j 2^(R − M_j) (absent registers contribute 2^R), the raw
    * estimate α·m²·2^R / S divides two exact int64s — one IEEE divide,
    * bit-identical cross-engine (double sums of 2^−M_j would be
    * order-dependent). Small-range branch: m·ln(m/zeros) when
    * raw ≤ 2.5m and zeros > 0 (ln is bit-stable on identical input —
    * the q17/q52 device); both regimes are exercised across the test
    * SFs. Output keeps `zeros` and `r_max` so the regime is auditable. */
  /** K-minimum-values sketch overlap (Beyer et al., SIGMOD 2007) — the
    * set-INTERSECTION estimator the HLL family cannot provide: per
    * group keep the K smallest 60-bit item hashes (a min-K of a set is
    * order-independent, so like the other sketches here it is
    * bit-stable for any partitioning and fully oracle-checkable); for
    * every group pair, the merged K-min set estimates
    * |A ∪ B| = (K−1)·2^60 / h_(K) and |A ∩ B| = (c/K)·|A ∪ B| where c
    * counts sketch members present in BOTH sides among the union's
    * K-min — the sketch-based decontamination/overlap primitive (q78
    * computes exact overlap from verified near-dup pairs; this
    * estimates raw shingle overlap from K longs per source).
    *
    * Exact-when-small: a pair whose merged sketch holds fewer than K
    * distinct hashes is COMPLETE (both sides kept everything), so union
    * and intersection are exact counts — the standard KMV small-set
    * rule, mirrored in the oracle's CASE.
    *
    * Scale shape: the per-group min-K runs as a group-partitioned
    * window (parallelism = #groups, in-partition sort spills — the q61
    * tokenPercentiles precedent); everything after is K·#groups-bounded
    * (pairs, merges, ranks — broadcast-size relations). The exact
    * `n_inter_exact` column exists for the report only — a production
    * deploy runs the sketch side alone. Float discipline: h_(K) is a
    * ≤2^60 int64 whose double conversion is IEEE-correctly-rounded in
    * both engines; 255·2^60 is exactly representable; one divide + one
    * multiply, mirrored op-for-op, rounded once in the decimal domain. */
  def kmvOverlap(items: DataFrame, groupCol: String, itemCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "kmvOverlap: k must be >= 2")
    val sh = items.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(true) // feeds the sketch AND the exact report
    val hashes = sh.select(col("g"), hash60("kmv:", col("item")).as("h"))
      .distinct()
    val wg = Window.partitionBy(col("g")).orderBy(col("h").asc)
    val kmv = hashes.withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= k)
      .select(col("g"), col("h"))
      .localCheckpoint(true) // K·#groups-bounded; probed per pair
    val groups = kmv.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(broadcast(groups.select(col("g").as("gb"))))
      .filter(col("ga") < col("gb"))
    val sides = pairs
      .join(broadcast(kmv.select(col("g").as("ga"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))), Seq("ga"))
      .unionByName(pairs
        .join(broadcast(kmv.select(col("g").as("gb"), col("h"),
          lit(0L).as("in_a"), lit(1L).as("in_b"))), Seq("gb"))
        .select(col("ga"), col("gb"), col("h"), col("in_a"), col("in_b")))
    val merged = sides.groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wp = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h").asc)
    val ranked = merged.withColumn("rn", row_number().over(wp))
    val perPair = ranked.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_merged"),
        max(when(col("rn") === k, col("h"))).as("h_k"),
        sum(when(col("rn") <= k && col("in_a") === 1 && col("in_b") === 1,
          1L).otherwise(0L)).as("common_in_k"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("common_all"))
    val unionEst = when(col("n_merged") < k, col("n_merged").cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(1.152921504606846976e18)) /
        col("h_k").cast("double"))
    val interEst = when(col("n_merged") < k, col("common_all").cast("double"))
      .otherwise((col("common_in_k").cast("double") / lit(k.toDouble)) *
        ((lit((k - 1).toDouble) * lit(1.152921504606846976e18)) /
          col("h_k").cast("double")))
    val exact = sh.select(col("g").as("ga"), col("item"))
      .join(sh.select(col("g").as("gb"), col("item")), Seq("item"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_inter_exact"))
    perPair
      .join(exact, Seq("ga", "gb"), "left")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("common_in_k"),
        round(unionEst.cast("decimal(28,10)"), 2).cast("double")
          .as("union_est"),
        round(interEst.cast("decimal(28,10)"), 2).cast("double")
          .as("inter_est"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"))
  }

  /** The HLL hash prep, shared by the batch estimator and the streaming
    * twin ([[graft.streaming.HllStream]]): (group, bucket, rho) rows
    * from two independently salted 60-bit hashes, rho clamped at 40.
    * Computing this batch-side per micro-batch and keeping only the
    * register MAX in state is what makes the streaming face carry m
    * longs per group instead of the item set. */
  def hllHashed(items: DataFrame, groupCol: String, itemCol: String,
      m: Int = 64): DataFrame =
    items.select(col(groupCol),
      (hash60("hllb:", col(itemCol)) % m).as("bucket"),
      least(lit(40L),
        lit(61L) - length(bin(hash60("hllr:", col(itemCol)))).cast("long"))
        .as("rho"))

  def hllDistinct(items: DataFrame, groupCol: String, itemCol: String,
      m: Int = 64, alphaNum: Double = 0.709): DataFrame = {
    require(m >= 16, "hllDistinct: m must be >= 16")
    val it = items.select(col(groupCol), col(itemCol).as("item"))
    val hashed = hllHashed(items, groupCol, itemCol, m)
    val regs = hashed.groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("reg"))
    val exact = it.groupBy(col(groupCol))
      .agg(count_distinct(col("item")).as("n_exact"))
    val perGroup = regs.groupBy(col(groupCol))
      .agg(max(col("reg")).as("r_max"), count(lit(1)).as("present"))
    val s = regs.join(broadcast(perGroup), Seq(groupCol))
      .groupBy(col(groupCol), col("r_max"), col("present"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max - reg AS INT))"))
        .as("s_present"))
      .select(col(groupCol), col("r_max"),
        (lit(m.toLong) - col("present")).as("zeros"),
        (col("s_present") +
          (lit(m.toLong) - col("present")) *
            expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT))")).as("s"))
    val raw = (lit(alphaNum) * lit(m.toDouble) * lit(m.toDouble)) *
      expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT))").cast("double") /
      col("s").cast("double")
    val est = when(raw <= lit(2.5 * m) && col("zeros") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
      .otherwise(raw)
    s.join(exact, Seq(groupCol))
      .select(col(groupCol), col("n_exact"), col("zeros"), col("r_max"),
        round(est.cast("decimal(28,10)"), 2).cast("double").as("est"))
  }
}
