package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the scale device behind the
  * rank-based reports (quality-calibration deciles, norm-percentile
  * bands). A naive `row_number().over(Window.orderBy(...))` funnels the
  * whole relation through ONE task (Exchange SinglePartition + a
  * single-task sort) — fine at test scale, a wall at corpus scale.
  *
  * [[bucketedGlobalRank]] computes the SAME rank in two partitioned
  * levels:
  *
  *  1. a coarse histogram: map each row to one of `nBuckets` buckets by
  *     a monotone value→bucket function (min/max come from a 1-row
  *     broadcast aggregate). IEEE subtract/divide/multiply and floor
  *     are weakly monotone, so bucket order agrees with value order and
  *     equal values always share a bucket;
  *  2. per-bucket offsets: the bucket histogram is `nBuckets`-bounded;
  *     its exclusive prefix sum is computed window-free by a broadcast
  *     non-equi self-join (no Exchange SinglePartition over anything
  *     row-scale). Global rank = bucket offset + rank WITHIN the
  *     bucket, a `Window.partitionBy(bucket)` — parallelism ~nBuckets,
  *     per-task work ~n/nBuckets, the sort spills.
  *
  * The result is bit-identical to the single-task form for any
  * partitioning (ranks are a pure function of the (value, tie)
  * ordering), so oracle-hashed outputs are unaffected. Skew caveat: a
  * value that dominates the distribution concentrates its ties in one
  * bucket (ties cannot be split across tasks without breaking exact
  * rank); for measure-like values (surprisal, norms) occupancy stays
  * ~uniform.
  */
object Ranks {

  /** Appends `rankCol` = the 1-based global `row_number` ordered by
    * (`valueCol` asc, `tieCol` asc), without a corpus-cardinality
    * single-task sort. `valueCol` may be any numeric type (bucketing
    * casts to double — weakly monotone, ties preserved; the within-
    * bucket sort orders by the ORIGINAL column so no precision is
    * lost). Internal columns are dropped before returning. */
  def bucketedGlobalRank(df: DataFrame, valueCol: String, tieCol: String,
      rankCol: String = "_rn", nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"bucketedGlobalRank: nBuckets must be >= 1")
    val v = col(valueCol).cast("double")
    // 1-row side-input action (the BPE/Lod bounded-collect class): lo/hi
    // become literals, so the bucket map is pure map-side and the stats
    // subtree isn't recomputed under both the histogram and rank branches.
    // min/max exclude NaN explicitly (Spark's max treats NaN as greatest,
    // which would poison the bucket arithmetic for every row).
    val vFinite = when(v.isNotNull && !isnan(v), v)
    val statsRow = df.agg(min(vFinite).as("_lo"), max(vFinite).as("_hi")).head()
    val empty = statsRow.isNullAt(0)
    val (lo, hi) =
      if (empty) (0.0, 0.0) else (statsRow.getDouble(0), statsRow.getDouble(1))
    // Null/NaN rows get explicit buckets matching Spark's total order for
    // an ascending sort — nulls FIRST (bucket 0, asc_nulls_first inside
    // the bucket), NaN LAST (> +Infinity in Spark's ordering → last
    // bucket) — so the rank stays bit-identical to the single-task
    // Window.orderBy(asc) even on nullable or NaN-bearing metrics (a
    // null value used to fall through least(), land in the LAST bucket
    // and rank at the end; the early callers were all non-null so the gate
    // never saw it). Degeneracy, not a bug: an all-null/all-NaN column
    // collapses to hi <= lo and ranks serially in one bucket.
    val bucketed = df
      .withColumn("_b",
        if (hi <= lo) lit(0)
        else when(v.isNull, lit(0))
          .when(isnan(v), lit(nBuckets - 1))
          .otherwise(least(lit(nBuckets - 1L),
            floor((v - lit(lo)) / lit(hi - lo) * nBuckets)).cast("int")))
    val hist = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("_bcnt"))
    // Exclusive prefix sum over the nBuckets-bounded histogram — a
    // broadcast non-equi self-join instead of a global window, so the
    // device's plan carries no unpartitioned Window at all.
    val prior = hist.select(col("_b").as("_pb"), col("_bcnt").as("_pcnt"))
    val offsets = hist.join(broadcast(prior), col("_pb") < col("_b"), "left")
      .groupBy(col("_b"))
      .agg(sum(coalesce(col("_pcnt"), lit(0L))).as("_cum"))
    val wIn = Window.partitionBy(col("_b"))
      .orderBy(col(valueCol).asc_nulls_first, col(tieCol).asc)
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn(rankCol,
        col("_cum") + row_number().over(wIn).cast("long"))
      .drop("_b", "_cum")
  }

  /** Per-group exact rank without a per-group single-task sort — the
    * grouped form of [[bucketedGlobalRank]] for relations whose GROUPS
    * are few (a dimension: sources, splits, languages) but whose
    * per-group cardinality is corpus-scale (vocabulary, documents). A
    * bare `Window.partitionBy(group).orderBy(value)` funnels each
    * group through one task; here each group gets its own bucket
    * histogram, so parallelism is groups × nBuckets and per-task work
    * is group-size / nBuckets.
    *
    * Mechanism mirrors the global device with per-group lo/hi carried
    * by a BROADCAST stats join instead of driver literals (the group
    * relation is dimension-bounded by precondition — so are the
    * histogram and offset relations, groups × nBuckets rows). Ranks
    * are bit-identical to the single-task grouped window for any
    * partitioning: the bucket map is weakly monotone per group, nulls
    * rank first, NaN last, and the within-bucket sort orders by the
    * ORIGINAL column. */
  def bucketedGroupRank(df: DataFrame, valueCol: String, tieCol: String,
      groupCol: String, rankCol: String = "_rn",
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"bucketedGroupRank: nBuckets must be >= 1")
    val v = col(valueCol).cast("double")
    val vFinite = when(v.isNotNull && !isnan(v), v)
    val stats = df.groupBy(col(groupCol))
      .agg(min(vFinite).as("_lo"), max(vFinite).as("_hi"))
    val bucketed = df.join(broadcast(stats), Seq(groupCol))
      .withColumn("_b",
        when(col("_hi").isNull || col("_hi") <= col("_lo"), lit(0))
          .when(v.isNull, lit(0))
          .when(isnan(v), lit(nBuckets - 1))
          .otherwise(least(lit(nBuckets - 1L),
            floor((v - col("_lo")) / (col("_hi") - col("_lo")) * nBuckets))
            .cast("int")))
    val hist = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(count(lit(1)).as("_bcnt"))
    // Exclusive prefix sum over the histogram. Unlike the GLOBAL form
    // (whose histogram window would be unpartitioned — hence its
    // broadcast self-join), the grouped histogram admits a PARTITIONED
    // window: the relation is dimension-bounded (groups × nBuckets
    // rows, corpus-independent), so a per-group running sum is
    // scale-safe and strictly fewer plan nodes than the join form
    // (the broadcast self-join + re-aggregate it replaces).
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("_cum", coalesce(sum(col("_bcnt")).over(wCum), lit(0L)))
      .select(col(groupCol), col("_b"), col("_cum"))
    val wIn = Window.partitionBy(col(groupCol), col("_b"))
      .orderBy(col(valueCol).asc_nulls_first, col(tieCol).asc)
    bucketed.join(broadcast(offsets), Seq(groupCol, "_b"))
      .withColumn(rankCol,
        col("_cum") + row_number().over(wIn).cast("long"))
      .drop("_b", "_cum", "_lo", "_hi")
  }
}
