package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximizing both dimensions): the
  * multi-criteria selection operator — "no other row is ≥ in both
  * dimensions and > in one" — behind quality-vs-cost curation choices
  * (keep documents no other document beats on BOTH token count and
  * vocabulary; pick models no other beats on BOTH accuracy and speed).
  *
  * The classic sort-scan device, relationally: a row p survives iff
  *  (a) its y equals the MAX y at its own x (a same-x row with higher
  *      y dominates p), and
  *  (b) no strictly-higher x carries y ≥ p's (checked against the
  *      strict-prefix running max over the per-x maxima).
  * Coincident duplicates (same x AND y) all survive — neither
  * dominates the other; that edge is spec-pinned.
  *
  * Scale shape: one corpus aggregate collapses rows to the per-x
  * maxima — a VALUE-cardinality relation (distinct x), which is
  * histogram-small by the same precondition as every binned device
  * here — so the single running-max window orders a bounded relation,
  * never the corpus; the verdict joins back on x. The oracle checks
  * dominance by a quadratic NOT EXISTS — a completely different
  * mechanism. */
object Skyline {

  /** Rows of `df` on the maximizing Pareto frontier of (xCol, yCol).
    * Output: (idCol, xCol, yCol) for every surviving row.
    *
    * `maxDistinctX` enforces the precondition LOUDLY (the
    * isotonicCalibration maxBins pattern): the per-x maxima relation is
    * both broadcast and run through an unpartitioned running-max
    * window, so a value-continuous x (e.g. a raw score) must be
    * quantized BEFORE calling — a silent high-cardinality x would
    * single-task the window and blow the broadcast. */
  def frontier2d(df: DataFrame, idCol: String, xCol: String,
      yCol: String, maxDistinctX: Long = 1000000L): DataFrame = {
    val pts = df.select(col(idCol), col(xCol).cast("long").as("_x"),
      col(yCol).cast("long").as("_y"))
    val perX = pts.groupBy(col("_x")).agg(max(col("_y")).as("_maxy"))
    // strict-prefix running max over x DESC on the value-cardinality
    // per-x relation (bounded by precondition — same contract as the
    // rank device's histogram). The cardinality guard is LAZY since
    // r19 (ADVICE r18: the eager localCheckpoint + count paid a Spark
    // job and leaked a persistent RDD on EVERY plan construction —
    // Explain audits, CacheLifecycleSpec, each bench run): `_nx` rides
    // the same bounded window pass and `assert_true` raises at
    // execution, so construction is pure plan-building and the loud
    // refusal is preserved.
    val w = Window.orderBy(col("_x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_x").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val guard = assert_true(col("_nx") <= maxDistinctX,
      lit(s"frontier2d: distinct $xCol values exceed maxDistinctX=" +
        s"$maxDistinctX — the per-x maxima relation must stay " +
        s"broadcast/window-small; quantize or bucket $xCol first"))
    // The guard filters `pref` ITSELF, below the broadcast (ADVICE r19):
    // `_nx` is the unbounded-frame count, so the FIRST row out of the
    // window already carries the full distinct-x cardinality and the
    // assert raises inside the broadcast-build job — the refusal is
    // guaranteed to precede the driver-side broadcast collect (before,
    // the guard rode the probe side and a grossly high-cardinality x
    // could surface as a broadcast-size/driver-OOM error instead).
    val pref = perX.withColumn("_prefmax", max(col("_maxy")).over(w))
      .withColumn("_nx", count(lit(1)).over(wAll))
      .filter(guard.isNull)
    pts.join(broadcast(pref), Seq("_x"))
      .filter(col("_y") === col("_maxy") &&
        (col("_prefmax").isNull || col("_prefmax") < col("_y")))
      .select(col(idCol), col("_x").as(xCol), col("_y").as(yCol))
  }
}
