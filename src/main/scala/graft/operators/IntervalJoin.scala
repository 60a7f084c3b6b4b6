package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap aggregation — the range-join shape Spark has no
  * native operator for: per interval [start, end] (inclusive), the
  * count of same-key events with `start <= ts <= end` (ad-attribution
  * windows, session containment, SLA windows).
  *
  * A naive formulation is an equi-key join with a range predicate —
  * Catalyst plans it as a per-key cross product, quadratic in per-key
  * row counts. This is the scalable UNION-AND-SWEEP form (the
  * [[AsOfJoin]] device extended to two probes): interval endpoints and
  * events union into one relation, ONE window pass per key computes
  * the running event count, and each interval's overlap count is the
  * difference of the counts its two probes observed —
  * `n = c(end⁺) − c(start⁻)`. Exactly one shuffle keyed by the join
  * key; no cross product; O(1) window state per row; both sides may be
  * corpus-sized (no broadcast requirement).
  *
  * Inclusive-bound determinism: the sweep orders (ts, side) with
  * start-probes BEFORE events at equal ts and end-probes AFTER —
  * an event exactly at `start` or `end` counts, for any partitioning.
  * Counts are exact integers, so the result hashes identically across
  * engines (the DuckDB oracle runs the naive range join — a different
  * algorithm entirely — and must agree bit-for-bit).
  */
object IntervalJoin {

  /** @param intervals one row per interval; `idCol` must be unique
    * @param events    point rows; only `keys` + `tsCol` are read
    * @param keys      equi-join key columns (present on both sides)
    * @param idCol     interval identity column (long-castable, unique)
    * @param startCol/endCol/tsCol event-time columns (same type)
    * @return intervals.* + `n_events` (events in [start, end], inclusive) */
  def intervalCount(intervals: DataFrame, events: DataFrame,
      keys: Seq[String], idCol: String, startCol: String, endCol: String,
      tsCol: String): DataFrame = {
    require(keys.nonEmpty, "intervalCount: at least one key column")
    val k: Seq[Column] = keys.map(col)
    // side order encodes the inclusive bounds: start-probe (0) sees the
    // count BEFORE equal-ts events (so they land inside), event (1),
    // end-probe (2) sees the count AFTER them
    val sp = intervals.select(k ++ Seq(col(startCol).as("__ts"),
      lit(0).as("__side"), col(idCol).cast("long").as("__iid")): _*)
    val ev = events.select(k ++ Seq(col(tsCol).as("__ts"),
      lit(1).as("__side"), lit(null).cast("long").as("__iid")): _*)
    val ep = intervals.select(k ++ Seq(col(endCol).as("__ts"),
      lit(2).as("__side"), col(idCol).cast("long").as("__iid")): _*)
    val w = Window.partitionBy(k: _*)
      .orderBy(col("__ts"), col("__side"), col("__iid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = sp.unionByName(ev).unionByName(ep)
      .withColumn("__c",
        sum(when(col("__side") === 1, 1L).otherwise(0L)).over(w))
    // both probes pivot out of ONE pass over the swept relation (two
    // filtered self-references would execute the union+window twice);
    // the aggregate is interval-sized — each __iid has exactly one
    // start and one end probe
    val probes = swept.filter(col("__side") =!= 1)
      .groupBy(col("__iid"))
      .agg(max(when(col("__side") === 0, col("__c"))).as("__c0"),
        max(when(col("__side") === 2, col("__c"))).as("__c1"))
    intervals
      .join(probes, col(idCol).cast("long") === col("__iid"))
      .withColumn("n_events", col("__c1") - col("__c0"))
      .drop("__iid", "__c0", "__c1")
  }
}
