package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the sequential-pattern operator of product
  * analytics (signup → click → purchase conversion): step i is reached
  * at the EARLIEST event of its type at-or-after the step-(i−1) time
  * and within `maxGap` of it; a user enters the funnel at their first
  * `steps(0)` event.
  *
  * Scale shape: ONE hash exchange on the user key. Each step time is a
  * per-user window aggregate whose predicate references the previous
  * step's window column — every Window node shares the same partition
  * spec, so Catalyst stacks them on a single exchange, and the final
  * per-user collapse is already co-partitioned (no second shuffle; the
  * plan audit in PLANS.md shows exactly one Exchange before the
  * presentation sort). No self-joins per step — the join formulation
  * re-shuffles the full event relation once per funnel stage, which is
  * the difference between 1 and |steps| corpus shuffles at 100 TB.
  *
  * Determinism: `min` per step; no tie-breaking needed. */
object Funnel {

  /** @return one row per funnel-entering user: the key, `t0..tn`
    *         (nullable step timestamps) and `steps_completed` (1-based,
    *         BIGINT) */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGap: String = "24 hours"): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val w = Window.partitionBy(col(userCol))
    val gap = expr(s"INTERVAL $maxGap")
    var d = events.select(col(userCol), col(tsCol).as("_ts"),
      col(typeCol).as("_et"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col("_et") === s
        else col("_et") === s && col(s"_t${i - 1}").isNotNull &&
          col("_ts") >= col(s"_t${i - 1}") &&
          col("_ts") <= col(s"_t${i - 1}") + gap
      d = d.withColumn(s"_t$i", min(when(cond, col("_ts"))).over(w))
    }
    val firstAggs = steps.indices.map(i => first(col(s"_t$i")).as(s"t$i"))
    d.groupBy(col(userCol))
      .agg(firstAggs.head, firstAggs.tail: _*)
      .filter(col("t0").isNotNull)
      .withColumn("steps_completed",
        steps.indices.map(i =>
          when(col(s"t$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }
}
