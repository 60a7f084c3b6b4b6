package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of join — the temporal lookup Spark has no native
  * operator for: for each left row, attach the most recent right row
  * with the same key and `right.ts <= left.ts` (inclusive).
  *
  * Implementation is the scalable union-and-sweep form, not a join:
  * both sides union into one relation tagged by side, a single window
  * pass per key carries the latest right payload forward (`last(...,
  * ignoreNulls)` over a running frame), and left rows project it out.
  *
  * Scale shape: exactly ONE shuffle, keyed by the join key — no range
  * cross product, no per-row backward scan, no broadcast requirement on
  * either side (both may be corpus-sized). The window's running `last`
  * is O(1) state per row. Skew is bounded by per-key event counts, the
  * same bound any per-key sessionization already carries (q10/q38).
  *
  * Determinism: ordering is (ts, side, tiebreak) with right rows first
  * at equal ts, so (a) a right row exactly AT the left ts is matched
  * (inclusive as-of, the common market-data convention), and (b) among
  * right rows sharing one ts the highest tiebreak value wins — no
  * partitioning-dependent result, which the hash gate requires.
  */
object AsOfJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     lookup-side rows
    * @param keys      equi-join key columns (present on both sides)
    * @param tsCol     event-time column name (present on both sides)
    * @param tieCol    right-side column breaking equal-ts ties (max wins)
    * @param payload   right-side columns to attach
    * @return left.* plus a `matched` struct of `payload` columns — null
    *         where no right row at-or-before the left row's ts exists */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asOf: at least one key column")
    require(payload.nonEmpty, "asOf: at least one payload column")
    val payStruct = struct(payload.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val keyCols: Seq[Column] = keys.map(col)

    val r = right.select(keyCols ++ Seq(
      col(tsCol).as("__ts"), lit(0).as("__side"),
      col(tieCol).cast("long").as("__tie"),
      payStruct.as("__pay"), lit(null).cast("binary").as("__row")): _*)
    // Left rows ride as a struct so arbitrary left schemas survive the
    // union; right rows carry a null in that slot.
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val l = left.select(keyCols ++ Seq(
      col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(payType).as("__pay"), leftStruct.as("__row")): _*)
    // Spark unions by position; both branches were built column-aligned,
    // but unionByName makes the invariant explicit.
    val tagged = r.withColumn("__row", lit(null).cast(l.schema("__row").dataType))
      .unionByName(l)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = tagged
      .withColumn("matched", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    enriched.select(left.columns.map(c => col(s"__row.$c").as(c)).toSeq
      :+ col("matched"): _*)
  }
}
