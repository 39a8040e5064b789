package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance from a CDC feed — the consumer side
  * of `ParquetTarget.readChanges(updatePreimages = true)`: a downstream
  * count/sum aggregate is refreshed by subtracting pre-images and adding
  * post-images, so the refresh costs O(changed rows), not an O(table)
  * rescan. At 100 TB this is the difference between maintaining a
  * dashboard aggregate per commit and re-scanning the corpus per commit.
  *
  * Sums accumulate as DECIMAL(18,2), so addition is exact and
  * order-independent: base + delta is bit-identical to a direct
  * re-aggregation, no float drift across refresh cycles. Callers cast to
  * double (or keep the decimal) at the edge.
  */
object Incremental {

  /** Count/sum aggregate of a snapshot in the maintainable shape:
    * (groupCols..., n_rows, __sum DECIMAL(18,2)). */
  def countSumAgg(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__sum"))

  /** Per-group deltas from a pre/post change feed: insert and
    * update_postimage rows count +1/+value, delete and update_preimage
    * rows -1/-value. Feeds emitted without pre-images (plain `update`
    * rows) cannot be maintained exactly and are rejected loud. */
  def aggDeltas(
      feed: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    // a plain 'update' row means the feed lacks pre-images: fail loud
    // rather than silently under-subtract. The error lives INSIDE the
    // sign expression (not a droppable side column), so column pruning
    // cannot optimize the check away.
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(lit("aggDeltas needs a pre-image feed: " +
        "readChanges(updatePreimages = true)")).cast("long"))
    feed
      .select(groupCols.map(col) :+ col(valueCol) :+
        sign.as("__sign"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__sign")).as("n_rows"),
        sum(col("__sign") * col(valueCol).cast("decimal(18,2)")).as("__sum"))
  }

  /** base + deltas, keyed by the group columns; groups whose maintained
    * count reaches zero drop (they no longer exist in the snapshot). */
  def applyAggDeltas(
      base: DataFrame, deltas: DataFrame, groupCols: Seq[String]): DataFrame = {
    val b = base.select(groupCols.map(col) :+
      col("n_rows").as("__bn") :+ col("__sum").as("__bs"): _*)
    val d = deltas.select(groupCols.map(col) :+
      col("n_rows").as("__dn") :+ col("__sum").as("__ds"): _*)
    b.join(d, groupCols, "full_outer")
      .select(groupCols.map(col) :+
        (coalesce(col("__bn"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows") :+
        (coalesce(col("__bs"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("__ds"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("__sum"): _*)
      .where(col("n_rows") > 0)
  }
}
