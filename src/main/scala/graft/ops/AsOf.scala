package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks up the latest right row
  * with the same key and right-ts <= left-ts — the lookup a feature store /
  * training-data pipeline needs for leak-free labels, and an operator Spark
  * has no built-in for.
  *
  * Implementation is the scale-correct union + window pattern, NOT a join:
  * tag both sides, union, and run one `last(..., ignoreNulls)` window per
  * carried column over (key, time, side). Cost is a single shuffle on the
  * key — same as any keyed aggregation — with no pairwise candidate
  * explosion: a range/theta join would explode with per-key density, and a
  * per-key `collect_list` would OOM on hot keys; the running window is
  * streaming-friendly and AQE-skew-splittable. Right rows order before
  * left rows at equal timestamps, giving inclusive (<=) semantics that
  * match DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` (the driver oracle).
  */
object AsOf {

  /** @param rightValCols right columns carried onto matches (emitted as
    *                     `asof_<name>`, NULL when no right row precedes);
    *                     the right timestamp itself may be included to
    *                     expose the match time.
    * @param rightTieBreakCols resolve several right rows sharing one
    *                     (key, timestamp): the row with the greatest
    *                     tie-break tuple wins. Pass a unique column when
    *                     such collisions are possible — without it the
    *                     winner is shuffle-order dependent. */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      rightValCols: Seq[String],
      rightTieBreakCols: Seq[String] = Nil): DataFrame =
    joinAsOfDir(left, right, keyCols, leftTsCol, rightTsCol,
      rightValCols, rightTieBreakCols, forward = false)

  /** FORWARD as-of: each left row picks up the EARLIEST right row with
    * right-ts >= left-ts — "the next event at or after t" (next-action
    * attribution, forward fill to the following snapshot, time-to-event
    * labels). Same single-shuffle union+window plan as [[joinAsOf]],
    * with the window walked in descending time; ties on (key, ts) still
    * resolve to the greatest tie-break tuple. */
  def joinAsOfForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      rightValCols: Seq[String],
      rightTieBreakCols: Seq[String] = Nil): DataFrame =
    joinAsOfDir(left, right, keyCols, leftTsCol, rightTsCol,
      rightValCols, rightTieBreakCols, forward = true)

  private def joinAsOfDir(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      rightValCols: Seq[String],
      rightTieBreakCols: Seq[String],
      forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val leftOut = left.columns.toSeq

    val tbNames = rightTieBreakCols.zipWithIndex.map { case (_, i) => s"__tb_$i" }
    val l = left
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftOut.filterNot(keyCols.contains).map(col) ++
          rightValCols.map(c => lit(null).as(s"__rv_$c")) ++
          tbNames.map(n => lit(null).as(n)): _*)
    val r = right
      .withColumn("__t", col(rightTsCol))
      .withColumn("__side", lit(0))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftOut.filterNot(keyCols.contains).map(c => lit(null).as(c)) ++
          rightValCols.map(c => col(c).as(s"__rv_$c")) ++
          rightTieBreakCols.zip(tbNames).map { case (c, n) => col(c).as(n) }: _*)

    // Order: time (descending when forward — the running last then sees
    // the NEAREST following right row), then side (right rows before
    // left at equal time → inclusive <= / >=), then the right tie-break
    // so equal-(key, ts) right rows resolve deterministically to the
    // greatest tie tuple.
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tOrd +: col("__side").asc +:
        tbNames.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE running-last over a struct of all carried columns: every value
    // comes from the SAME matched right row (per-column lasts would
    // back-fill a NULL value in the latest right row from an older row —
    // a (ts, value) combination existing in no right row, diverging from
    // ASOF JOIN semantics). The struct is non-null exactly on right rows
    // with a real timestamp: a NULL right ts sorts NULLS-FIRST and would
    // otherwise become a phantom match for left rows preceding all real
    // right rows (ASOF's l.ts >= r.ts never matches a NULL r.ts).
    val rowStruct = when(col("__side") === 0 && col("__t").isNotNull,
      struct(rightValCols.map(c => col(s"__rv_$c").as(c)): _*))
    val withAsOf = l.unionByName(r)
      .withColumn("__rv", last(rowStruct, ignoreNulls = true).over(w))

    withAsOf
      .where(col("__side") === 1)
      .select(
        (leftOut.map(col) ++
          rightValCols.map(c => col(s"__rv.$c").as(s"asof_$c"))): _*)
  }

  /** As-of join with a max-staleness tolerance (pandas `merge_asof
    * tolerance` semantics): a match older than `toleranceUs` is no match
    * at all — every carried column nulls out TOGETHER (they came from one
    * struct, so there is no per-column mix-and-match) and `asof_matched`
    * reports the outcome. The feature-store freshness contract: a label
    * may only use features observed within the staleness budget.
    *
    * Same single-shuffle union+window plan as [[joinAsOf]] — the
    * tolerance is one row-local comparison on top, nothing joins or
    * shuffles again. */
  def joinAsOfTolerance(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      rightValCols: Seq[String], toleranceUs: Long,
      rightTieBreakCols: Seq[String] = Nil): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val leftOut = left.columns.toSeq
    val carried = (rightTsCol +: rightValCols).distinct
    val base = joinAsOf(left, right, keyCols, leftTsCol, rightTsCol,
      carried, rightTieBreakCols)
    val fresh = col(s"asof_$rightTsCol").isNotNull &&
      (col(leftTsCol) - col(s"asof_$rightTsCol")) <= toleranceUs
    base.select(
      (leftOut.map(col) ++
        rightValCols.map(c =>
          when(fresh, col(s"asof_$c")).as(s"asof_$c")) :+
        fresh.as("asof_matched")): _*)
  }
}
