package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversion attribution over an event stream — the marketing/product
  * analytics rollup behind "which touchpoint gets credit for this
  * purchase". Built on the engine's [[AsOf]] operator (single keyed
  * shuffle, no pairwise candidate explosion), so it scales exactly like
  * any keyed aggregation.
  *
  * Reference has no attribution operator; this is part of the engine's
  * beyond-reference events surface (SURVEY.md §2.8), in the same family
  * as funnel/retention/sessionize.
  */
object Attribution {

  /** Last-touch attribution: each conversion is credited to the SAME
    * key's latest touch at-or-before the conversion time (inclusive,
    * DuckDB `ASOF ... ON l.ts >= r.ts` semantics); conversions with no
    * prior touch credit the `defaultChannel`. Emits the per-channel
    * rollup (channel, n_conversions, sum_value).
    *
    * Determinism: several touches sharing one (key, ts) resolve to the
    * greatest `tieBreakCols` tuple (pass a unique id — without it the
    * credited channel is shuffle-order dependent); the value sum
    * accumulates as DECIMAL(18,2) (exact, order-independent) and only
    * the final per-channel total is cast to DOUBLE.
    *
    * Scale: one shuffle on `keyCols` for the as-of (union + running
    * window — no range join), then one map-side-combinable rollup on
    * the channel; output is O(channels). */
  def lastTouch(
      conversions: DataFrame, touches: DataFrame,
      keyCols: Seq[String], convTsCol: String, touchTsCol: String,
      channelCol: String, valueCol: String,
      tieBreakCols: Seq[String] = Nil,
      defaultChannel: String = "direct"): DataFrame =
    AsOf.joinAsOf(conversions, touches, keyCols, convTsCol, touchTsCol,
      Seq(channelCol), rightTieBreakCols = tieBreakCols)
      .select(
        coalesce(col(s"asof_$channelCol"), lit(defaultChannel))
          .as("channel"),
        col(valueCol))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
}
