package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Linear (equal-split) multi-touch attribution — [[lastTouch]]'s
    * fairer sibling: each conversion's value is split EQUALLY across
    * every same-key touch inside the lookback window
    * (conv_ts − windowUs < touch_ts ≤ conv_ts); conversions with no
    * in-window touch credit `defaultChannel` in full. Emits the
    * per-channel rollup (channel, n_credits, credit_micro,
    * credit_value).
    *
    * Exactness: the value is quantized to cents (`floor(value·100)`),
    * scaled to micro-cents, and each touch's share is the FLOOR
    * division `micro // n` — computed sign-safely as
    * `(a − pmod(a, n)) / n` so it replays bit-for-bit in any engine's
    * floor-division (up to n−1 micro-cents per conversion round down;
    * deterministic, documented, and 10⁻⁸ of a cent per dollar). All
    * credits are BIGINT micro-cents; the one float is the final
    * display division.
    *
    * Scale: one key-equi-join (per-key fanout bounded by a user's own
    * touch count — never a corpus cross product) + one window keyed by
    * the unique conversion id + one channel rollup; output is
    * O(channels). */
  def linear(
      conversions: DataFrame, touches: DataFrame,
      keyCols: Seq[String], convIdCol: String, convTsCol: String,
      touchTsCol: String, channelCol: String, valueCol: String,
      windowUs: Long, defaultChannel: String = "direct"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowUs > 0L, s"windowUs must be > 0, got $windowUs")
    val c = conversions.select(
      keyCols.map(col) :+ col(convIdCol).as("__cid") :+
        col(convTsCol).cast("long").as("__cts") :+
        (floor(col(valueCol) * 100.0).cast("long") * 1000000L)
          .as("__micro"): _*)
    val tch = touches.select(
      keyCols.map(col) :+ col(touchTsCol).cast("long").as("__tts") :+
        col(channelCol).as("__ch"): _*)
    val cond = keyCols.map(k => c(k) === tch(k)).reduce(_ && _) &&
      col("__tts") <= col("__cts") &&
      col("__tts") > col("__cts") - lit(windowUs)
    val j = c.join(tch, cond, "left_outer")
    val n = count(col("__ch")).over(Window.partitionBy(col("__cid")))
    val credit = (col("__micro") - pmod(col("__micro"), col("__n"))) /
      col("__n")
    j.withColumn("__n", n)
      .select(
        when(col("__n") === 0L, lit(defaultChannel)).otherwise(col("__ch"))
          .as("channel"),
        when(col("__n") === 0L, col("__micro"))
          .otherwise(credit.cast("long")).as("__credit"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        coalesce(sum(col("__credit")), lit(0L)).as("credit_micro"))
      .withColumn("credit_value",
        col("credit_micro").cast("double") / lit(1.0e8))
  }

  /** Position-based (U-shaped) multi-touch attribution — the third
    * member of the family: 40% of each conversion's value to the FIRST
    * in-window touch, 40% to the LAST, and the remaining pool split
    * equally across the middle touches. The industry-standard shape for
    * "discovery and closing both matter more than the middle".
    *
    * Exact integer credit schedule over BIGINT micro-cents (floor
    * division is the sign-safe `(a − pmod(a, n)) / n`, replaying
    * DuckDB's `//` bit-for-bit):
    *   - 0 touches → `defaultChannel` gets the full amount;
    *   - 1 touch   → it gets the full amount;
    *   - 2 touches → first gets `micro // 2`, last the remainder
    *     (50/50, the standard two-touch convention — conserving);
    *   - ≥3        → first = last = `micro · 40 // 100`, each middle =
    *     `(micro − first − last) // (n−2)` (up to n−3 micro-cents of
    *     the middle pool round down; deterministic and documented, the
    *     same floor-loss contract as [[linear]]).
    *
    * Position is the row_number over (touch_ts, tie-break id) inside the
    * conversion's window — pass a unique `touchIdCol` or first/last are
    * shuffle-order dependent under ts ties.
    *
    * Scale: identical shape to [[linear]] — one key-equi-join bounded by
    * per-key touch counts, two windows keyed by the unique conversion id
    * (never a global window), one channel rollup; output O(channels). */
  def positionBased(
      conversions: DataFrame, touches: DataFrame,
      keyCols: Seq[String], convIdCol: String, convTsCol: String,
      touchTsCol: String, touchIdCol: String, channelCol: String,
      valueCol: String, windowUs: Long,
      defaultChannel: String = "direct"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowUs > 0L, s"windowUs must be > 0, got $windowUs")
    val c = conversions.select(
      keyCols.map(col) :+ col(convIdCol).as("__cid") :+
        col(convTsCol).cast("long").as("__cts") :+
        (floor(col(valueCol) * 100.0).cast("long") * 1000000L)
          .as("__micro"): _*)
    val tch = touches.select(
      keyCols.map(col) :+ col(touchTsCol).cast("long").as("__tts") :+
        col(touchIdCol).as("__tid") :+ col(channelCol).as("__ch"): _*)
    val cond = keyCols.map(k => c(k) === tch(k)).reduce(_ && _) &&
      col("__tts") <= col("__cts") &&
      col("__tts") > col("__cts") - lit(windowUs)
    val byCid = Window.partitionBy(col("__cid"))
    val ordered = byCid.orderBy(col("__tts"), col("__tid"))
    def floorDiv(a: Column, n: Column): Column =
      ((a - pmod(a, n)) / n).cast("long")
    val fortyPct = floorDiv(col("__micro") * 40L, lit(100L))
    val halfUp = col("__micro") - floorDiv(col("__micro"), lit(2L))
    val midPool = col("__micro") - fortyPct * 2L
    val credit =
      when(col("__n") === 1L, col("__micro"))
        .when(col("__n") === 2L,
          when(col("__rn") === 1L, floorDiv(col("__micro"), lit(2L)))
            .otherwise(halfUp))
        .when(col("__rn") === 1L || col("__rn") === col("__n"), fortyPct)
        .otherwise(floorDiv(midPool, col("__n") - 2L))
    c.join(tch, cond, "left_outer")
      .withColumn("__n", count(col("__ch")).over(byCid))
      .withColumn("__rn", row_number().over(ordered))
      .select(
        when(col("__n") === 0L, lit(defaultChannel)).otherwise(col("__ch"))
          .as("channel"),
        when(col("__n") === 0L, col("__micro")).otherwise(credit)
          .as("__credit"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        coalesce(sum(col("__credit")), lit(0L)).as("credit_micro"))
      .withColumn("credit_value",
        col("credit_micro").cast("double") / lit(1.0e8))
  }
}
