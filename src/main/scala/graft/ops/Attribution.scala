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

  /** EXACT Shapley-value attribution over three channels — the
    * coalition-fair split heuristic rules (last-touch, linear,
    * position) approximate: each channel's credit is its average
    * marginal lift in conversion rate over every coalition it can
    * join, weighted by the Shapley coefficients (k=3: 1/3 for joining
    * ∅ or the full pair, 1/6 for joining a singleton). Characteristic
    * function: the CUMULATIVE-COVERAGE game
    * v(S) = (conversions among subjects whose touchset ⊆ S) / n — the
    * formulation on which the Shapley axioms hold EXACTLY on observed
    * data: a channel nobody touches changes no coverage (dummy → φ = 0,
    * spec-asserted), interchangeable channels get equal credit
    * (symmetry), and Σφ = v(full) − v(∅) (efficiency). An
    * "exactly-S conversion rate" game looks natural but breaks the
    * dummy axiom the moment any cell is empty. One row out:
    * (n_subjects, phi_1, phi_2, phi_3) in the order of `channels`.
    *
    * Exactness: each v(S) is one division of exact subset-cumulated
    * counts; the Shapley weights are the SAME two injected doubles in
    * both engines, and each φ is a fixed 4-term chain. Scale: one
    * shuffle to subject grain, one 8-cell pivot, scalar arithmetic —
    * exact Shapley is exponential in channels, which is why this is
    * the k=3 closed form, not a general loop. */
  def shapley3(df: DataFrame, idCol: Column, channels: Seq[Column],
      converted: Column): DataFrame = {
    require(channels.size == 3, "shapley3 is the k=3 closed form")
    val per = df.groupBy(idCol.as("__id")).agg(
      max(when(channels(0), 1L).otherwise(0L)).as("__t0"),
      max(when(channels(1), 1L).otherwise(0L)).as("__t1"),
      max(when(channels(2), 1L).otherwise(0L)).as("__t2"),
      max(when(converted, 1L).otherwise(0L)).as("__y"))
    val subset = col("__t0") + lit(2L) * col("__t1") + lit(4L) * col("__t2")
    val cellAggs = (0 until 8).flatMap { sId =>
      Seq(
        coalesce(sum(when(subset === sId.toLong, 1L).otherwise(0L)),
          lit(0L)).as(s"__n$sId"),
        coalesce(sum(when(subset === sId.toLong, col("__y"))
          .otherwise(0L)), lit(0L)).as(s"__c$sId"))
    }
    val agg = per.agg(cellAggs.head, cellAggs.tail: _*)
    val nTot = (0 until 8).map(s => col(s"__n$s")).reduce(_ + _)
    // v(S): conversions among subjects whose touchset ⊆ S, over ALL
    // subjects — always defined, monotone, dummy-axiom-safe.
    def v(sId: Int): org.apache.spark.sql.Column = {
      val covered = (0 until 8).filter(t => (t & ~sId) == 0)
        .map(t => col(s"__c$t")).reduce(_ + _)
      covered.cast("double") / nTot.cast("double")
    }
    val w0 = 1.0 / 3.0 // joining the empty or the full-pair coalition
    val w1 = 1.0 / 6.0 // joining a singleton
    def phi(bit: Int): org.apache.spark.sql.Column = {
      val others = Seq(1, 2, 4).filter(_ != (1 << bit))
      val (a, b) = (others(0), others(1))
      val i = 1 << bit
      lit(w0) * (v(i) - v(0)) +
        lit(w1) * (v(i + a) - v(a)) +
        lit(w1) * (v(i + b) - v(b)) +
        lit(w0) * (v(7) - v(a + b))
    }
    agg.select(nTot.as("n_subjects"),
      when(nTot === 0L, lit(null).cast("double")).otherwise(phi(0))
        .as("phi_1"),
      when(nTot === 0L, lit(null).cast("double")).otherwise(phi(1))
        .as("phi_2"),
      when(nTot === 0L, lit(null).cast("double")).otherwise(phi(2))
        .as("phi_3"))
  }
}
