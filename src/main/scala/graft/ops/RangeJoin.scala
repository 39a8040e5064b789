package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join without a nested loop. Spark's planner
  * turns a pure inequality join — `ON l.start <= r.end AND r.start <=
  * l.end` — into BroadcastNestedLoopJoin (or a cartesian product): O(n×m)
  * comparisons, a scale-killer the moment neither side fits in memory.
  * This operator restates the range join as an EQUI-join on time buckets:
  *
  *  1. each interval explodes to the fixed-width buckets it covers
  *     (replication = span/bucketWidth + 1 — size `bucketWidth` to the
  *     typical span so this stays a small constant);
  *  2. a hash equi-join on the bucket id (plus any `equiKeys`) meets
  *     exactly the interval pairs that share a bucket;
  *  3. the true-overlap predicate removes same-bucket non-overlaps;
  *  4. each surviving pair is emitted by its FIRST shared bucket only —
  *     the bucket of `max(l.start, r.start)` — so pairs overlapping
  *     across several buckets appear exactly once WITHOUT a distinct
  *     (no dedup shuffle; ownership is decided row-locally).
  *
  * Cost: O(rows × replication) shuffle + O(true matches) output — the
  * shape that survives 100 TB. Hot buckets (a skewed time range) salt
  * exactly like any other equi-join key ([[Skew.saltedJoin]] composes).
  *
  * Bucketing uses integer `div`, which truncates toward zero — bucket 0
  * is twice as wide when coordinates straddle zero (a perf quirk, not a
  * correctness one: `div` is monotone, so every overlapping pair still
  * shares at least one bucket and ownership stays unique).
  */
object RangeJoin {

  /** Join rows of `left` and `right` whose closed intervals
    * `[lStart, lEnd]` × `[rStart, rEnd]` overlap (touching endpoints
    * match). Columns must be integral (e.g. epoch micros) with
    * `start <= end`; all four names (plus `equiKeys`, present on BOTH
    * sides) must be distinct from each other and from `__b`.
    * Output = left columns ++ right columns (equiKeys merged). */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "intervalOverlapJoin reserves the column name __b; rename it upstream")
    def buckets(s: String, e: String): Column =
      explode(sequence(expr(s"`$s` div ${bucketWidth}L"),
        expr(s"`$e` div ${bucketWidth}L")))
    val lb = left.withColumn("__b", buckets(lStart, lEnd))
    val rb = right.withColumn("__b", buckets(rStart, rEnd))
    lb.join(rb, "__b" +: equiKeys)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("__b") ===
        expr(s"greatest(`$lStart`, `$rStart`) div ${bucketWidth}L"))
      .drop("__b")
  }
}
