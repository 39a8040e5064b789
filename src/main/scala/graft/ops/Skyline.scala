package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front) per group: the rows not strictly dominated
  * on (maximize x, minimize y) — "best value seen this early" style
  * frontier queries.
  *
  * The skyline operator is DISTRIBUTIVE: the global front is a subset of
  * the union of per-bucket fronts (a point undominated globally is
  * undominated in its own bucket). So the plan is two-level — a salted
  * local front first (per-partition windows over (group, salt), expected
  * O(log n) survivors per bucket on non-adversarial data), then the
  * exact front over the few survivors — and the only full-group window
  * runs over that tiny survivor set, never the raw group. A single
  * per-group window would put a whole group's 2e13 rows in one task at
  * the 100-TB target; this shape never does.
  *
  * In-window test: order by (x DESC, y ASC); a row survives iff the
  * running min of y over all PRIOR rows is strictly greater than its own
  * y (prior rows have larger x, or equal x with smaller-or-equal y, so
  * any prior y ≤ current y is a strict dominator). Duplicate (x, y)
  * pairs are collapsed first.
  */
object Skyline {

  /** Skyline of distinct (x, y) pairs per group; output (g, x, y). */
  def skyline2d(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column, salts: Int = 64): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val base = df.select(groupCol.as("g"), xCol.cast("double").as("x"),
        yCol.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .distinct()
    def front(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(col("x").desc, col("y").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("__my", min(col("y")).over(w))
        .where(col("__my").isNull || col("y") < col("__my"))
        .drop("__my")
    }
    val local = front(base,
      Seq(col("g"), pmod(hash(col("x"), col("y")), lit(salts))))
    front(local, Seq(col("g")))
  }
}
