package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Skyline}

/** Hand-worked fixtures for the Katz fixed-point and the two-level
  * skyline, plus a salted-vs-exact equivalence sweep. */
class SkylineKatzSpec extends SparkSpec {

  import spark.implicits._

  test("katz: two rounds on a 4-node path match hand arithmetic") {
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("s", "d")
    val r = Graph.katz(edges, "s", "d", iters = 2, q = 1000000L,
      alphaNum = 1L, alphaDen = 4L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1000000L && r(3L) == 1000000L)
    assert(r(2L) == 1500000L) // q + (2q)//4, stable (sources never change)
    assert(r(4L) == 1375000L) // q + x1(2)//4 = q + 1500000//4
  }

  test("skyline: strict 2-D dominance with duplicate collapse") {
    val pts = Seq(("A", 5.0, 10L), ("A", 4.0, 5L), ("A", 3.0, 20L),
      ("A", 4.0, 8L), ("A", 5.0, 10L), ("B", 1.0, 1L))
      .toDF("g", "x", "y")
    val got = Skyline.skyline2d(pts, col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(got == Set(("A", 5.0, 10L), ("A", 4.0, 5L), ("B", 1.0, 1L)))
  }

  test("skyline: salted two-level front equals the single-window front") {
    val pts = spark.range(5000).select(
      (col("id") % 3L).cast("string").as("g"),
      (col("id") * 2654435761L % 997L).cast("double").as("x"),
      (col("id") * 40503L % 1009L).as("y"))
    val fast = Skyline.skyline2d(pts.repartition(11), col("g"), col("x"),
      col("y")).collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // single-window replay, no salting stage at all
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("x").desc,
      col("y").asc).rowsBetween(Window.unboundedPreceding, -1)
    val slow = pts.distinct().withColumn("my", min(col("y")).over(w))
      .where(col("my").isNull || col("y") < col("my"))
      .select(col("g"), col("x"), col("y"))
      .collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(fast == slow && fast.nonEmpty)
  }
}
