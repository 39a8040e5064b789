package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order layout: Morton key bit math and the clustering property the
  * layout exists for (each output partition covers a compact rectangle
  * of the 2-D key space, so min-max stats prune on either dimension). */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("mortonKey interleaves bits: a at even positions, b at odd") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L), (1023L, 1023L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonKey(col("a"), col("b"), 10).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((3L, 3L)) == 15L)
    // a=5 (101) at even bits -> 10001; b=2 (010) at odd bits -> 001000
    assert(got((5L, 2L)) == (17L | 8L))
    assert(got((1023L, 1023L)) == (1L << 20) - 1)
  }

  test("clusterByZOrder shrinks per-partition bounding rectangles") {
    // uniform 64x64 grid; 16 partitions
    val rnd = new scala.util.Random(1)
    val pts = Seq.fill(4096)((rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("a", "b")

    def areaSum(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg(((max("a") - min("a") + 1) * (max("b") - min("b") + 1)).as("area"))
        .agg(sum("area")).head().getLong(0)

    val zorderArea = areaSum(Layout.clusterByZOrder(pts, "a", "b", 16, bits = 6))
    val naiveArea = areaSum(pts.repartition(16))
    // random partitions each span ~the whole 64x64 square (sum ~16*4096);
    // z-order partitions cover compact rectangles — order of magnitude less
    assert(zorderArea < naiveArea / 4, s"z=$zorderArea naive=$naiveArea")
  }
}
