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

  test("hilbertD is a bijection on the 2^bits grid, consecutive curve " +
      "positions are GRID NEIGHBORS (the property Morton lacks), and " +
      "d2xy inverts xy2d exactly") {
    import graft.functions.NativeKernels
    val bits = 5
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield NativeKernels.hilbertD(x.toLong, y.toLong, bits)
    assert(ds.toSet == (0L until (n.toLong * n)).toSet, "bijection")
    // unit-step adjacency along the whole curve
    val cell = new Array[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      cell(NativeKernels.hilbertD(x.toLong, y.toLong, bits).toInt) =
        (x.toLong, y.toLong)
    cell.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
          s"curve jump at ($x1,$y1)->($x2,$y2)")
      case _ => ()
    }
    // inverse round-trip at a larger bits too
    for (x <- Seq(0L, 1L, 12345L, 65535L); y <- Seq(0L, 7L, 999L, 65535L)) {
      val d = NativeKernels.hilbertD(x, y, 16)
      assert(NativeKernels.hilbertXY(d, 16) == ((x, y)), s"roundtrip $x,$y")
    }
    // Morton comparison: count of curve steps that are NOT neighbors
    val mortonJumps = (0 until n * n - 1).count { d =>
      def xy(m: Long): (Long, Long) = {
        var x = 0L; var y = 0L
        for (i <- 0 until bits) {
          x |= ((m >> (2 * i)) & 1L) << i
          y |= ((m >> (2 * i + 1)) & 1L) << i
        }
        (x, y)
      }
      val (x1, y1) = xy(d.toLong); val (x2, y2) = xy(d.toLong + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1L
    }
    assert(mortonJumps > 0, "Morton has Z-jumps; Hilbert has zero")
  }

  test("clusterByHilbert: per-partition bounding boxes at least as " +
      "compact as z-order's on the same points") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4000)((rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("a", "b")
    def areaSum(df: org.apache.spark.sql.DataFrame): Long = df
      .mapPartitions { it =>
        val xs = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (xs.isEmpty) Iterator.empty
        else Iterator((xs.map(_._1).max - xs.map(_._1).min + 1) *
          (xs.map(_._2).max - xs.map(_._2).min + 1))
      }.collect().sum
    val h = areaSum(Layout.clusterByHilbert(pts, "a", "b", 16, bits = 6))
    val z = areaSum(Layout.clusterByZOrder(pts, "a", "b", 16, bits = 6))
    val naive = areaSum(pts.repartition(16))
    assert(h < naive / 4, s"h=$h naive=$naive")
    assert(h <= z * 3 / 2, s"hilbert=$h should not be worse than z=$z")
  }
}
