package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-cell spatial joins — the bucketing discipline applied to
  * coordinates: a radius join materialized as an EQUI-join on grid
  * cells (never a cross join, never a per-row range scan), the same
  * shape Sedona/GeoMesa partitioned joins and every LSH gate in this
  * repo use. Integer coordinates only (quantize first — meters, fixed-
  * point degrees, pixel positions): every distance here is an exact
  * BIGINT, so the oracle replays pair-for-pair. */
object Spatial {

  /** All (a, b) pairs within CHEBYSHEV radius `r` (max-coordinate
    * metric — the grid-aligned superset of the Euclidean ball; filter
    * the emitted exact `d2` for a circular radius): cell size = r, the
    * smaller side B is replicated into its 3×3 cell neighborhood, one
    * equi-join on the cell key, then the exact per-pair check. Emits
    * (a_id, b_id, d2) with d2 the squared Euclidean distance.
    *
    * Scale: candidates = Σ per-cell |A_cell|·|B_3×3(cell)| — bounded by
    * grid density, not |A|·|B|; the cell key is a plain shuffle key
    * (AQE-skew-splittable for hot cells). Truncating `div` merges the
    * cells straddling zero into one wider cell — coverage still holds
    * (a span of r+1 crosses at most one boundary of width ≥ r), it
    * only admits a few extra candidates near the origin; prefer
    * shifting into the positive quadrant for uniform cell sizing. */
  def neighborJoin(
      a: DataFrame, aId: String, ax: String, ay: String,
      b: DataFrame, bId: String, bx: String, by: String,
      r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    val pa = a.select(col(aId).as("a_id"),
        col(ax).cast("long").as("ax"), col(ay).cast("long").as("ay"))
      .withColumn("__cx", expr(s"ax div ${r}L"))
      .withColumn("__cy", expr(s"ay div ${r}L"))
    val pb = b.select(col(bId).as("b_id"),
        col(bx).cast("long").as("bx"), col(by).cast("long").as("by"))
      .withColumn("__d", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)))
      .select(col("b_id"), col("bx"), col("by"),
        (expr(s"bx div ${r}L") + col("__d.dx")).as("__cx"),
        (expr(s"by div ${r}L") + col("__d.dy")).as("__cy"))
    pa.join(pb, Seq("__cx", "__cy"))
      .filter(abs(col("ax") - col("bx")) <= r &&
        abs(col("ay") - col("by")) <= r)
      .select(col("a_id"), col("b_id"),
        ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
  }

  /** Local density HOTSPOTS on the cell grid (the integer-exact core
    * of a Getis-Ord scan): per occupied cell, its point count n, the
    * 3×3-neighborhood count (self included; absent cells contribute 0),
    * and the quantized concentration ratio n·1000 div neigh — a cell
    * whose mass dominates its own neighborhood. One grouped count, one
    * 9-way cell replication, one equi-join — grid-bounded, never
    * per-point pair work. Output: (cell_x, cell_y, n, neigh_n,
    * ratio_q). */
  def hotspotCells(
      points: DataFrame, x: String, y: String, cell: Long): DataFrame = {
    require(cell >= 1, s"cell must be >= 1, got $cell")
    val g = points
      .select(expr(s"cast($x as bigint) div ${cell}L").as("cell_x"),
        expr(s"cast($y as bigint) div ${cell}L").as("cell_y"))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n"))
    val spread = g
      .withColumn("__d", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)))
      .select((col("cell_x") + col("__d.dx")).as("cell_x"),
        (col("cell_y") + col("__d.dy")).as("cell_y"), col("n"))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(sum(col("n")).as("neigh_n"))
    g.join(spread, Seq("cell_x", "cell_y"))
      .withColumn("ratio_q", expr("n * 1000 div neigh_n"))
  }

  /** The geohash base32 alphabet (no a/i/l/o — the public geohash
    * digit set). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash-style cell key of an INTEGER grid point: Morton-interleave
    * the two bits-bit coordinates (x even positions, y odd — the
    * lng/lat alternation) and render the 2·bits code MSB-first in the
    * public geohash base32 alphabet. The defining property survives the
    * integer-grid variant: every string PREFIX names a coarser
    * enclosing cell, so prefix-grouping = hierarchical spatial
    * bucketing with plain string equality. Pure Column bit arithmetic —
    * codegen'd, no UDF — and exactly replayable in the oracle. 2·bits
    * must divide by 5 (whole base32 digits). */
  def geohashCell(x: Column, y: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31 && (2 * bits) % 5 == 0,
      s"2*bits must be a multiple of 5, got bits=$bits")
    val nChars = 2 * bits / 5
    val code = Layout.mortonKey(x, y, bits)
    val alphabet = array(GeohashAlphabet.map(c => lit(c.toString)): _*)
    concat((0 until nChars).map(k =>
      element_at(alphabet,
        (shiftright(code, 5 * (nChars - 1 - k)).bitwiseAND(lit(31L)) + 1L)
          .cast("int"))): _*)
  }
}
