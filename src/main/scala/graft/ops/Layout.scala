package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the dominant cost is the scan, and the dominant scan saving
  * is skipping files/row-groups whose min-max statistics exclude the
  * predicate. A sort on one column gives perfect pruning on that column
  * and none on any other; interleaving the bits of several bounded
  * columns (Z-order / Morton curve) gives every interleaved column
  * partial locality, so each file covers a small RECTANGLE of the key
  * space and predicates on ANY of the dimensions prune. This is the same
  * layout trick lakehouse table formats expose as `OPTIMIZE ... ZORDER
  * BY`; here it is a plain deterministic expression plus a range
  * repartition, so it works on any parquet table.
  */
object Layout {

  /** Morton (Z-order) key of two non-negative dimension columns, `bits`
    * bits each: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Deterministic integer bit math (codegen'd built-ins, no UDF);
    * callers bound the dimensions first (e.g. `pmod(x, 1 << bits)`). */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // disjoint bit positions: OR == +, OR keeps the intent explicit
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve key of two non-negative dimension columns on the
    * 2^bits grid (native codegen kernel — the per-level rotation is
    * data-dependent, so there is no Morton-style closed bit form).
    * Hilbert beats Z-order for pruning because CONSECUTIVE curve
    * positions are always grid neighbors: a contiguous d-range (one
    * output file under range partitioning) covers a compact blob with
    * no Z-shape jumps, so per-file min-max boxes are tighter on both
    * dimensions. Callers bound the dimensions first, exactly as for
    * [[mortonKey]]. */
  def hilbertKey(a: Column, b: Column, bits: Int = 16): Column =
    graft.functions.TextHash.hilbertD(a.cast("long"), b.cast("long"), bits)

  /** [[clusterByZOrder]]'s Hilbert twin: range-repartition +
    * in-partition sort on the Hilbert index. Same single-shuffle cost,
    * strictly better worst-case file footprints. */
  def clusterByHilbert(
      df: DataFrame, aCol: String, bCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("__hkey"),
      "clusterByHilbert reserves the column name __hkey; rename it upstream")
    df.withColumn("__hkey", hilbertKey(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__hkey"))
      .sortWithinPartitions("__hkey")
      .drop("__hkey")
  }

  /** Rewrite `df` into `numFiles` files clustered along the Z-order curve
    * of two bounded dimension columns: range-repartition + in-partition
    * sort on the Morton key, so each output file covers a compact
    * rectangle of (a, b) space and min-max stats prune scans filtered on
    * EITHER dimension. One shuffle (the range exchange); the sort is
    * within partitions. The helper returns the clustered frame (caller
    * writes it), with the internal key column dropped. */
  def clusterByZOrder(
      df: DataFrame, aCol: String, bCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("__zkey"),
      "clusterByZOrder reserves the column name __zkey; rename it upstream")
    df.withColumn("__zkey", mortonKey(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
