package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-example assembly: lay the corpus out as
  * one concatenated token stream (in a deterministic document order) and
  * cut it into fixed-capacity blocks — the standard "concat and split at
  * the context boundary" packing used to build LLM training batches with
  * zero padding. Each document is assigned the block range its tokens
  * land in; a document may straddle a block boundary (that is the point:
  * no padding, perfect utilization).
  *
  * Scale shape: the running total is a window sum. With `partitionCols`
  * empty the window is global — a single-task sort, fine for one shard
  * but NOT the 100-TB plan. The scale path is per-partition packing
  * (`partitionCols` = shard/language/source), which is how production
  * packers run anyway (blocks must not mix shards): the window sum then
  * shuffles once on the partition key and each group packs independently
  * in parallel. Pure integer arithmetic end-to-end — exact on any engine.
  */
object Packing {

  /** Assign each row to its block span in the concatenated stream.
    *
    * @param idCol     deterministic order within a partition. Need not be
    *                  unique: the explicit ROWS frame gives tied rows
    *                  consecutive (not pooled) spans — though the span
    *                  assignment among equal keys is then tie-order
    *                  dependent, so a unique key keeps output deterministic
    * @param nTokensCol token count per row (>= 0)
    * @param capacity  block size in tokens
    * @param partitionCols independent packing domains (empty = global)
    * @return input cols + tok_start, first_block, last_block,
    *         offset_in_block, n_blocks (zero-token rows occupy no block:
    *         they report the block they would start in, spanning it with
    *         n_blocks = 1 and zero length) */
  def packContiguous(
      df: DataFrame, idCol: String, nTokensCol: String, capacity: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // Explicit ROWS frame: the default for an ordered window is RANGE
    // UNBOUNDED PRECEDING..CURRENT ROW, which sums ALL rows tied on idCol
    // together — silently corrupting block spans when idCol is not unique.
    // ROWS gives each row its own running total regardless of ties.
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(nTokensCol).cast("long")
    val start = (sum(n).over(w) - n).as("tok_start")
    df.withColumn("tok_start", start)
      .withColumn("first_block", floor(col("tok_start") / capacity))
      .withColumn("last_block",
        floor((col("tok_start") + greatest(n - 1, lit(0L))) / capacity))
      .withColumn("offset_in_block", col("tok_start") % capacity)
      .withColumn("n_blocks", col("last_block") - col("first_block") + 1)
  }
}
