package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative restatement of the reference's fixed-arity batch splitting
  * (quick_stream `split_vec`, `src/lib.rs:49-58`: greedy chunks of 100,
  * then 10, then one remainder chunk of arity 1–9, matching its
  * prepared-statement sizes `{1..10, 100}`).
  *
  * As execution the mechanism is a non-goal on Spark (dynamic batch sizes,
  * no prepared-statement arity), but the chunk-plan arithmetic is part of
  * the reference's observable behavior, so it is exposed as a query:
  * given per-group record counts, how many chunks of each arity would the
  * reference dispatch. Pure hash-aggregate — one shuffle, map-side combine.
  */
object BatchSplit {

  def chunkPlan(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val cnt = count(lit(1))
    val hundreds = floor(cnt / 100)
    val tens = floor((cnt % 100) / 10)
    val rem = cnt % 10
    df.groupBy(groupCols.map(df.col): _*)
      .agg(
        cnt.cast("long").as("n_records"),
        hundreds.cast("long").as("n_hundred_chunks"),
        tens.cast("long").as("n_ten_chunks"),
        rem.cast("long").as("remainder_arity"),
        (hundreds + tens + when(rem > 0, 1).otherwise(0)).cast("long").as("n_chunks"))
  }
}
