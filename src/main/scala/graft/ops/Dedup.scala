package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins deduplication — the reference's one real relational operator
  * (quick_stream `remove_upsert_duplicates`, `src/lib.rs:12-16`: sort desc
  * by `modified_date`, keep the first occurrence of each `pkey` — i.e. an
  * arg-max per key).
  *
  * Scale notes (100 TB): the default implementation is a hash aggregate
  * with `max_by` over a `(version, tieBreak...)` ordering struct — ONE
  * shuffle with map-side partial aggregation (each map task pre-reduces to
  * at most one row per key before the exchange). The window/`row_number`
  * form (`latestWinsWindow`) shuffles EVERY input row and then sorts each
  * partition; it is kept only as a semantics cross-check for tests. On a
  * 1000-executor cluster the partial-agg form's shuffle volume is bounded
  * by |distinct keys|, not |rows| — for high-duplication CDC streams that
  * is orders of magnitude less traffic.
  */
object Dedup {

  /** Keep, for every key, the single row with the greatest
    * `(versionCol, tieBreakCols...)` ordering tuple. Ties beyond the
    * tie-break columns are resolved arbitrarily (callers wanting full
    * determinism pass a unique tie-break column, e.g. an event id —
    * the reference leaves this arbitrary-but-stable, `src/lib.rs:12-16`).
    */
  def latestWins(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "latestWins requires at least one key column")
    val ord = struct((versionCol +: tieBreakCols).map(df.col): _*)
    val whole = struct(df.columns.toIndexedSeq.map(df.col): _*)
    df.groupBy(keyCols.map(df.col): _*)
      .agg(max_by(whole, ord).as("__latest"))
      .select("__latest.*")
  }

  /** Reference-shaped variant (sort + keep-first) used to cross-check
    * `latestWins` in tests. Not for the 100 TB path: full shuffle + sort. */
  def latestWinsWindow(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(df.col): _*)
      .orderBy((versionCol +: tieBreakCols).map(c => df.col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
