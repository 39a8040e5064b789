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

  /** Field-level survivorship — the golden record per duplicate cluster:
    * where [[latestWins]] keeps ONE member whole, MDM survivorship
    * composes the best value of EACH field from different members (the
    * longest content, the earliest id, the union of tags). Emits one
    * golden row per cluster:
    * (clusterCol, golden_id, golden_len, first_id, n_members, total_len,
    * tags).
    *
    * Rules (the standard trio, each a deterministic aggregate):
    *  - content: the member with max `lenCol` (id ASC ties) donates
    *    golden_id/golden_len — max_by over a (len, −id) struct;
    *  - provenance: first_id = min id (the earliest capture);
    *  - tags: sorted-distinct union of `tagCol`, one joined string.
    *
    * Scale: ONE hash aggregate keyed by cluster, fully map-side
    * combinable (collect_set is bounded by the tag vocabulary, not the
    * cluster size). No windows, no joins. */
  def survivorship(
      df: DataFrame, clusterCol: String, idCol: String, lenCol: String,
      tagCol: String): DataFrame =
    df.groupBy(col(clusterCol))
      .agg(
        max_by(struct(col(idCol).as("__id"), col(lenCol).as("__len")),
          struct(col(lenCol), (-col(idCol)).as("__nid"))).as("__best"),
        min(col(idCol)).as("first_id"),
        count(lit(1)).as("n_members"),
        sum(col(lenCol)).as("total_len"),
        array_join(array_sort(collect_set(col(tagCol))), ",").as("tags"))
      .select(col(clusterCol), col("__best.__id").as("golden_id"),
        col("__best.__len").as("golden_len"), col("first_id"),
        col("n_members"), col("total_len"), col("tags"))
}
