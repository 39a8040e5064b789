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

  /** Fellegi-Sunter probabilistic record linkage over sorted-
    * neighborhood candidate pairs — the principled upgrade from
    * single-threshold fuzzy matching: each comparison field j carries a
    * log-likelihood-ratio weight (log₂(m_j/u_j) on agreement,
    * log₂((1−m_j)/(1−u_j)) on disagreement, with m = P(agree | same
    * entity) and u = P(agree | different entities) supplied as
    * calibrated priors), and a pair's match score is the SUM of its
    * field weights — so one strong field can outvote two weak ones,
    * which a conjunctive rule can't express. Fields compared here:
    * source equality, length agreement within `lenTol`, and title
    * similarity (Jaro-Winkler ≥ `jwThreshold`). Output, bounded to
    * score ≥ 0 (the non-match mass is the corpus):
    * (doc_a, doc_b, agree_source, agree_len, agree_title, score,
    * decision) with decision match / possible split at `matchCutoff`.
    *
    * Determinism: the three (m,u) pairs become SIX double literals
    * computed once in Scala and injected verbatim into both engines'
    * plans — no runtime log anywhere — and the score is a fixed
    * left-to-right sum of three literals picked by exact boolean
    * agreements (Jaro-Winkler itself is the bit-deterministic shared
    * kernel). Scale: identical shape to the sorted-neighborhood pass —
    * one window sort per block + a window-bounded equi-join; the
    * scoring is row-local arithmetic on O(candidates). */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      titleCol: String, sourceCol: String, lenCol: String,
      window: Int = 3, lenTol: Long = 16L, jwThreshold: Double = 0.9,
      matchCutoff: Double = 4.0,
      mU: Seq[(Double, Double)] =
        Seq((0.9, 0.25), (0.85, 0.1), (0.95, 0.02))): DataFrame = {
    require(mU.size == 3, s"exactly 3 field (m,u) priors, got ${mU.size}")
    val w = mU.map { case (m, u) =>
      (math.log(m / u) / math.log(2.0),
        math.log((1.0 - m) / (1.0 - u)) / math.log(2.0))
    }
    val ranked = df.select(col(idCol).as("__id"),
        col(blockCol).as("__blk"), col(titleCol).as("__t"),
        col(sourceCol).as("__src"), col(lenCol).cast("long").as("__len"))
      .withColumn("__rnk", row_number().over(Window
        .partitionBy(col("__blk"))
        .orderBy(col("__t").asc, col("__id").asc)))
    val right = ranked.select(col("__blk"), col("__id").as("doc_b"),
      col("__t").as("__tb"), col("__src").as("__srcb"),
      col("__len").as("__lenb"), col("__rnk").as("__rb"))
    val pairs = ranked
      .select(col("__blk"), col("__id").as("doc_a"), col("__t").as("__ta"),
        col("__src").as("__srca"), col("__len").as("__lena"),
        explode(array((1 to window).map(col("__rnk") + _): _*)).as("__rb"))
      .join(right, Seq("__blk", "__rb"))
    val agrees = Seq(
      col("__srca") === col("__srcb"),
      abs(col("__lena") - col("__lenb")) <= lenTol,
      graft.functions.TextHash.jaroWinkler(col("__ta"), col("__tb")) >=
        jwThreshold)
    val score = agrees.zip(w).foldLeft(lit(0.0)) {
      case (acc, (a, (aw, dw))) => acc + when(a, lit(aw)).otherwise(lit(dw))
    }
    pairs
      .withColumn("agree_source", when(agrees(0), 1L).otherwise(0L))
      .withColumn("agree_len", when(agrees(1), 1L).otherwise(0L))
      .withColumn("agree_title", when(agrees(2), 1L).otherwise(0L))
      .withColumn("score", score)
      .filter(col("score") >= 0.0)
      .select(col("doc_a"), col("doc_b"), col("agree_source"),
        col("agree_len"), col("agree_title"), col("score"),
        when(col("score") >= matchCutoff, lit("match"))
          .otherwise(lit("possible")).as("decision"))
  }
}
