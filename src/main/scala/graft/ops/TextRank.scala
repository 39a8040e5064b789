package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus — the lexical sibling of
  * [[Similarity]]'s embedding ANN: given a bag of query terms, return the
  * top-k documents by Okapi BM25 score. Useful standalone (corpus search,
  * eval-set mining) and as the candidate generator feeding a re-ranker.
  *
  * Scale shape (the reason this is NOT "build an inverted index first"):
  * for a FIXED query, only postings of the query terms matter. The plan
  * filters the token stream to the query vocabulary BEFORE any (doc, term)
  * aggregation, so the expensive full-vocabulary term-frequency shuffle
  * never happens — the corpus pays one per-doc length aggregation
  * (map-side combined, O(docs) output) plus one aggregation over
  * query-term hits only. Document frequencies and corpus stats are
  * single-row/handful-row aggregates, broadcast to the scoring join; the
  * only data-sized shuffle is keyed by doc id. Serving MANY ad-hoc queries
  * would amortize differently (materialize `(term, doc, tf)` postings
  * bucketed by term once, then each query is a broadcast-semi-join); the
  * one-shot path here is the batch-pipeline shape.
  *
  * Determinism: per-term contributions are summed in FIXED query order
  * (one conditional aggregate per term — each over at most one row per
  * doc), not in shuffle arrival order, so the double-precision score is
  * bit-stable across runs, partitionings, and engines.
  */
object TextRank {

  /** Top-`k` docs for `queryTerms` by BM25 (Robertson/Sparck Jones idf in
    * the `ln(1 + (N - df + 0.5)/(df + 0.5))` form, always positive).
    * Tokenization = lowercase whitespace split, matching the rest of the
    * text stack. Output: (idCol, score) — score rounded to 8 dp to pin
    * the cross-engine comparison; ties break by ascending id.
    *
    * @param k1 term-frequency saturation (default 1.2)
    * @param b  length normalization strength (default 0.75) */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    require(queryTerms.map(_.toLowerCase).distinct.size == queryTerms.size,
      "queryTerms must be distinct (after lowercasing)")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.map(_.toLowerCase)
    val toks = docs
      .select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // Per-doc length: the only full-corpus aggregation in the plan.
    val dl = toks.groupBy("__id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")) // exact: integer-valued double sums
    // Query-vocabulary postings only — filtered BEFORE the (doc, term)
    // aggregation, so no full-vocab shuffle exists anywhere.
    val qtf = toks.filter(col("term").isin(terms: _*))
      .groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val contrib: Column = {
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      idf * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    }
    val scored = qtf
      .join(dl, "__id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("term"), contrib.as("contrib"))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("contrib"))).as(s"__c$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy("__id").agg(perTerm.head, perTerm.tail: _*)
      .select(col("__id"), score.as("__score"))
      .orderBy(col("__score").desc, col("__id"))
      .limit(k)
      .select(col("__id").as(idCol), round(col("__score"), 8).as("score"))
  }
}
