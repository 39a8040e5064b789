package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus — the lexical sibling of
  * [[Similarity]]'s embedding ANN: given a bag of query terms, return the
  * top-k documents by Okapi BM25 score. Useful standalone (corpus search,
  * eval-set mining) and as the candidate generator feeding a re-ranker.
  *
  * Scale shape (the reason this is NOT "build an inverted index first"):
  * for a FIXED query, only counts of the query terms matter. The corpus
  * is scanned and tokenized EXACTLY ONCE, into ONE aggregation keyed by
  * doc id with a conditional counter per query term — per-doc length and
  * per-term frequencies land in a single O(docs)-row table, with map-side
  * combine and no full-vocabulary key space anywhere. Document
  * frequencies and corpus stats reduce that table to one broadcast row,
  * and scoring is a row-local expression over it: the whole plan is one
  * corpus scan + one doc-keyed shuffle + zero joins. (The four-branch
  * dl/stats/tf/df formulation re-scans the corpus four times — Spark does
  * not reuse identical scan branches across a DAG; measured, not
  * guessed.) Serving MANY ad-hoc queries would amortize differently
  * (materialize postings bucketed by term once; each query is then a
  * broadcast-semi-join); the one-shot path here is the batch-pipeline
  * shape.
  *
  * The result (≤ k rows) is materialized eagerly (localCheckpoint) so the
  * per-doc table can be unpersisted before returning.
  *
  * Determinism: per-term contributions are summed in FIXED query order
  * inside one row-local expression — never in shuffle arrival order — so
  * the double-precision score is bit-stable across runs, partitionings,
  * and engines.
  */
object TextRank {

  /** Top-`k` docs for `queryTerms` by BM25 (Robertson/Sparck Jones idf in
    * the `ln(1 + (N - df + 0.5)/(df + 0.5))` form, always positive).
    * Tokenization = lowercase whitespace split, matching the rest of the
    * text stack. Output: (idCol, score) — score rounded to 8 dp to pin
    * the cross-engine comparison; ties break by ascending id. Docs with
    * no query-term hits are absent (not zero-scored).
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
    // THE one corpus pass: doc length + one conditional counter per query
    // term, in a single doc-keyed aggregation.
    val perTermCounts = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, lit(1L)).otherwise(lit(0L))).as(s"__tf$i")
    }
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("dl"), perTermCounts: _*)
      .persist()
    try {
    // Corpus stats + per-term document frequencies: ONE broadcast row.
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"__tf$i") > 0, lit(1L)).otherwise(lit(0L)))
        .cast("double").as(s"__df$i"))
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +: dfAggs: _*) // exact: integer-valued sums
    // Row-local scoring in fixed term order (0.0 for absent terms — an
    // exact IEEE identity, so the sum equals the hits-only sum).
    def contrib(i: Int): Column = {
      val tf = col(s"__tf$i"); val df = col(s"__df$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      when(tf > 0,
        idf * (tf * (lit(k1) + lit(1.0))) /
          (tf + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    val score = terms.indices.map(contrib).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .where(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col("__id"), score.as("__score"))
      .orderBy(col("__score").desc, col("__id"))
      .limit(k)
      .select(col("__id").as(idCol), round(col("__score"), 8).as("score"))
      .localCheckpoint() // ≤ k rows; lets the per-doc table unpersist below
    } finally { perDoc.unpersist(); () }
  }

  /** Sparse TF-IDF document vectors over a deterministic top-`vocabSize`
    * vocabulary — the classic lexical featurizer bridging the text stack
    * to [[Similarity]]'s vector ops. Vocabulary = the `vocabSize` tokens
    * of highest document frequency (ties broken by token, so the vocab —
    * and every index — is a pure function of the corpus); one output row
    * per (doc, vocab token present in doc):
    * (idCol, term_idx, token, tf, tfidf).
    *
    * Determinism: idf is quantized to fixed point
    * (`floor(ln((N+1)/(df+1)) · 2^20)`, the [[TextAnalysis.LogQ]]
    * convention), so `tfidf = tf · idfq / 2^20` is an exact integer
    * product with an exact power-of-two scale — bit-identical across
    * partitionings and engines (same 1-ulp `ln` caveat as LogQ).
    * N = docs with at least one token.
    *
    * Scale: one corpus scan into the persisted (doc, token, tf) table;
    * document frequencies, corpus size, and the vocab derive from it
    * (top-V via a distributed orderBy+limit — the only windowed rank
    * runs over the V retained rows, never the full vocabulary); scoring
    * is a broadcast join of the O(V) vocab onto the tf table. The result
    * is localCheckpoint-materialized so the tf table unpersists before
    * return — call [[Checkpoints.release]] when done with it. */
  def tfidfSparse(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
      .persist()
    try {
      val dft = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = tf.agg(count_distinct(col(idCol)).as("nd"))
      val topV = dft.orderBy(col("df").desc, col("w")).limit(vocabSize)
      val vocab = topV
        .withColumn("term_idx",
          row_number().over(Window.orderBy(col("df").desc, col("w"))) - 1)
        .crossJoin(broadcast(n))
        .select(col("w"), col("term_idx").cast("long").as("term_idx"),
          floor(log((col("nd") + lit(1.0)) / (col("df") + lit(1L)))
            * lit(TextAnalysis.LogQ)).cast("long").as("idfq"))
      tf.join(broadcast(vocab), "w")
        .select(col(idCol), col("term_idx"), col("w").as("token"),
          col("tf"),
          ((col("tf") * col("idfq")).cast("double") /
            lit(TextAnalysis.LogQ.toDouble)).as("tfidf"))
        .localCheckpoint()
    } finally { tf.unpersist(); () }
  }

  /** Top-k collocations (adjacent word pairs) by pointwise-lift
    * `P(xy) / (P(x)·P(y))` — the statistical phrase detector ("new york"
    * scores high, "of the" does not), the signal behind phrase-merge
    * tokenizer prep and boilerplate discovery. `minPairCount` suppresses
    * the rare-pair degeneracy (a pair seen once between two hapax words
    * has huge lift and zero evidence).
    *
    * Output: (w1, w2, n_pair, score), the k highest-lift pairs, ties by
    * (w1, w2). score = (n_pair · N1²) / (Nb · c(w1) · c(w2)) where N1 =
    * total tokens, Nb = total bigrams — every input an exact integer
    * count (< 2^53), the score ONE fixed-shape float expression per
    * pair, so results are bit-identical across partitionings and
    * engines; no float ever accumulates across rows.
    *
    * Scale: ONE corpus scan — each doc row-locally emits its tokens as
    * (w, NULL) and its adjacent pairs as (w1, w2), and a single
    * (w1, w2)-keyed hash-aggregate (map-side combinable) counts both
    * populations in one shuffle. Unigram totals, bigram totals, and the
    * per-word counts all derive from that persisted aggregate (size =
    * distinct tokens + distinct pairs — the corpus compresses away);
    * scoring joins the pair table to the word counts (AQE broadcasts
    * the word side when it fits) and TakeOrdered keeps k. */
  def topCollocations(
      docs: DataFrame, textCol: String, k: Int,
      minPairCount: Long = 5L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val toks = filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
    val unis = transform(col("__toks"),
      w => struct(w.as("w1"), lit(null).cast("string").as("w2")))
    val bigs = filter(
      zip_with(col("__toks"),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")), lit(1))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    val counts = docs
      .select(toks.as("__toks"))
      .select(explode(concat(unis, bigs)).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val uni = counts.filter(col("w2").isNull)
        .select(col("w1").as("w"), col("c").as("cw"))
      val pair = counts.filter(col("w2").isNotNull &&
        col("c") >= minPairCount)
      val tot = counts.agg(
        sum(when(col("w2").isNull, col("c"))).as("n1"),
        sum(when(col("w2").isNotNull, col("c"))).as("nb"))
      val score =
        (col("c").cast("double") * col("n1").cast("double") *
          col("n1").cast("double")) /
          (col("nb").cast("double") * col("cx").cast("double") *
            col("cy").cast("double"))
      pair
        .join(uni.select(col("w").as("w1"), col("cw").as("cx")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("cy")), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c").as("n_pair"),
          score.as("score"))
        .orderBy(col("score").desc, col("w1"), col("w2")).limit(k)
        .localCheckpoint()
    } finally { counts.unpersist(); () }
  }

  /** Reciprocal-rank fusion — the standard scoreless combiner for hybrid
    * retrieval (lexical BM25 list + dense ANN list, or any N rankers):
    *
    *   rrf(d) = Σ_lists 1 / (kRrf + rank_list(d))
    *
    * Robust because it ignores incomparable score scales and only reads
    * ranks (Cormack et al.'s classic kRrf = 60 default). Input lists each
    * carry (idCol, rankCol) with 1-based ranks and are top-k bounded by
    * construction; ids absent from a list contribute 0.
    *
    * Determinism: each list joins back in FIXED position, so the rrf sum
    * is a fixed-shape left-to-right expression (never a float SUM
    * aggregate over rows — the [[graft.ops.Profile.chiSquare]]
    * discipline), bit-identical across engines.
    *
    * Scale: every list is a bounded top-k, so the id spine and all joins
    * broadcast; cost is O(Σ|lists|) regardless of corpus size. Output:
    * (idCol, rank_0..rank_{n-1} LONG nullable, n_lists, rrf). */
  def rrfFuse(
      lists: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60): DataFrame = {
    require(lists.size >= 2, s"rrfFuse needs >= 2 lists, got ${lists.size}")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    val ids = lists.map(_.select(col(idCol)))
      .reduce(_.unionByName(_)).distinct()
    val joined = lists.zipWithIndex.foldLeft(ids) { case (acc, (l, i)) =>
      acc.join(
        broadcast(l.select(col(idCol),
          col(rankCol).cast("long").as(s"rank_$i"))),
        Seq(idCol), "left_outer")
    }
    val contrib = lists.indices.map(i =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$i").cast("double")),
        lit(0.0)))
    val present = lists.indices.map(i =>
      when(col(s"rank_$i").isNotNull, lit(1L)).otherwise(lit(0L)))
    joined
      .withColumn("n_lists", present.reduce(_ + _))
      .withColumn("rrf", contrib.reduce(_ + _))
  }
}
