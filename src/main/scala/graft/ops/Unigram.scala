package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the other
  * first-class tokenizer-prep algorithm of an LLM data pipeline next to
  * [[Bpe]] (Kudo 2018: subword regularization): pick a seed piece
  * vocabulary from the corpus substring census, then run hard-EM rounds
  * where the E-step Viterbi-segments every word under the current piece
  * costs and the M-step re-estimates costs from the freq-weighted piece
  * usage counts.
  *
  * Scale shape (the same discipline as [[Bpe]]): the corpus collapses to
  * the distributed (word, freq) dict once — one shuffle — and every EM
  * round then touches only the dict: one row-local Viterbi pass plus one
  * piece-keyed aggregate whose output is bounded by the VOCABULARY (≤
  * singles + `multiVocab` rows), so the only driver-side state is the
  * learned model itself. The trained cost table is broadcast back into
  * the row-local DP as a literal map — no per-round join, no driver
  * corpus materialization. Web-scale dicts stay distributed; vocab stays
  * O(100).
  *
  * Determinism (both engines replay bit-for-bit):
  *  - the seed vocab is ALL single chars plus the top-`multiVocab`
  *    multi-char substrings by (census count DESC, piece ASC);
  *  - piece costs are fixed-point BIGINT: costq = -floor(ln((cnt+1)/
  *    (T+V))·2²⁰) — the [[TextAnalysis.LogQ]] convention whose
  *    Spark-log/DuckDB-ln parity the `text_unigram_logprob` gate proves;
  *  - the Viterbi DP packs (cost, piece-length) into ONE BIGINT per
  *    position — cost·4 + (3−L) — so the argmin is a plain integer
  *    `min` with the tie-break "lowest cost, then longest piece" encoded
  *    in the value order; single chars are always in vocab, so every
  *    position is reachable;
  *  - the backtrace is a bounded left fold (≤ len(word) steps).
  *
  * The oracle (`OracleSql.unigramCtes`) replays the whole training run —
  * census, seed costs, every EM round's DP + backtrace + count
  * re-estimation — as a MATERIALIZED CTE chain, the [[Bpe]] pattern one
  * level up in algorithmic weight.
  *
  * Reference scope note: quick-stream (the reference) has no tokenizer
  * surface at all — this is beyond-parity LLM-pipeline capability
  * (SURVEY §2.8), mirroring what SentencePiece's trainer computes with
  * the EM restricted to its deterministic hard (Viterbi) form and a
  * fixed seed vocab (no pruning schedule), which is what makes an exact
  * cross-engine oracle possible.
  */
object Unigram {

  /** Max piece length. 3 keeps the census O(3·chars) per word and the
    * DP fan-in constant; raising it widens both linearly. */
  val MaxPieceLen = 3

  private val Q = TextAnalysis.LogQ

  /** Viterbi DP over one word under literal cost map `cmap`:
    * dp(i) = min over L∈[1,3], piece=w[i−L..i) ∈ vocab of
    * (dp(i−L).cost + costq(piece))·4 + (3−L), dp(0) = 3 (cost 0).
    * `size(acc)` IS the position being filled (seed holds position 0),
    * so no index var threads through the fold. Integer ops only:
    * shiftright/bitwiseAND decode, shiftleft re-encode. */
  private def dpCol(w: Column, cmap: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(lit(3L)),
      (acc, _) => {
        val i = size(acc)
        val cands = transform(sequence(lit(1), lit(MaxPieceLen)), L => {
          val j = i - L
          val c = element_at(cmap, w.substr(j + lit(1), L))
          when(j >= 0 && c.isNotNull,
            shiftleft(shiftright(element_at(acc, j + 1), 2) + c, 2) +
              (lit(3) - L).cast("long"))
        })
        concat(acc, array(array_min(filter(cands, x => x.isNotNull))))
      })

  /** Backtrace of [[dpCol]]'s packed array: walk pos ← pos − L with
    * L = 3 − (dp(pos) & 3), collecting pieces; at most len(word) steps,
    * no-op once pos hits 0. Emits the pieces (order irrelevant — only
    * counts and sizes are consumed). */
  private def piecesCol(w: Column, dp: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).cast("int").as("pos"),
        array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val l = (lit(3L) - element_at(dp, pos + 1).bitwiseAND(lit(3L)))
          .cast("int")
        when(pos === 0, acc).otherwise(
          struct((pos - l).as("pos"),
            concat(acc.getField("ps"),
              array(w.substr(pos - l + lit(1), l))).as("ps")))
      },
      acc => acc.getField("ps"))

  private def costqOf(cnt: Long, t: Long, v: Long): Long =
    -math.floor(math.log((cnt + 1).toDouble / (t + v).toDouble) * Q).toLong

  private def cmapLit(costs: Seq[(String, Long)]): Column =
    map(costs.flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)

  /** One segmentation pass of the dict under `costs`: (w, freq, pieces).
    * dp is materialized as its own aliased column before the backtrace
    * references it (multiply-referenced non-cheap alias — CollapseProject
    * keeps the stage split; see the NearDup evaluation-shape note). */
  private def segment(dict: DataFrame, costs: Seq[(String, Long)]): DataFrame =
    dict.select(col("w"), col("freq"),
        dpCol(col("w"), cmapLit(costs)).as("dp"))
      .select(col("w"), col("freq"),
        piecesCol(col("w"), col("dp")).as("pieces"))

  /** The full training run. Returns (dict live localCheckpoint — caller
    * frees, final per-piece counts, final costs), counts/costs sorted by
    * piece for deterministic literal-map order. */
  private def trained(docs: DataFrame, textCol: String, multiVocab: Int,
      rounds: Int): (DataFrame, Map[String, Long], Seq[(String, Long)]) = {
    require(multiVocab >= 0 && rounds >= 1,
      s"need multiVocab >= 0 and rounds >= 1, got $multiVocab/$rounds")
    val dict = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    // Substring census (freq-weighted, multiplicity counts): one
    // row-local expansion + one piece-keyed aggregate.
    val census = dict.select(
        explode(flatten(transform(sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1),
              least(lit(MaxPieceLen), length(col("w")) - i + 1)),
            L => col("w").substr(i, L))))).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    // Seed vocab: all single chars + top-`multiVocab` multi-char pieces.
    // BOUNDED collects: O(alphabet) + O(multiVocab) rows — the learned
    // model is the only driver-side state, as with Bpe's merge list.
    val singles = census.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = census.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(multiVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val vocab = (singles ++ multis).sortBy(_._1)
    val vs = vocab.size.toLong
    val t0 = vocab.map(_._2).sum
    var costs: Seq[(String, Long)] =
      vocab.map { case (p, c) => p -> costqOf(c, t0, vs) }
    var counts: Map[String, Long] = Map.empty
    (1 to rounds).foreach { _ =>
      val used = segment(dict, costs)
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts = vocab.map { case (p, _) => p -> used.getOrElse(p, 0L) }.toMap
      val t = counts.valuesIterator.sum
      costs = vocab.map { case (p, _) => p -> costqOf(counts(p), t, vs) }
    }
    (dict, counts, costs)
  }

  /** Train the tokenizer and emit the learned model: one row per piece
    * actually used in the final EM round — (piece, n_uses, costq) with
    * n_uses the freq-weighted usage count and costq the resulting
    * fixed-point cost. */
  def train(docs: DataFrame, textCol: String, multiVocab: Int = 64,
      rounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (dict, counts, costs) = trained(docs, textCol, multiVocab, rounds)
    org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict)
    val cq = costs.toMap
    counts.toSeq.filter(_._2 > 0L).sortBy(_._1)
      .map { case (p, n) => (p, n, cq(p)) }
      .toDF("piece", "n_uses", "costq")
  }

  /** Train, PRUNE, refit — the vocabulary-shrink step of the
    * SentencePiece schedule [[train]] deliberately omits: after the EM
    * rounds, keep every single char plus only the top-`keepMulti`
    * multi-char pieces by final-round usage (cnt DESC, piece ASC —
    * the seed-vocab tie-break), renormalize costs over the kept vocab
    * (same costq formula, pruned totals), run ONE more EM round under
    * the pruned costs, and emit the refit model (piece, n_uses,
    * costq). Distribution shape is unchanged — the prune itself is
    * driver-local arithmetic on the O(vocab) learned state; the refit
    * round is the same one dict pass + piece-keyed aggregate. */
  def trainPruned(docs: DataFrame, textCol: String, multiVocab: Int = 64,
      rounds: Int = 2, keepMulti: Int = 32): DataFrame = {
    require(keepMulti >= 0, s"keepMulti must be >= 0, got $keepMulti")
    val spark = docs.sparkSession
    import spark.implicits._
    val (dict, counts, _) = trained(docs, textCol, multiVocab, rounds)
    try {
      val singles = counts.toSeq.filter(_._1.length == 1)
      val multis = counts.toSeq.filter(_._1.length >= 2)
        .sortBy { case (p, c) => (-c, p) }.take(keepMulti)
      val kept = (singles ++ multis).sortBy(_._1)
      val vsP = kept.size.toLong
      val tP = kept.map(_._2).sum
      val costsP = kept.map { case (p, c) => p -> costqOf(c, tP, vsP) }
      val used = segment(dict, costsP)
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val countsP = kept.map { case (p, _) => p -> used.getOrElse(p, 0L) }
      val tF = countsP.map(_._2).sum
      val costsF = countsP
        .map { case (p, c) => p -> costqOf(c, tF, vsP) }.toMap
      countsP.filter(_._2 > 0L).sortBy(_._1)
        .map { case (p, n) => (p, n, costsF(p)) }
        .toDF("piece", "n_uses", "costq")
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict); ()
    }
  }

  /** Train, then tokenize: per-doc (n_words, n_tokens) under one final
    * Viterbi pass with the trained costs — the tokens-per-word
    * compression diagnostic, [[Bpe.encodeTokenCounts]]'s twin. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      multiVocab: Int = 64, rounds: Int = 2): DataFrame = {
    val (dict, _, costs) = trained(docs, textCol, multiVocab, rounds)
    try {
      val sizes = segment(dict, costs)
        .select(col("w"), size(col("pieces")).cast("long").as("__n"))
      docs.select(col(idCol),
          explode(filter(split(lower(col(textCol)), "\\s+"),
            w => w =!= "")).as("w"))
        .join(sizes, "w")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_tokens"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict); ()
    }
  }
}
