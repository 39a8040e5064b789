package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-prep step of an LLM
  * data pipeline, run where the data lives instead of sampling it out:
  * learn the top-N merge rules from the full corpus word distribution.
  *
  * Classic BPE (Sennrich et al.): start from characters, repeatedly count
  * adjacent symbol pairs over the word-frequency dictionary and merge the
  * most frequent pair. The dictionary formulation is what makes this
  * tractable at 100 TB: the corpus collapses to (word, freq) once — one
  * shuffle — and every iteration then touches only the dict, which stays
  * DISTRIBUTED (web-scale noisy text has billions of distinct words; no
  * driver-side vocab assumption). Per iteration: one pair-keyed
  * hash-aggregate weighted by freq (map-side combinable), a TakeOrdered-1
  * argmax, and a row-local greedy merge fold rewriting each word's symbol
  * list — the driver only ever holds the learned (a, b) pairs.
  *
  * Determinism: counts are exact integers, the argmax tie-breaks by
  * (count DESC, a ASC, b ASC), and the merge fold is the standard greedy
  * left-to-right non-overlapping scan — a DuckDB CTE chain
  * (`OracleSql.bpeCtes`) reproduces the whole training run rule-for-rule.
  *
  * Lineage: each iteration's rewritten dict is localCheckpointed (same
  * discipline as [[Components]]) — 10 merges would otherwise stack 10
  * nested HOF rewrites into one plan.
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (a, b) into a+b over a symbol
    * array — BPE's merge step: scan once, never re-merging the symbol
    * just produced (matching the reference algorithm and the DuckDB
    * list_reduce mirror). */
  private def mergeFold(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent symbol pairs of a symbol array as (a, b) structs. */
  private def pairsOf(sym: Column): Column =
    filter(
      zip_with(sym, slice(sym, lit(2), greatest(size(sym), lit(1))),
        (x, y) => struct(x.as("a"), y.as("b"))),
      p => p.getField("b").isNotNull)

  /** Learn `merges` BPE merge rules from the corpus. Tokenization is the
    * text stack's lowercase-whitespace split; words start as character
    * sequences. Output: (rank, sym_a, sym_b, n_occ) — merge `rank` joins
    * `sym_a`+`sym_b`, which co-occurred adjacently `n_occ` times
    * (frequency-weighted) at the time it was chosen. Fewer than `merges`
    * rows come back only when the dict runs out of adjacent pairs. */
  def learnMerges(
      docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (dict, picked) = trained(docs, textCol, merges)
    org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict)
    picked.toDF("rank", "sym_a", "sym_b", "n_occ")
  }

  /** Apply a fresh training run and tokenize: per-doc BPE token counts
    * under the `merges` learned rules. Output: (idCol, n_words,
    * n_bpe_tokens) — the compression diagnostic (tokens-per-word) a
    * tokenizer sweep reads, computed by joining each doc's words onto
    * the trained dict (word-keyed shuffle; the dict side carries one row
    * per distinct word). */
  def encodeTokenCounts(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame = {
    val (dict, _) = trained(docs, textCol, merges)
    try {
      val words = docs.select(col(idCol),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          w => w =!= "")).as("w"))
      words
        .join(dict.select(col("w"),
          size(col("syms")).cast("long").as("__n")), "w")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe_tokens"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict); ()
    }
  }

  /** The training loop: returns the final (w, syms, freq) dict (live
    * localCheckpoint — caller frees) and the picked merges. */
  private def trained(
      docs: DataFrame, textCol: String,
      merges: Int): (DataFrame, Seq[(Long, String, String, Long)]) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    var dict = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"),
        col("freq"))
      .localCheckpoint()
    val picked = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= merges && !dry) {
      val top = dict
        .select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
        .as[(String, String, Long)].collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, cnt) = top(0)
        picked += ((r.toLong, a, b, cnt))
        val next = dict
          .withColumn("syms", mergeFold(col("syms"), a, b))
          .localCheckpoint()
        org.apache.spark.sql.GraftSql.freeLocalCheckpoint(dict)
        dict = next
        r += 1
      }
    }
    (dict, picked.result())
  }
}
