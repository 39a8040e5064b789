package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published corpus-quality filter rule sets — the document-level
  * heuristics every web-scale LLM pretraining pipeline runs before
  * dedup (Gopher, Rae et al. 2021, Table A1; C4, Raffel et al. 2020,
  * §2.2). Re-expressed as integer-exact declarative predicates: every
  * ratio threshold is cross-multiplied (10·n_sym ≤ n_words instead of
  * n_sym/n_words ≤ 0.1) so the gates compare BIGINTs, never floats.
  *
  * Scale shape: both operators are row-local over the document text
  * (one projection; C4 explodes lines then re-aggregates doc-keyed) —
  * no shuffle beyond the per-doc regroup, trivially partitionable at
  * 100 TB. */
object CorpusFilters {

  /** The Gopher stopword-presence list (rule: a clean document
    * contains at least MinStopwords distinct entries). */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val MinStopwords = 2

  private def tokens(txt: Column): Column =
    filter(split(txt, "[ \n]"), w => length(w) > 0)

  /** Gopher quality rules per document, integer-exact:
    *  r_word_count    50 ≤ n_words ≤ 100000
    *  r_mean_wlen     3 ≤ mean word length ≤ 10   (cross-multiplied)
    *  r_symbol_ratio  (#'#' + #'...') / n_words ≤ 0.1
    *  r_bullet        ≤ 90% of lines start with "- "
    *  r_ellipsis      ≤ 30% of lines end with "..."
    *  r_alpha_words   ≥ 80% of words contain an alphabetic char
    *  r_stopwords     ≥ 2 distinct stopwords present
    * Emits the per-rule flags (INT 0/1) plus gopher_keep = AND of all. */
  def gopherQuality(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val txt = col(textCol)
    val base = docs.select(
      col(idCol),
      size(tokens(txt)).cast("long").as("n_words"),
      length(translate(txt, " \n", "")).cast("long").as("sum_word_chars"),
      size(split(txt, "\n")).cast("long").as("n_lines"),
      (length(txt) - length(translate(txt, "#", ""))).cast("long")
        .as("n_hash"),
      (((length(txt) - length(replace(txt, lit("..."), lit("")))) / 3))
        .cast("long").as("n_ellipsis"),
      size(filter(split(txt, "\n"), l => l.startsWith("- "))).cast("long")
        .as("n_bullet_lines"),
      size(filter(split(txt, "\n"), l => l.endsWith("..."))).cast("long")
        .as("n_ellipsis_lines"),
      size(filter(tokens(txt), w => w.rlike("[a-zA-Z]"))).cast("long")
        .as("n_alpha_words"),
      Stopwords.map(sw =>
        when(array_contains(tokens(txt), sw), 1L).otherwise(0L))
        .reduce(_ + _).as("n_stopwords"))
    val flags = base
      .withColumn("r_word_count",
        (col("n_words") >= 50L && col("n_words") <= 100000L).cast("int"))
      .withColumn("r_mean_wlen",
        (col("sum_word_chars") >= lit(3L) * col("n_words") &&
          col("sum_word_chars") <= lit(10L) * col("n_words")).cast("int"))
      .withColumn("r_symbol_ratio",
        (lit(10L) * (col("n_hash") + col("n_ellipsis")) <= col("n_words"))
          .cast("int"))
      .withColumn("r_bullet",
        (lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
          .cast("int"))
      .withColumn("r_ellipsis",
        (lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
          .cast("int"))
      .withColumn("r_alpha_words",
        (lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words"))
          .cast("int"))
      .withColumn("r_stopwords",
        (col("n_stopwords") >= MinStopwords.toLong).cast("int"))
    flags.withColumn("gopher_keep",
      (col("r_word_count") === 1 && col("r_mean_wlen") === 1 &&
        col("r_symbol_ratio") === 1 && col("r_bullet") === 1 &&
        col("r_ellipsis") === 1 && col("r_alpha_words") === 1 &&
        col("r_stopwords") === 1).cast("int"))
      .drop("sum_word_chars", "n_hash", "n_ellipsis", "n_bullet_lines",
        "n_ellipsis_lines", "n_alpha_words", "n_stopwords")
  }

  /** C4 line-level cleaning per document: a line is KEPT iff it ends in
    * terminal punctuation (. ! ? "), has ≥ 5 whitespace tokens, and
    * does not contain "javascript" (case-folded); the whole document is
    * dropped if it contains "lorem ipsum" or "{", or has fewer than 3
    * sentence terminators. Emits per doc (n_lines, n_lines_kept,
    * n_sentences, kept_chars, c4_keep). */
  def c4LineFilter(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val txt = col(textCol)
    val lines = docs.select(
      col(idCol),
      (length(txt) - length(translate(txt, ".!?", ""))).cast("long")
        .as("n_sentences"),
      (txt.contains("lorem ipsum") || txt.contains("{")).as("doc_banned"),
      explode(split(txt, "\n")).as("line"))
    val flagged = lines.withColumn("kept",
      (col("line").endsWith(".") || col("line").endsWith("!") ||
        col("line").endsWith("?") || col("line").endsWith("\"")) &&
        size(filter(split(col("line"), " "), w => length(w) > 0)) >= 5 &&
        !lower(col("line")).contains("javascript"))
    flagged.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("kept").cast("long")).as("n_lines_kept"),
        max(col("n_sentences")).as("n_sentences"),
        coalesce(sum(when(col("kept"), length(col("line")).cast("long"))),
          lit(0L)).as("kept_chars"),
        max(col("doc_banned")).as("_banned"))
      .withColumn("c4_keep",
        (col("n_sentences") >= 3L && !col("_banned")).cast("int"))
      .drop("_banned")
  }
}
