package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Text-analysis operators for training-data pipelines: language ID,
  * token-class counting, and document fingerprinting. All row-local
  * (regexp + array folds over codegen'd built-ins): at 100 TB these are
  * pure map stages — no shuffle, linear scaling, parquet column pruning
  * reaches the scan because each uses only the text column.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram-free heuristic language classifier.
    * Order matters: ties resolve to the FIRST language in this list whose
    * score equals the max (deterministic, mirrored by the oracle SQL). */
  val LangProfiles: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit)\\b",
    "en" -> "\\b(the|a|of|and|is|not|to|in)\\b",
    "es" -> "\\b(el|los|las|y|es|no|un|con)\\b",
    "fr" -> "\\b(le|la|les|et|est|pas|un|avec)\\b")

  /** Heuristic language ID: per-language stopword hit counts, argmax with
    * first-wins tie-break. Emits (id, per-lang scores, pred_lang). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scores = LangProfiles.map { case (lang, re) =>
      lang -> regexp_count(col(textCol), lit(re)).cast("long")
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.init.foldRight(lit(scores.last._1): Column) {
      case ((lang, s), rest) => when(s === best, lang).otherwise(rest)
    }
    docs.select(
      col(idCol) +:
        scores.map { case (lang, s) => s.as(s"score_$lang") } :+
        pred.as("pred_lang"): _*)
  }

  /** Token counting with a BPE-style pre-tokenizer split: alphabetic runs,
    * single digits, non-space punctuation — the regex classes a byte-pair
    * tokenizer would see. Whitespace-token count included for comparison
    * with the plain split. */
  def tokenClasses(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val alpha = regexp_count(t, lit("[A-Za-z]+")).cast("long")
    val digit = regexp_count(t, lit("[0-9]")).cast("long")
    val punct = regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("long")
    docs.select(
      col(idCol),
      alpha.as("n_alpha_tokens"),
      digit.as("n_digit_tokens"),
      punct.as("n_punct_tokens"),
      (alpha + digit + punct).as("n_bpe_tokens"))
  }

  /** Source-code detection — the prose-vs-code router an LLM data
    * pipeline needs before language ID, quality scoring, or dedup
    * shingling (code tokenizes, dedups, and scores like noise under
    * prose heuristics): exact integer counts of code-shaped surface
    * features (braces, semicolons, assignment ops, indented lines,
    * language keywords) and a PINNED linear score
    * 3·keywords + 2·braces + 2·semicolons + indented, with
    * `is_code` = score ≥ 8 (the documented operating point; callers
    * needing a different precision/recall trade re-threshold the
    * emitted score). Every count is one RE2-replayable regexp —
    * word-boundary keyword hits, (?m)-anchored indent lines — so the
    * oracle replays the whole feature vector. Row-local, codegen'd. */
  def codeDetect(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val braces = regexp_count(t, lit("[{}]")).cast("long")
    val semis = regexp_count(t, lit(";")).cast("long")
    val kws = regexp_count(t, lit(
      "\\b(def|class|import|return|function|var|const|void|public)\\b"))
      .cast("long")
    val indented = regexp_count(t, lit("(?m)^(    |\\t)")).cast("long")
    val score = lit(3L) * kws + lit(2L) * braces + lit(2L) * semis +
      indented
    docs.select(
      col(idCol),
      (regexp_count(t, lit("\n")) + 1L).cast("long").as("n_lines"),
      braces.as("n_braces"), semis.as("n_semicolons"),
      kws.as("n_keyword_hits"), indented.as("n_indented_lines"),
      score.as("code_score"),
      (score >= 8L).as("is_code"))
  }

  /** Markdown-to-visible-text rewrite steps — ONE shared table folded
    * by both the Spark chain ([[markdownStrip]]) and the DuckDB oracle
    * ([[markdownStripSql]]), the [[graft.functions.Nysiis]] discipline:
    * a rule change edits exactly one Seq. Replacement `<1>` means
    * "group 1" and is translated per dialect (`$1` Java, `\1` RE2);
    * patterns are RE2-safe (inline (?s)/(?m) flags, no backrefs, no
    * lookaround). Order matters: fences before inline code, images
    * before links (the leading `!` would otherwise leave a bang). */
  val MarkdownSteps: Seq[(String, String)] = Seq(
    "(?s)```.*?```" -> " ",
    "`([^`]*)`" -> "<1>",
    "!\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "<1>",
    "\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "<1>",
    "(?m)^#{1,6}[ \\t]+" -> "",
    "(?m)^[ \\t]*[-*+][ \\t]+" -> "",
    "(?m)^[ \\t]*[0-9]+\\.[ \\t]+" -> "",
    "(?m)^>[ \\t]?" -> "",
    "\\*\\*([^*]+)\\*\\*" -> "<1>",
    "\\*([^*]+)\\*" -> "<1>",
    "__([^_]+)__" -> "<1>",
    "_([^_]+)_" -> "<1>",
    "(?m)^[-=]{3,}[ \\t]*$" -> "")

  /** Markdown corpus cleanup — strip structure, keep the prose (the
    * pre-tokenization step for markdown-heavy crawls; README/doc dumps
    * tokenized raw waste context on syntax and skew dedup shingles):
    * fold [[MarkdownSteps]], then collapse whitespace and trim. Also
    * emits the structure census (links, images, code spans, headings)
    * counted on the ORIGINAL text — the "how markdown-y was this doc"
    * signal a mixture sampler keys on. Row-local regexp chain,
    * codegen'd, no shuffle. Output: (id, text_plain, n_chars_in,
    * n_chars_out, n_links, n_images, n_code_spans, n_headings). */
  def markdownStrip(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val chain = MarkdownSteps.foldLeft(t) { case (c, (p, r)) =>
      regexp_replace(c, p, r.replace("<1>", "$1"))
    }
    val plain = trim(regexp_replace(chain, "\\s+", " "))
    docs.select(
      col(idCol),
      plain.as("text_plain"),
      length(t).cast("long").as("n_chars_in"),
      length(plain).cast("long").as("n_chars_out"),
      // links = bracket-paren pairs minus the image subset — RE2 has no
      // lookbehind, so the oracle-replayable form is the subtraction
      (regexp_count(t, lit("\\[([^\\]]*)\\]\\(")) -
        regexp_count(t, lit("!\\[([^\\]]*)\\]\\("))).cast("long")
        .as("n_links"),
      regexp_count(t, lit("!\\[([^\\]]*)\\]\\(")).cast("long")
        .as("n_images"),
      // inline spans counted on the fence-stripped text — the interior
      // of a ``` fence would otherwise read as one giant inline span
      regexp_count(regexp_replace(t, "(?s)```.*?```", " "),
        lit("`[^`]+`")).cast("long").as("n_code_spans"),
      regexp_count(t, lit("(?m)^#{1,6}[ \\t]+")).cast("long")
        .as("n_headings"))
  }

  /** DuckDB twin of [[markdownStrip]]'s rewrite chain over SQL
    * expression `in` (counts are written inline by the oracle). */
  def markdownStripSql(in: String): String = {
    val chain = MarkdownSteps.foldLeft(in) { case (e, (p, r)) =>
      s"regexp_replace($e, '$p', '${r.replace("<1>", "\\1")}', 'g')"
    }
    s"trim(regexp_replace($chain, '\\s+', ' ', 'g'))"
  }

  /** Unicode SCRIPT profile — the writing-system census a multilingual
    * corpus filter keys on ("mostly-CJK doc labeled `en`" and "Cyrillic
    * homoglyph spam inside Latin text" both fall out of these counts):
    * per doc, the number of UTF-16 units in each of the major BMP
    * script ranges (Latin letters, Cyrillic U+0400–04FF, CJK Unified
    * U+4E00–9FFF, Greek U+0370–03FF), plus digits, whitespace, and the
    * remainder. Counts are computed as `length − length(strip(range))`
    * — one regexp pass per class, codegen'd, row-local, no shuffle.
    * All counted ranges are BMP-only, so Spark's UTF-16 `length` and an
    * oracle's codepoint `length` agree exactly (a supplementary-plane
    * census would need codepoint-aware counting on the Spark side).
    * Output: (id, n_units, n_latin, n_cyrillic, n_cjk, n_greek,
    * n_digit, n_space, n_other). */
  def scriptProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(lo: Char, hi: Char): Column =
      (length(t) - length(regexp_replace(t, s"[$lo-$hi]", ""))).cast("long")
    val latin = (length(t) -
      length(regexp_replace(t, "[A-Za-z]", ""))).cast("long")
    val cyr = cnt('Ѐ', 'ӿ')
    val cjk = cnt('一', '鿿')
    val greek = cnt('Ͱ', 'Ͽ')
    val digit = (length(t) -
      length(regexp_replace(t, "[0-9]", ""))).cast("long")
    val space = (length(t) -
      length(regexp_replace(t, "\\s", ""))).cast("long")
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_units"),
      latin.as("n_latin"), cyr.as("n_cyrillic"), cjk.as("n_cjk"),
      greek.as("n_greek"), digit.as("n_digit"), space.as("n_space"),
      (length(t).cast("long") - latin - cyr - cjk - greek - digit - space)
        .as("n_other"))
  }

  /** Text normalization for training corpora: lowercase, collapse all
    * whitespace runs to single spaces, trim, and strip control chars —
    * the canonical pre-dedup cleanup (dedup keyed on raw text misses
    * trivially-reformatted copies). Row-local; emits the normalized text
    * plus the pre/post lengths for shrinkage accounting. */
  def normalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[\\x00-\\x1f]", " "),
      "\\s+", " "))
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars_in"),
      cleaned.as("text_norm"),
      length(cleaned).cast("long").as("n_chars_norm"))
  }

  /** Conservative RE2-compatible patterns (work identically in Java regex
    * and DuckDB's RE2): no backrefs, no lookarounds. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongNumRe = "[0-9][0-9 ()+.-]{6,}[0-9]"

  /** PII redaction: mask emails, URLs, and long number runs (phone/card
    * shapes) with typed placeholder tokens, counting each — the standard
    * scrub pass before corpus publication. Patterns are deliberately in
    * the RE2 ∩ Java-regex subset so the oracle applies the SAME regexes.
    * Order matters and is fixed: emails first (an email contains no
    * masked URL), then URLs, then number runs. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, UrlRe, "<URL>")
    docs.select(
      col(idCol),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(t2, lit(LongNumRe)).cast("long").as("n_numbers"),
      regexp_replace(t2, LongNumRe, "<NUM>").as("text_redacted"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS selection):
    * the distinct per-window minima of the shingle-hash sequence, window
    * size `w`. The guarantee that makes it the standard at corpus scale:
    * any shared run of >= w+n-1 tokens between two docs shares at least
    * one selected fingerprint, while only ~2/(w+1) of shingles are kept —
    * an inverted index over fingerprints finds overlapping docs at a
    * fraction of full-shingle cost. Value-set variant (fingerprints are
    * the minima VALUES, deduped): position-free, so the set is stable
    * under content moves and directly DuckDB-mirrorable. Docs with fewer
    * than w shingles keep their global minimum; shingle-less docs get an
    * empty set. Native O(len) monotonic-deque kernel (`TextHash.winnow`),
    * cross-checked bit-exact against the O(len×w) HOF twin in
    * NativeExprSpec. Emits (id, fp: Array[Long]). */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(w > 0, "winnow window must be positive")
    docs
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol), TextHash.shingleHashes(col("__wh"), n).as("__sh"))
      .select(col(idCol), TextHash.winnow(col("__sh"), w).as("fp"))
  }

  /** Fixed-size character chunking with overlap — the context-window
    * splitter of a training/RAG pipeline: chunk i covers
    * `[i*stride, i*stride + size)` with `stride = size - overlap`, so
    * consecutive chunks share `overlap` chars and every char is covered.
    * A doc yields `max(1, ceil((len - overlap) / stride))` chunks (empty
    * and sub-overlap docs yield exactly one). Row-local generate+substr:
    * at 100 TB this is a map stage whose output is ~`1 + overlap/size`
    * times the input — no shuffle, no state, and the generator shape
    * (sequence + posexplode) keeps peak memory per row at one chunk
    * index array, not the expanded text. Emits (id, chunk_idx,
    * chunk_start, chunk_text, n_chunk_chars). */
  def chunkChars(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val len = length(col(textCol)).cast("long")
    val nChunks = greatest(lit(1L),
      ceil((len - lit(overlap.toLong)).cast("double") / stride).cast("long"))
    docs
      .select(col(idCol), col(textCol),
        sequence(lit(0L), nChunks - 1).as("__idx"))
      .select(col(idCol), col(textCol),
        posexplode(col("__idx")).as(Seq("__pos", "chunk_idx")))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        col(textCol)
          .substr((col("chunk_idx") * stride + 1).cast("int"), lit(size))
          .as("chunk_text"))
      .withColumn("n_chunk_chars", length(col("chunk_text")).cast("long"))
  }

  /** Gopher-style repetition metrics — the quality filters that catch
    * boilerplate, scraped templates, and generation loops, which
    * length/punct ratios miss entirely. Per doc (word = lowercase
    * whitespace token):
    *  - `n_words`, `n_distinct` — size and vocabulary;
    *  - `top_word_frac` — occurrences of the most frequent word / n_words;
    *  - `dup_word_frac` — occurrences of words appearing more than once /
    *    n_words;
    *  - `top_bigram_frac` — occurrences of the most frequent adjacent word
    *    pair / bigram count (0.0 for docs of fewer than two words).
    * Fractions are exact IEEE divisions of integer-valued operands, so
    * they are bit-identical across engines with no rounding convention.
    *
    * Scale: per-doc groupings only — the (doc, word) and (doc, bigram)
    * aggregations shuffle keyed by doc id and combine map-side; no
    * corpus-global state. The bigram window partitions by doc, so no
    * single-partition window exists. */
  def repetitionMetrics(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val wc = words.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val per = wc.groupBy(col(idCol)).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_c"),
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_c"))
    val bigrams = words
      .withColumn("nxt",
        lead(col("w"), 1).over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .select(col(idCol), concat_ws(" ", col("w"), col("nxt")).as("bg"))
    val bper = bigrams.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_bg"), sum(col("c")).as("n_bg"))
    per.join(bper, Seq(idCol), "left_outer").select(
      col(idCol),
      col("n_words").cast("long").as("n_words"),
      col("n_distinct").cast("long").as("n_distinct"),
      (col("top_c").cast("double") / col("n_words")).as("top_word_frac"),
      (col("dup_c").cast("double") / col("n_words")).as("dup_word_frac"),
      coalesce(col("top_bg").cast("double") / col("n_bg"), lit(0.0))
        .as("top_bigram_frac"))
  }

  /** Fixed-point quantum for unigram log-prob accumulation: per-token
    * log-probs are quantized to `floor(lp · 2^20)` BIGINTs so the per-doc
    * reduction is exact integer addition — order-independent across
    * partitions and engines (the same convention as Similarity's k-means
    * means). Only the final per-doc mean is a float division. Public so
    * the oracle SQL interpolates the SAME constant (like [[Ln2]]) —
    * retuning it cannot silently drift the gate.
    *
    * Known cross-engine hazard (accepted): the quantized value floors a
    * TRANSCENDENTAL — `ln` has a 1-ulp contract in both the JVM and
    * libm, so the two engines may disagree by 1 ulp, and if `ln(p)·2^20`
    * lies within that ulp of an integer the floor flips by 1. With ~2^-29
    * boundary width per distinct count value and at most a few thousand
    * distinct counts per corpus, the per-dataset flip probability is
    * ~1e-6 — unlike the k-means quantization (which floors raw input
    * doubles, identical by construction) this is probabilistic, not
    * impossible. If the gate ever reds on exotic data, suspect this
    * first. */
  val LogQ = 1048576L

  /** ln(2) as the exact double literal, shared with the oracle SQL so the
    * bits-per-token division uses the identical constant in both engines. */
  val Ln2: Double = 0.6931471805599453

  /** Unigram language-model scoring — the perplexity-proxy quality filter:
    * train a unigram LM on the corpus itself (add-one smoothing), score
    * each doc by its mean token log-probability and bits-per-token. Docs
    * full of rare/garbage tokens score low; natural text scores high —
    * the cheap stand-in for the LM-perplexity filters production corpora
    * run, with the same two-pass shape.
    *
    * Scale: pass 1 builds the token-frequency table — a full-vocabulary
    * aggregation (inherent: it IS the model) with map-side combine, output
    * O(vocab). Pass 2 joins doc tokens to the frequency table keyed by
    * token and aggregates per doc. Corpus stats (total tokens, vocab
    * size) are a one-row broadcast. Nothing collects to the driver. The
    * frequency table persists while the two model consumers (stats, the
    * quantized log-probs) derive from it — without that, each branch
    * re-scans and re-tokenizes the whole corpus (Spark does not reuse
    * identical scan branches across a DAG) — and the result is
    * materialized eagerly so the model table unpersists before return:
    * exactly two corpus passes, total.
    *
    * Determinism: log-probs are quantized to fixed-point longs ([[LogQ]])
    * before the per-doc sum, so results are bit-identical regardless of
    * shuffle order; the oracle mirrors the same quantization.
    *
    * Lifecycle: the returned frame is localCheckpoint-materialized (so the
    * model table can unpersist before return); long-running sessions call
    * [[Checkpoints.release]] when done with it — plain `unpersist()` does
    * not free local-checkpoint blocks. */
  def unigramLogProb(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val freq = toks.groupBy("w").agg(count(lit(1)).as("c")).persist()
    try {
    val stats = freq.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    val freqQ = freq.crossJoin(broadcast(stats))
      .select(col("w"),
        floor(log((col("c") + lit(1L)) / (col("t") + col("v"))) * lit(LogQ))
          .cast("long").as("lpq"))
    val docTok = toks.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val mean = col("sq").cast("double") / (col("n_words") * lit(LogQ))
    docTok.join(freqQ, "w")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("lpq")).as("sq"), sum(col("tf")).as("n_words"))
      .select(col(idCol),
        col("n_words").cast("long").as("n_words"),
        mean.as("mean_logp"),
        (-mean / lit(Ln2)).as("bits_per_token"))
      .localCheckpoint() // O(docs) result rows; frees the model table
    } finally { freq.unpersist(); () }
  }

  /** Bigram language-model scoring — the sharper perplexity-proxy
    * quality filter (CCNet-style): train an add-one-smoothed bigram LM
    * on the corpus itself, score each doc by the mean conditional token
    * log-probability P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) over its
    * bigram occurrences. Repetitive/templated text scores HIGH, token
    * salad scores LOW — complementary to [[unigramLogProb]] (which only
    * sees marginal rarity). Docs shorter than 2 tokens have no bigrams
    * and are dropped (the duplicatedSpanStats contract; oracle mirrors).
    *
    * Emits (idCol, n_bigrams, mean_logp, bits_per_token).
    *
    * Scale: pass 1 builds the bigram count table (map-side-combined,
    * output O(distinct bigrams)) with the prefix totals as one window
    * over that aggregated table — NOT a second corpus scan; pass 2 joins
    * doc bigrams to the model keyed by pair. The vocab size is a
    * one-row broadcast. Same two-pass shape and [[LogQ]] fixed-point
    * determinism as [[unigramLogProb]]: log-probs quantize to longs
    * before any per-doc summation, so shuffle order cannot perturb the
    * score. The model table persists across its two consumers and the
    * result localCheckpoints so it can unpersist before return. */
  def bigramLogProb(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = docs
      .select(col(idCol),
        filter(split(lower(col(textCol)), "\\s+"), w => w =!= "").as("__ws"))
    val pairs = ws.filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__ws")) - 1),
          i => struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + 1).as("w2")))).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .persist()
    try {
      val c12 = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n12"))
        .withColumn("n1",
          sum(col("n12")).over(Window.partitionBy(col("w1"))))
      val vocab = ws
        .select(explode(col("__ws")).as("w")).agg(countDistinct(col("w")).as("v"))
      val lm = c12.crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          floor(log((col("n12") + lit(1L)) / (col("n1") + col("v"))) *
            lit(LogQ)).cast("long").as("lpq"))
      val docPairs = pairs.groupBy(col(idCol), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      val mean = col("sq").cast("double") / (col("n_bigrams") * lit(LogQ))
      docPairs.join(lm, Seq("w1", "w2"))
        .groupBy(col(idCol))
        .agg(sum(col("tf") * col("lpq")).as("sq"),
          sum(col("tf")).as("n_bigrams"))
        .select(col(idCol),
          col("n_bigrams").cast("long").as("n_bigrams"),
          mean.as("mean_logp"),
          (-mean / lit(Ln2)).as("bits_per_token"))
        .localCheckpoint()
    } finally { pairs.unpersist(); () }
  }

  /** Zipf power-law fit of the token frequency distribution — the
    * corpus-health diagnostic (natural text sits near exponent ~2 under
    * the CSN discrete MLE with c_min = 1; token salad and templated
    * spam drift away): `α = 1 + V / Σ_w ln(c_w)` over the vocabulary,
    * plus the exact mass shares of the top-10/top-100 tokens. ONE row:
    * (n_tokens, vocab, alpha_mle, top10_share, top100_share).
    *
    * Determinism: counts exact; the ln sum folds over the
    * DISTINCT-count grid (Σ n_c·ln c — the degreeStats discipline),
    * pinned round(·,8); top-k shares are exact integer sums over the
    * (count DESC, token ASC) rank divided once. All-hapax corpora
    * (Σ ln = 0) yield NULL α. Scale: one token aggregate (map-side
    * combined, O(vocab) out); the top-100 cut is TakeOrdered (per-
    * partition top-100 merged on the driver, the topNgrams shape) so
    * no task ever sorts the full vocabulary — the only rank window
    * runs over those 100 rows. */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val grid = freq.groupBy(col("c")).agg(count(lit(1)).as("nc"))
    val packed = grid
      .agg(sort_array(collect_list(struct(col("c"), col("nc"))))
        .as("__g"),
        sum(col("c") * col("nc")).as("n_tokens"),
        sum(col("nc")).as("vocab"))
    val top100 = freq.orderBy(col("c").desc, col("w").asc).limit(100)
    val ranked = top100.withColumn("__r",
      row_number().over(Window.orderBy(col("c").desc, col("w").asc)))
    val tops = ranked.agg(
      sum(when(col("__r") <= 10, col("c")).otherwise(0L)).as("__t10"),
      sum(col("c")).as("__t100"))
    val lnSum = aggregate(col("__g"), lit(0.0), (acc, x) =>
      acc + x.getField("nc").cast("double") *
        log(x.getField("c").cast("double")))
    packed.crossJoin(broadcast(tops))
      .select(col("n_tokens"), col("vocab"),
        round(when(lnSum =!= 0.0,
          lit(1.0) + col("vocab").cast("double") / lnSum), 8)
          .as("alpha_mle"),
        (col("__t10").cast("double") / col("n_tokens").cast("double"))
          .as("top10_share"),
        (col("__t100").cast("double") / col("n_tokens").cast("double"))
          .as("top100_share"))
  }

  /** Corpus-wide most-frequent word n-grams — the boilerplate detector
    * (navigation chrome, license headers, cookie banners surface as
    * high-count high-df n-grams; the output feeds a scrub list or a
    * quality penalty). Emits the top `k` n-grams as
    * (ngram, cnt, df, rank): total occurrences, distinct docs, and a
    * dense 1-based rank ordered (cnt DESC, ngram ASC) — the tie-break
    * makes the cut at `k` deterministic and cross-engine stable.
    *
    * Scale: n-gram strings are built row-locally from the materialized
    * token array; the count is ONE hash-aggregate (map-side combined)
    * keyed by n-gram, the df a count-distinct expand over the same
    * shuffle; top-k is TakeOrdered over the aggregated (already small)
    * table — no global sort of raw grams, and the final rank window runs
    * on k rows. Docs shorter than n words contribute nothing. */
  def topNgrams(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 1, s"ngram length must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), col(textCol))
      .select(col(idCol), TextHash.words(col(textCol)).as("__toks"))
    // when-guard: sequence(0, size-n) with size < n would run DESCENDING
    // (Spark picks step -1 when start > stop) and fabricate grams
    val grams = toks.select(col(idCol),
      explode(when(size(col("__toks")) >= n,
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("ngram"))
    val top = grams.groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"), count_distinct(col(idCol)).as("df"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("ngram")))
        .cast("long"))
  }

  /** Document fingerprint: order-sensitive whole-doc hash + the minimum
    * shingle hash and distinct-shingle count (the winnowing-style content
    * summary: equal fp ⇒ identical token stream; shingle stats survive
    * local edits). */
  def fingerprint(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    // Each stage materialized as a column: lambdas must index attributes,
    // not re-evaluate the upstream hash expression per element (see
    // NearDup's evaluation-shape note).
    docs
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol), col("__wh"),
        array_distinct(TextHash.shingleHashes(col("__wh"), n)).as("__sh"))
      .select(
        col(idCol),
        TextHash.docHash(col("__wh")).as("doc_fp"),
        array_min(col("__sh")).as("min_shingle"),
        size(col("__sh")).cast("long").as("n_shingles"))

  /** Corpus bigram conditional-probability table — the n-gram LM step up
    * from [[unigramLogProb]]: for every adjacent word pair,
    * `P(w2|w1) ≈ p_q / 2^20` with `p_q = (n_pair · 2^20) div n_prefix`,
    * ALL-INTEGER floor arithmetic (no log, no float accumulation), so
    * the table is bit-identical across partitionings and engines. Feeds
    * next-token-surprisal scoring, collocation mining, and simple
    * generation tests. Output: (w1, w2, n_pair, n_prefix, p_q) for pairs
    * seen at least `minCount` times.
    *
    * Scale shape: one pair explode (row-local; the word array is
    * materialized ONCE per row before the transform references it — the
    * interpreted-HOF rule), one (w1,w2)-keyed count with map-side
    * combine, then n_prefix via a w1-partitioned window SUM on the
    * ALREADY-AGGREGATED table (O(distinct pairs), not corpus tokens —
    * and no second scan). */
  def bigramConditionals(
      docs: DataFrame, textCol: String, minCount: Long = 2,
      q: Long = LogQ): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
        .as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    pairs
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .withColumn("n_prefix",
        sum(col("n_pair")).over(Window.partitionBy(col("w1"))))
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_prefix"),
        expr(s"(n_pair * $q) div n_prefix").as("p_q"))
  }

  /** Interpolated Kneser-Ney smoothed bigram probabilities (Kneser &
    * Ney 1995; the smoothing behind every serious count-based LM and
    * the KenLM default) as EXACT integer rationals. With absolute
    * discount D = 3/4 (rational so everything stays integral):
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1 + (D·B1/c1) · (C2/E)
    *
    * where c12 = bigram count, c1 = Σ_w c(w1 w), B1 = |{w: c(w1 w)>0}|
    * (the left continuation fan-out the discount mass is spread over),
    * C2 = |{w: c(w w2)>0}| (the CONTINUATION count — how many contexts
    * w2 completes, the insight that distinguishes KN from Katz), and
    * E = total distinct bigrams. Over the common denominator 4·c1·E
    * (c12 ≥ 1 for every emitted pair):
    *
    *   kn_num = (4·c12 − 3)·E + 3·B1·C2,   kn_den = 4·c1·E
    *
    * Emits the topK most frequent bigrams (ties by word order) with
    * all count components. Three count aggregates + one scalar cross
    * join — shuffles keyed on words/bigrams, no windows, no corpus
    * sorts (the top-k is an orderBy().limit()). */
  def kneserNeyBigrams(
      docs: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = docs
      .select(filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
        .as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val c = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val leftM = c.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("b1"))
    val rightM = c.groupBy(col("w2")).agg(count(lit(1)).as("c2t"))
    val e = c.agg(count(lit(1)).as("e"))
    c.join(leftM, "w1").join(rightM, "w2").crossJoin(e)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("b1"),
        col("c2t"), col("e"),
        ((lit(4L) * col("c12") - 3L) * col("e") +
          lit(3L) * col("b1") * col("c2t")).as("kn_num"),
        (lit(4L) * col("c1") * col("e")).as("kn_den"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Sentence-level shape statistics: `n_sentences` (non-empty segments
    * after splitting on `[.!?]+` runs), `n_words` (whitespace tokens),
    * and `avg_words_per_sentence` — the structural half of a
    * quality-score stack (a corpus of 400-word "sentences" is markup or
    * tables, not prose). NULL avg for sentence-free text.
    *
    * Row-local regex + array ops, one pass, no shuffle — the same scale
    * contract as [[tokenClasses]]. */
  def sentenceStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = filter(
      split(col(textCol), "[.!?]+"), s => length(trim(s)) > 0)
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    docs.select(col(idCol),
      size(sents).cast("long").as("n_sentences"),
      size(words).cast("long").as("n_words"))
      .withColumn("avg_words_per_sentence",
        when(col("n_sentences") === 0, lit(null).cast("double"))
          .otherwise(col("n_words").cast("double") /
            col("n_sentences").cast("double")))
  }

  /** Flesch-style readability score with a deterministic syllable proxy
    * (runs of `[aeiouy]+` in the lowercased text — the standard
    * fitted-constant-free approximation; real syllabification is
    * language-specific and needs no distributed machinery):
    *
    *   206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)
    *
    * Degenerate docs (no words or no sentences) emit NULL. Each score is
    * a handful of per-row IEEE operations on exact integer counts — no
    * cross-row accumulation anywhere, so scores are bit-identical across
    * engines. Row-local, zero shuffles. */
  def readability(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = filter(
      split(col(textCol), "[.!?]+"), s => length(trim(s)) > 0)
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val syls = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0)))
    docs.select(col(idCol),
      size(sents).cast("long").as("n_sentences"),
      size(words).cast("long").as("n_words"),
      syls.cast("long").as("n_syllables"))
      .withColumn("flesch",
        when(col("n_sentences") === 0 || col("n_words") === 0,
          lit(null).cast("double"))
          .otherwise(lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))))
  }

  /** URL decomposition — the first operator of every crawl-derived
    * pipeline: per-domain caps, host-level dedup, and source mixing all
    * key on the REGISTERED domain, not the raw host. Emits one row per
    * input row: (idCol, url, host, registered_domain, path, query_str,
    * tld).
    *
    * Pure regexp decomposition (codegen'd `regexp_extract`, row-local,
    * no UDF) with an explicit public-suffix HEURISTIC: the registered
    * domain is the last two host labels, or the last three when the
    * middle label is a compound-suffix second level (co/com/net/org/
    * gov/ac/edu — `example.co.uk` → `example.co.uk`, not `co.uk`).
    * That list is deliberately tiny and documented rather than an
    * embedded copy of the full public-suffix registry; swap in the real
    * PSL table (broadcast join) when operating on live crawl data.
    *
    * Determinism: hosts are lowercased, ports stripped, and every field
    * is a fixed regexp over the same string in both engines (empty
    * string, not NULL, on no-match — both engines agree). Scale: fully
    * row-local, pipelined inside whole-stage codegen. */
  def urlParse(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = lower(trim(col("url")))
    df.select(col(idCol), col(urlCol).as("url"))
      .withColumn("__hp",
        regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("host", regexp_replace(col("__hp"), ":[0-9]+$", ""))
      .withColumn("path",
        regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("query_str", regexp_extract(u, "\\?([^#]*)", 1))
      .withColumn("tld",
        regexp_extract(col("host"), "\\.([a-z0-9-]+)$", 1))
      .withColumn("__r2",
        regexp_extract(col("host"), "([a-z0-9-]+\\.[a-z0-9-]+)$", 1))
      .withColumn("__r3", regexp_extract(col("host"),
        "([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$", 1))
      .withColumn("__sld",
        regexp_extract(col("__r2"), "^([a-z0-9-]+)\\.", 1))
      .withColumn("registered_domain",
        when(col("__sld").isin("co", "com", "net", "org", "gov", "ac",
          "edu") && col("__r3") =!= "", col("__r3"))
          .otherwise(col("__r2")))
      .select(col(idCol), col("url"), col("host"),
        col("registered_domain"), col("path"), col("query_str"),
        col("tld"))
  }

  /** Boilerplate-line detection — the C4/RefinedWeb-style template
    * cleaner: a LINE (newline-delimited, whitespace-trimmed, lowercased,
    * non-empty) that repeats across ≥ `minDf` distinct documents is
    * boilerplate (nav bars, cookie banners, footers); each document is
    * then scored by how much of it is boilerplate. Line-level df is the
    * natural unit here — token near-dup methods see "accept cookies"
    * pages as unique documents while every LINE in them is template.
    *
    * Emits per doc: (id, n_lines, n_boiler, boiler_ratio) over the
    * doc's DISTINCT normalized lines (a doc repeating its own line 50×
    * is repetition — [[repetitionMetrics]]' job — not template); docs
    * with zero non-empty lines are absent (explode semantics, the
    * unnest twin). Counts exact; the ratio is one final division.
    *
    * Scale: explode + two hash aggregates (line df keyed by the line
    * hash, then per-doc rollup) + one equi-join of doc-lines against
    * the O(distinct lines) df grid — map-side combinable end to end,
    * no all-pairs anything. */
  def boilerplateLines(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 3L): DataFrame = {
    require(minDf >= 2L, s"minDf must be >= 2, got $minDf")
    val lines = docs
      .select(col(idCol),
        explode(filter(transform(split(col(textCol), "\n"),
          l => trim(lower(l))), l => l =!= "")).as("__line"))
      // (id, line) deduped first, so df below = distinct docs per line
      .distinct()
    val df = lines.groupBy(col("__line"))
      .agg(count(lit(1)).as("__df"))
    lines.join(df, "__line")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col(idCol), col("n_lines"), col("n_boiler"),
        when(col("n_lines") === 0L, lit(null).cast("double"))
          .otherwise(col("n_boiler").cast("double") /
            col("n_lines").cast("double")).as("boiler_ratio"))
  }

  /** Corpus-wide duplicate-line removal (the CCNet/RefinedWeb scrub:
    * drop every repeated paragraph/line ACROSS the corpus, keeping only
    * its FIRST occurrence in (doc, position) order — boilerplate and
    * mirrored content vanish while one canonical copy survives). Lines
    * are `sep`-split, trimmed, empties dropped; the keep decision is
    * `(doc_id, line_no) == argmin over the line's occurrences`. Emits
    * per doc: (id, n_lines, n_kept, kept_md5) where kept_md5
    * fingerprints the kept lines rejoined by `\n` in original order —
    * the verifiable stand-in for shipping scrubbed bodies.
    *
    * Scale: ONE shuffle keyed by line content (the natural partition
    * key — identical lines co-locate), an argmin aggregate (map-side
    * combinable; never a corpus-wide window), a same-key join back,
    * and a per-doc re-aggregate. Heavily duplicated lines make the
    * aggregate's combiner do the collapsing map-side; the join's build
    * side is O(distinct lines). */
  def corpusLineDedup(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", keepText: Boolean = false): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), sep)).as(Seq("__pos", "__raw")))
      .select(col("__id"), col("__pos"), trim(col("__raw")).as("__line"))
      .where(col("__line") =!= "")
    val first = lines.groupBy(col("__line"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__f"))
    val keptText = array_join(
      transform(
        array_sort(collect_list(
          when(col("__keep"), struct(col("__pos"), col("__line"))))),
        s => s.getField("__line")),
      "\n")
    val base = lines.join(first, "__line")
      .withColumn("__keep",
        col("__id") === col("__f.__id") && col("__pos") === col("__f.__pos"))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(keptText.cast("binary")).as("kept_md5"),
        keptText.as("kept_text"))
    if (keepText) base else base.drop("kept_text")
  }

  /** One Unicode-normalization row: code-point counts before/after NFC,
    * whether normalization changed the text, and the md5 of the NFC
    * form (UTF-8 bytes — the portable fingerprint). */
  final case class TextNfc(
      id: Long, n_cp_raw: Long, n_cp_nfc: Long, changed: Boolean,
      nfc_md5: String)

  /** Unicode NFC normalization — the canonicalization pass a text
    * corpus needs before ANY hashing/dedup stage (the same visible
    * string arrives both precomposed and decomposed from different
    * sources; un-normalized, they hash apart and every downstream
    * dedup/fingerprint silently misses). Emits code-point counts (the
    * DuckDB `length` contract — NOT UTF-16 units), a changed flag (the
    * monitoring signal: what fraction of the corpus needed fixing),
    * and the md5 of the normalized form. Row-local kernel
    * (java.text.Normalizer — the JDK's ICU-equivalent public Unicode
    * tables); no shuffle. */
  def normalizeNfc(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, raw) =>
          val s = if (raw == null) "" else raw
          val n = java.text.Normalizer.normalize(
            s, java.text.Normalizer.Form.NFC)
          md.reset()
          val hex = md.digest(n.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          TextNfc(id, s.codePointCount(0, s.length).toLong,
            n.codePointCount(0, n.length).toLong, n != s, hex)
        }
      }
      .toDF()
  }

  /** Lexical-diversity profile — TTR and hapax ratio per document, the
    * quality signals that separate natural prose (rich vocabulary, long
    * hapax tail) from template/boilerplate/spam text (few types, no
    * tail). `ttr = types/tokens`, `hapax_ratio = once-words/tokens`.
    *
    * Tokens are the engine-wide whitespace split, lowercased, empties
    * dropped (the [[bigramLogProb]] contract — replayed verbatim by the
    * oracle's `regexp_split_to_array`). Emits per doc: (id, n_tokens,
    * n_types, n_hapax, ttr, hapax_ratio); zero-token docs are absent
    * from the output (explode drops them — the unnest twin), and the
    * n_tokens=0 guard keeps the divisions ANSI-safe regardless.
    *
    * Determinism: all counts exact off one (doc, word) aggregate; the
    * two divisions are final fixed-shape floats. Scale: explode + two
    * map-side-combinable hash aggregates keyed by doc — row-local,
    * no global state, output O(docs). */
  def lexicalDiversity(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          w => w =!= "")).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        when(col("n_tokens") === 0L, lit(null).cast("double"))
          .otherwise(col("n_types").cast("double") /
            col("n_tokens").cast("double")).as("ttr"),
        when(col("n_tokens") === 0L, lit(null).cast("double"))
          .otherwise(col("n_hapax").cast("double") /
            col("n_tokens").cast("double")).as("hapax_ratio"))

  /** Corpus keyness — Dunning's log-likelihood-ratio G² per token
    * between a focus slice (`inA`) and the rest of the corpus: the
    * standard "what vocabulary characterizes this source/domain?"
    * readout (Dunning 1993), sharper than raw frequency ratios for
    * rare terms. Top-k terms by G²:
    * (term, c_a, c_b, g2, direction) — direction +1 when the term is
    * OVER-represented in the focus slice, −1 under, 0 proportional.
    *
    * Exactness: counts exact BIGINT; each log argument is a ratio of
    * exact-integer products cast to double in fixed order
    * (`c·N / (N_side·(c_a+c_b))`), so G² is bit-identical
    * cross-engine; zero-count sides contribute 0 by convention.
    * direction is an EXACT integer cross-product sign (c_a·N_b vs
    * c_b·N_a) — no float compare. Rank ties break on term ASC.
    *
    * Scale: one token-keyed map-side-combinable aggregate (O(vocab)
    * out), one broadcast of the two scalar totals; the top-k rank is a
    * TakeOrdered over the vocab aggregate, not a global sort. */
  def keynessLLR(
      docs: DataFrame, textCol: String, inA: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tok = docs.select(when(inA, 1L).otherwise(0L).as("__a"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val per = tok.groupBy(col("term")).agg(
      sum(col("__a")).as("c_a"),
      (count(lit(1)) - sum(col("__a"))).as("c_b"))
    val tot = per.agg(
      coalesce(sum(col("c_a")), lit(0L)).as("__na"),
      coalesce(sum(col("c_b")), lit(0L)).as("__nb"))
    val n = (col("__na") + col("__nb")).cast("double")
    val termA = when(col("c_a") > 0L,
      col("c_a").cast("double") *
        log(col("c_a").cast("double") * n /
          (col("__na").cast("double") *
            (col("c_a") + col("c_b")).cast("double")))).otherwise(lit(0.0))
    val termB = when(col("c_b") > 0L,
      col("c_b").cast("double") *
        log(col("c_b").cast("double") * n /
          (col("__nb").cast("double") *
            (col("c_a") + col("c_b")).cast("double")))).otherwise(lit(0.0))
    per.crossJoin(broadcast(tot))
      .withColumn("g2", lit(2.0) * (termA + termB))
      .withColumn("direction",
        signum((col("c_a") * col("__nb") - col("c_b") * col("__na"))
          .cast("double")).cast("long"))
      .orderBy(col("g2").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("c_a"), col("c_b"), col("g2"),
        col("direction"))
  }

  /** Jensen-Shannon divergence between the unigram distributions of a
    * focus slice and the rest of the corpus — the bounded (≤ ln 2),
    * symmetric "how different are these two corpora?" scalar used for
    * domain-mixture monitoring and pretraining-mix drift. ONE row:
    * (n_a, n_b, vocab, jsd_nats).
    *
    * Determinism: the float sum would be shuffle-order-dependent, so
    * the fold runs over the (c_a, c_b) COUNT-PAIR GRID with
    * multiplicities (the zipfFit/degreeStats discipline): terms sharing
    * an exact count pair contribute identically, the grid is collected
    * once via sort_array and folded strictly left-to-right, pinned
    * round(·,8). Grid cardinality is bounded by the number of DISTINCT
    * count pairs — Zipf corpora keep it orders below vocab.
    *
    * Scale: one token aggregate (map-side combined) → one pair-grid
    * aggregate (O(grid) out) → one driver-bounded fold. */
  def jsDivergence(docs: DataFrame, textCol: String, inA: Column)
      : DataFrame = {
    val tok = docs.select(when(inA, 1L).otherwise(0L).as("__a"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val per = tok.groupBy(col("term")).agg(
      sum(col("__a")).as("ca"),
      (count(lit(1)) - sum(col("__a"))).as("cb"))
    val grid = per.groupBy(col("ca"), col("cb"))
      .agg(count(lit(1)).as("m"))
    val packed = grid.agg(
      sort_array(collect_list(struct(col("ca"), col("cb"), col("m"))))
        .as("__g"),
      coalesce(sum(col("ca") * col("m")), lit(0L)).as("n_a"),
      coalesce(sum(col("cb") * col("m")), lit(0L)).as("n_b"),
      coalesce(sum(col("m")), lit(0L)).as("vocab"))
    val term = (x: Column) => {
      val p = x.getField("ca").cast("double") / col("n_a").cast("double")
      val q = x.getField("cb").cast("double") / col("n_b").cast("double")
      val halfA = when(x.getField("ca") > 0L,
        p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0))
      val halfB = when(x.getField("cb") > 0L,
        q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))
      x.getField("m").cast("double") * (halfA + halfB)
    }
    packed.select(col("n_a"), col("n_b"), col("vocab"),
      when(col("n_a") === 0L || col("n_b") === 0L,
        lit(null).cast("double"))
        .otherwise(round(
          lit(0.5) * aggregate(col("__g"), lit(0.0),
            (acc, x) => acc + term(x)), 8)).as("jsd_nats"))
  }

  /** Corpus novelty curve — the "is new data still new?" diagnostic a
    * training-data pipeline reads before ingesting the next crawl slice:
    * with documents in arrival order (ascending id), a document's
    * novelty is the fraction of its distinct word-n-gram shingles NEVER
    * seen in any earlier document; averaged per id bucket it shows the
    * marginal-information decay that motivates dedup and source rotation
    * (near-dup corpora flatline early). Output one row per bucket:
    * (bucket, n_docs, n_shingles, n_novel, novelty).
    *
    * Exactness: "first seen" is an arg-min over exact shingle hashes
    * (the shared mod-P kernel), counts are exact integers, novelty is
    * ONE division per bucket. Scale: two hash aggregates (per-shingle
    * min owner; per-doc rollup) and one equi-join co-partitioned on the
    * shingle hash — linear in corpus shingles, the same budget as exact
    * dedup, never pairwise. */
  def noveltyCurve(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bucketSize: Long = 50L): DataFrame = {
    require(n >= 1 && bucketSize >= 1, s"bad n=$n / bucketSize=$bucketSize")
    val sh = docs
      .select(col(idCol).cast("long").as("__id"),
        TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col("__id"),
        array_distinct(TextHash.shingleHashes(col("__wh"), n)).as("__sh"))
      .select(col("__id"), explode(col("__sh")).as("__h"))
    val owner = sh.groupBy("__h").agg(min(col("__id")).as("__owner"))
    val per = sh.join(owner, "__h")
      .groupBy("__id").agg(
        count(lit(1)).as("__total"),
        sum(when(col("__owner") === col("__id"), 1L).otherwise(0L))
          .as("__novel"))
    per
      .groupBy(expr(s"__id div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__total")).as("n_shingles"),
        sum(col("__novel")).as("n_novel"))
      .select(col("bucket"), col("n_docs"), col("n_shingles"),
        col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
  }

  /** Cross-document duplicate-SPAN detection — the exact-substring
    * complement to MinHash/SimHash whole-doc dedup (the "deduplicating
    * training data" recipe: long verbatim passages repeated across
    * documents — licenses, templates, quoted wholesale — poison an LM
    * even when the hosting docs differ). A token n-gram is *duplicated*
    * when it appears in ≥ `minDf` DISTINCT documents; per document,
    * consecutive duplicated gram positions merge into maximal spans,
    * and overlapping span coverage is counted exactly (a token under
    * two overlapping grams counts once). Emits per doc:
    * (id, n_tokens, n_dup_spans, dup_tokens, dup_ratio_q) with
    * `dup_ratio_q = dup_tokens·10⁶ div n_tokens` — the scrub/penalty
    * signal.
    *
    * Scale: gram building is row-local (token array materialized once —
    * the interpreted-HOF rule); duplicate grams come from ONE
    * gram-keyed hash aggregate (map-side combined, O(distinct grams)
    * table); the join back is same-key; span merging is a window
    * PARTITIONED BY DOCUMENT over that doc's duplicated positions —
    * bounded by document length, never corpus-sized. At 100 TB the only
    * corpus-wide structure is the distinct-gram aggregate, the same
    * shape as [[topNgrams]]. */
  def dupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDf: Long = 2): DataFrame = {
    require(n >= 1, s"ngram length must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("__id"),
      TextHash.words(col(textCol)).as("__toks"))
    val withN = toks.select(col("__id"),
      size(col("__toks")).cast("long").as("__ntok"), col("__toks"))
    // (id, pos, gram) — descending-sequence guard as in topNgrams
    val grams = withN.select(col("__id"), col("__ntok"),
      posexplode(when(size(col("__toks")) >= n,
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
        .as(Seq("__pos", "__gram")))
    val dup = grams.groupBy(col("__gram"))
      .agg(count_distinct(col("__id")).as("__df"))
      .where(col("__df") >= minDf)
      .select(col("__gram"))
    // duplicated positions per doc -> islands (break when the next
    // position starts past the running span end; equal gram lengths
    // make the previous position's end the running max)
    val pos = grams.join(dup, "__gram")
      .select(col("__id"), col("__ntok"), col("__pos"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val isl = pos
      .withColumn("__brk",
        when(col("__pos") > lag(col("__pos"), 1).over(w) + n, 1L)
          .otherwise(lit(0L)))
      .withColumn("__isl", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = isl.groupBy(col("__id"), col("__ntok"), col("__isl"))
      .agg((max(col("__pos")) + n - min(col("__pos"))).as("__covered"))
    spans.groupBy(col("__id"), col("__ntok"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("__covered")).as("dup_tokens"))
      .select(col("__id").as("id"), col("__ntok").as("n_tokens"),
        col("n_dup_spans"), col("dup_tokens"),
        expr("dup_tokens * 1000000L div __ntok").as("dup_ratio_q"))
  }

  /** Homoglyph-confusable map (UTS #39 skeleton, the high-frequency
    * subset): Cyrillic lookalikes а е о р с у х і ј ѕ plus Greek
    * omicron ο, each to its Latin visual twin. Shared VERBATIM with
    * the oracle (`translate` is per-codepoint in both engines). */
  val ConfusableFrom: String = "аеорсухіјѕο"
  val ConfusableTo: String = "aeopcyxijso"

  /** Confusable-homoglyph scan — the mixed-script spoof detector an
    * LLM corpus needs before dedup: a Cyrillic 'о' spliced into a
    * Latin word makes the text hash "unique", defeats exact AND
    * shingle dedup, and smuggles near-duplicates past every filter.
    * Emits per doc:
    *  - n_confusable — count of mapped homoglyph codepoints;
    *  - n_mixed_tokens — whitespace tokens carrying BOTH an ASCII
    *    letter and a confusable (the spoof signature; an all-Cyrillic
    *    token is just Russian, not spoofing);
    *  - skeleton_md5 — md5 of the text with confusables folded to
    *    their Latin twins, the dedup-ready canonical form.
    * Pure codegen'd column arithmetic (`translate`/`length`), one
    * row-local pass, no shuffle; the per-token filter runs on the
    * small split array with only lambda-bound variables (no captured
    * child re-evaluation hazard). */
  def confusableScan(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val mixedTok = filter(
      split(txt, "\\s+"),
      t => t.rlike("[a-z]") && t.rlike(s"[$ConfusableFrom]"))
    docs.select(
      col(idCol).cast("long").as("id"),
      (length(txt) - length(translate(txt, ConfusableFrom, "")))
        .cast("long").as("n_confusable"),
      size(mixedTok).cast("long").as("n_mixed_tokens"),
      md5(translate(txt, ConfusableFrom, ConfusableTo)).as("skeleton_md5"))
  }
}
