package graft.gates

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkEntry._
import graft.engine.UpsertStream
import graft.functions.{OracleSql, TextHash}
import graft.ops.TextAnalysis.LangProfiles
import graft.model.{IngestConfig, TargetTable}
import graft.multimodal.Multimodal
import graft.ops.{BatchSplit, Dedup, Html, NearDup, Similarity, TextAnalysis}
import graft.sink.Merge
import graft.gates.GateOracleShared._

/** Text & source-format gates: crawl ingest, language/quality, BPE, ranking, formats.
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object TextGates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- LLM pipeline: token counting ----
    "text_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_out"))),

    // ---- LLM pipeline: quality scoring signals ----
    "text_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val nChars = length(col("text")).cast("long")
      val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
      d.select(
        col("doc_id"),
        nChars.as("n_chars_out"),
        nAlpha.as("n_alpha"),
        (nAlpha.cast("double") / nChars.cast("double")).as("alpha_ratio"),
        regexp_count(col("text"), lit("\\bthe\\b")).cast("long").as("n_the"))
    }),

    // ---- LLM pipeline: top collocations by pointwise lift (phrase
    //      detection; one corpus scan, one pair-keyed aggregate) ----
    "text_collocations" -> ((s, dir) =>
      graft.ops.TextRank.topCollocations(
        t(s, dir, "documents"), "text", k = 25, minPairCount = 5L)),

    // ---- LLM pipeline: BPE merge training over the distributed word
    //      dict (10 rounds: freq-weighted pair counts -> argmax -> greedy
    //      merge fold; only the learned pairs reach the driver) ----
    "bpe_merges" -> ((s, dir) =>
      graft.ops.Bpe.learnMerges(t(s, dir, "documents"), "text", merges = 10)),

    // ---- LLM pipeline: BPE encode — per-doc token counts under the
    //      10 learned merges (the tokens-per-word compression metric) ----
    "bpe_encode" -> ((s, dir) =>
      graft.ops.Bpe.encodeTokenCounts(
        t(s, dir, "documents"), "doc_id", "text", merges = 10)),

    // ---- LLM pipeline: unigram-LM (SentencePiece-style) tokenizer
    //      TRAINING — substring-census seed vocab + 2 hard-EM rounds of
    //      row-local Viterbi segmentation; only the learned model
    //      reaches the driver ----
    "tok_unigram_train" -> ((s, dir) =>
      graft.ops.Unigram.train(
        t(s, dir, "documents"), "text", multiVocab = 64, rounds = 2)),

    // ---- LLM pipeline: unigram-LM encode — per-doc token counts under
    //      the trained model (tokens-per-word compression metric) ----
    "tok_unigram_encode" -> ((s, dir) =>
      graft.ops.Unigram.encodeTokenCounts(
        t(s, dir, "documents"), "doc_id", "text",
        multiVocab = 64, rounds = 2)),

    // ---- LLM pipeline: unigram-LM vocabulary PRUNE + refit — keep
    //      singles + top-32 multi pieces by trained usage, renormalize,
    //      one more EM round (the SentencePiece shrink schedule) ----
    "tok_unigram_prune" -> ((s, dir) =>
      graft.ops.Unigram.trainPruned(
        t(s, dir, "documents"), "text",
        multiVocab = 64, rounds = 2, keepMulti = 32)),

    // ---- LLM pipeline: corpus novelty curve — per id-bucket share of
    //      3-shingles never seen in earlier documents; the marginal-
    //      information decay read before ingesting the next slice ----
    "text_novelty_curve" -> ((s, dir) =>
      TextAnalysis.noveltyCurve(
        t(s, dir, "documents"), "doc_id", "text", n = 3,
        bucketSize = 50L)),

    // ---- LLM pipeline: corpus-wide frequent n-grams (boilerplate
    //      detector: one gram-keyed hash-aggregate + TakeOrdered) ----
    "text_top_ngrams" -> ((s, dir) =>
      TextAnalysis.topNgrams(
        t(s, dir, "documents"), "doc_id", "text", n = 3, k = 20)),

    // ---- LLM pipeline: sparse TF-IDF vectors over a deterministic
    //      top-32 vocabulary (fixed-point idf, LogQ convention) ----
    "text_tfidf" -> ((s, dir) =>
      graft.ops.TextRank.tfidfSparse(
        t(s, dir, "documents"), "doc_id", "text", vocabSize = 32)),

    // ---- LLM pipeline: bigram conditional LM table (all-integer
    //      fixed-point P(w2|w1); window on the aggregated pair table) ----
    "text_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramConditionals(
        t(s, dir, "documents"), "text", minCount = 2)),

    // ---- LLM pipeline: heuristic language ID ----
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: language-ID EVALUATION — confusion matrix of
    //      predicted vs labeled language (the accuracy read behind any
    //      classifier-driven filter; exact counts) ----
    "text_lang_confusion" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextAnalysis.langId(d, "doc_id", "text")
        .select(col("doc_id"), col("pred_lang"))
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- LLM pipeline: BPE-style token-class counting ----
    "text_token_classes" -> ((s, dir) =>
      TextAnalysis.tokenClasses(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: code-vs-prose routing — surface-feature census
    //      with a pinned linear score; every fourth doc gets a spliced
    //      code block so both verdicts are exercised ----
    "text_code_detect" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val code = lit("def f(x):\n    return x + 1\nclass A {\n" +
        "    int y = 0;\n}\nimport os\n")
      val txt = when(pmod(col("doc_id"), lit(4L)) === 0,
        concat(code, col("text"))).otherwise(col("text"))
      TextAnalysis.codeDetect(
        d.select(col("doc_id"), txt.as("text")), "doc_id", "text")
    }),

    // ---- LLM pipeline: markdown corpus cleanup — strip structure,
    //      keep prose; structure census on the original text; one
    //      shared rewrite-step table drives both dialects ----
    "text_markdown_strip" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val md = concat(
        lit("# Title "), substring(col("text"), 1, 20),
        lit("\n**bold** see [docs](http://ex.com/"),
        col("doc_id").cast("string"),
        lit(") and `x = 1` ![img](http://i/"),
        col("doc_id").cast("string"),
        lit(".png)\n- item one\n2. item two\n> quote\n---\n"),
        col("text"))
      TextAnalysis.markdownStrip(
        d.select(col("doc_id"), md.as("text")), "doc_id", "text")
    }),

    // ---- LLM pipeline: Unicode script census — the multilingual-
    //      corpus filter signal; the fixture splices Cyrillic/CJK/Greek
    //      words into the ASCII corpus so every class is exercised ----
    "text_script_profile" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val cyrW = element_at(
        array(lit("привет"), lit("мир"), lit("данные"), lit("поток")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
      val cjkW = element_at(
        array(lit("数据"), lit("模型"), lit("训练")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
      val grkW = element_at(
        array(lit("αβγ"), lit("δεζ")),
        (pmod(col("doc_id"), lit(2)) + 1).cast("int"))
      val txt = concat_ws(" ", col("text"), cyrW, cjkW, grkW,
        col("doc_id").cast("string"))
      TextAnalysis.scriptProfile(
        d.select(col("doc_id"), txt.as("text")), "doc_id", "text")
    }),

    // ---- Generator (UDTF shape): explode per-doc shingles to rows ----
    "text_shingles_explode" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 25 === 0)
        .select(col("doc_id"), TextHash.wordHashes(col("text")).as("__wh"))
        .select(col("doc_id"), TextHash.shingleHashes(col("__wh"), 3).as("__sh"))
        .select(col("doc_id"), posexplode(col("__sh")).as(Seq("pos", "shingle")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("shingle"))),

    // ---- LLM pipeline: text normalization (pre-dedup cleanup) ----
    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: PII redaction (email/URL/number masking) ----
    "text_redact" -> ((s, dir) =>
      TextAnalysis.redactPii(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: document fingerprinting ----
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text", n = 3)),

    // ---- LLM pipeline: winnowing fingerprint selection (MOSS) ----
    // Scalar summary of the fingerprint SET (count/min/max) so the gate is
    // order-free: array_distinct and list_distinct order differently.
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprints(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 4)
        .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
          array_min(col("fp")).as("min_fp"), array_max(col("fp")).as("max_fp"))),

    // ---- Source: parquet FOOTER introspection — row-group statistics
    //      via parquet-mr (the metadata min-max pruning trusts),
    //      cross-checked against plain data aggregates computed by a
    //      completely independent reader ----
    "src_parquet_footer" -> ((s, dir) =>
      graft.sources.Formats.parquetFooterStats(
        s, s"$dir/events.parquet", Seq("event_id", "user_id"))),

    // ---- LLM pipeline: Kneser-Ney smoothed bigram LM (the KenLM
    //      default smoothing) as exact integer rationals — discount
    //      3/4, continuation counts, one common denominator ----
    "text_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNeyBigrams(
        t(s, dir, "documents"), "text", topK = 50)),

    // ---- LLM pipeline: ROUGE-L via the native LCS codegen kernel —
    //      the order-sensitive overlap score near-dup verification
    //      wants where n-gram Jaccard misses reordered spans; pairs =
    //      consecutive doc ids (the deterministic stand-in for LSH
    //      candidates, one equi-join, scale-safe); sequences truncated
    //      to 24 token hashes so the oracle DP stays bounded ----
    "text_rouge_lcs" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("doc_id").as("id_a"),
        slice(TextHash.wordHashes(col("text")), 1, 24).as("xs_a"))
      val right = t(s, dir, "documents").select(
        (col("doc_id") - 1L).as("id_a"), col("doc_id").as("id_b"),
        slice(TextHash.wordHashes(col("text")), 1, 24).as("xs_b"))
      toks.join(right, "id_a")
        .select(col("id_a"), col("id_b"),
          size(col("xs_a")).cast("long").as("n_a"),
          size(col("xs_b")).cast("long").as("n_b"),
          TextHash.lcs(col("xs_a"), col("xs_b")).as("lcs_len"))
        .withColumn("rouge_num", lit(2L) * col("lcs_len"))
        .withColumn("rouge_den", col("n_a") + col("n_b"))
    }),

    // ---- LLM pipeline: TOKEN-level Levenshtein edit distance via the
    //      native Wagner–Fischer kernel — the mutation metric ROUGE-L
    //      cannot give (LCS ignores substitutions; here every
    //      insert/delete/substitute costs 1). Same consecutive-id pair
    //      plan and 24-token truncation as text_rouge_lcs; tokens are
    //      reduced mod 94 on BOTH sides so DuckDB's own independent
    //      levenshtein() over the chr-embedded strings replays the
    //      token-level distance exactly (the embedding token→printable
    //      ASCII char is injective after the shared reduction). ----
    "text_edit_distance" -> ((s, dir) => {
      def codes(c: Column): Column =
        transform(slice(TextHash.wordHashes(c), 1, 24),
          h => pmod(h, lit(94L)))
      val a = t(s, dir, "documents").select(col("doc_id").as("id_a"),
        codes(col("text")).as("xs_a"))
      val b = t(s, dir, "documents").select(
        (col("doc_id") - 1L).as("id_a"), col("doc_id").as("id_b"),
        codes(col("text")).as("xs_b"))
      a.join(b, "id_a")
        .select(col("id_a"), col("id_b"),
          size(col("xs_a")).cast("long").as("n_a"),
          size(col("xs_b")).cast("long").as("n_b"),
          TextHash.editDistance(col("xs_a"), col("xs_b")).as("edit_dist"))
        .withColumn("sim_num",
          greatest(col("n_a"), col("n_b")) - col("edit_dist"))
        .withColumn("sim_den", greatest(col("n_a"), col("n_b")))
    }),

    // ---- LLM pipeline: context-window chunking (200 chars, 20 overlap) ----
    "text_chunk" -> ((s, dir) =>
      TextAnalysis.chunkChars(
        t(s, dir, "documents"), "doc_id", "text", size = 200, overlap = 20)),

    // ---- CAPSTONE: the composed corpus pipeline — normalize → quality
    //      filter → cluster-dedup (keep canonical docs) → split → stats.
    //      One gate proving the operators CHAIN, not just run alone. ----
    "pipeline_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val norm = TextAnalysis.normalize(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      val quality = norm.where(
        col("n_chars_norm") >= 20 && col("n_chars_norm") <= 10000)
      val clusters = graft.ops.Components.connectedComponents(
        NearDup.lshCandidatePairs(docs, "doc_id", "text", m = 8, n = 3, r = 2),
        "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      val keep = quality.join(clusters, Seq("doc_id"), "left_outer")
        .where(col("comp").isNull || col("comp") === col("doc_id"))
      keep
        .withColumn("split", graft.ops.Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars_norm")).cast("long").as("n_chars"),
          countDistinct(col("lang")).as("n_langs"))
    }),

    // ---- CAPSTONE 2: embedding curation pipeline in ONE composed plan —
    //      JL-project 64→16, learn k-means cells on the projection,
    //      SemDeDup-prune in-cell, report per-cell keep stats ----
    "pipeline_embeddings" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val proj = Similarity.randomProject(emb, "vec_id", "embedding",
        dim = 64, outDim = 16)
      val pv = proj.select(col("vec_id"),
        array((0 until 16).map(i => col(s"p$i")): _*).as("pv"))
      val dd = Similarity.semanticDedup(pv, "vec_id", "pv",
        Similarity.kmeansCentroids(pv, "vec_id", "pv", k = 4, iters = 1),
        threshold = 0.3)
      dd.groupBy("cell").agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
    }),

    // ---- Sources: format round-trips — write the corpus out as CSV /
    //      JSON / ORC, read it back with the same schema, and prove
    //      fidelity with content-sensitive aggregates (md5 extrema). The
    //      oracle reads the parquet originals: equal aggregates ⇒ the
    //      round-trip was lossless. ----
    // ---- Source format: FIXED-WIDTH records (the mainframe/legacy
    //      extract shape Spark lacks a reader for) — format orders into
    //      padded lines, write/read as text, parse by column slices,
    //      aggregate; the oracle aggregates the source directly, so the
    //      round trip must be lossless field-for-field ----
    "src_fixed_width" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_fw_").toString
      val lines = t(s, dir, "orders").select(concat(
        lpad(col("o_orderkey").cast("string"), 10, "0"),
        rpad(col("o_orderstatus"), 1, " "),
        lpad(floor(col("o_totalprice") * 100).cast("long").cast("string"),
          12, "0"),
        date_format(col("o_orderdate"), "yyyyMMdd")).as("value"))
      lines.write.mode("overwrite").text(tmp)
      val parsed = graft.sources.Formats.parseFixedWidth(
        s.read.text(tmp), "value", Seq(
          ("okey", 1, 10, "long"), ("status", 11, 1, "string"),
          ("cents", 12, 12, "long"), ("ymd", 24, 8, "string")))
      parsed.groupBy(col("status"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
          min(col("okey")).as("min_key"), max(col("okey")).as("max_key"),
          min(col("ymd")).as("min_ymd"), max(col("ymd")).as("max_ymd"))
    }),

    "src_csv_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_csv_").toString
      formatFidelity(graft.sources.Formats.roundTrip(
        s, t(s, dir, "documents"), "csv", s"$tmp/docs"))
    }),
    "src_json_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_json_").toString
      formatFidelity(graft.sources.Formats.roundTrip(
        s, t(s, dir, "documents"), "json", s"$tmp/docs"))
    }),
    "src_orc_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_orc_").toString
      formatFidelity(graft.sources.Formats.roundTrip(
        s, t(s, dir, "documents"), "orc", s"$tmp/docs"))
    }),
    // ---- Sources: gzip-compressed text ingestion — REAL DEFLATE
    //      decode (java.util.zip) of per-record gzip members, the
    //      .jsonl.gz / WARC-body interchange shape. The fixture gzips
    //      each doc's text in the kernel; the engine must decompress
    //      the BYTES while the oracle reads the plaintext directly. ----
    "src_gzip_text" -> ((s, dir) => {
      val d = graft.sources.Formats.gzipTextFixture(
        t(s, dir, "documents"), "doc_id", "text")
      graft.sources.Formats.gunzipText(d, "doc_id", "content")
        .select(col("id"), col("n_bytes"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
    }),

    // ---- Sources: .tar.gz walk — gunzip + POSIX ustar header walk
    //      (octal sizes, VERIFIED checksums, 512-block framing; the
    //      JDK has no tar reader, so this is a real format parser) ----
    "src_tar_entries" -> ((s, dir) => {
      val d = graft.sources.Formats.tarGzFixture(
        t(s, dir, "documents"), "doc_id", "text")
      graft.sources.Formats.tarGzEntries(d, "doc_id", "content")
    }),

    // ---- Sources: ZIP archive walk — two real DEFLATE entries per
    //      row (text + json sidecar); per-entry inflate + md5, zip-bomb
    //      caps, corrupt archives contribute zero rows ----
    "src_zip_entries" -> ((s, dir) => {
      val d = graft.sources.Formats.zipFixture(
        t(s, dir, "documents"), "doc_id", "text")
      graft.sources.Formats.zipEntries(d, "doc_id", "content")
    }),

    // ---- Sources: per-row charset decoding — half the fixture is
    //      ISO-8859-1 with a non-ASCII suffix, half UTF-8; the md5 is
    //      over the DECODED string's UTF-8 bytes, so reading latin-1
    //      bytes as UTF-8 (the classic mojibake bug) cannot match.
    //      STRICT decode: misdeclared charsets quarantine as NULLs. ----
    "src_charset_decode" -> ((s, dir) => {
      val d = graft.sources.Formats.charsetFixture(
        t(s, dir, "documents"), "doc_id", "text",
        suffix = " café ß ±½")
      graft.sources.Formats.decodeText(d, "doc_id", "content", "charset")
    }),

    // ---- Sources: WARC record ingestion — the Common Crawl shape:
    //      per-record gzip members, each a WARC/1.0 header block
    //      framing an HTTP response. The engine must inflate, walk the
    //      CRLF header blocks, honor Content-Length framing, and
    //      extract the body; the oracle reads the plaintext source. ----
    "src_warc_records" -> ((s, dir) => {
      val d = graft.sources.Warc.warcGzFixture(
        t(s, dir, "documents"), "doc_id", "text",
        uriOf = id => s"https://example.com/doc/$id",
        statusOf = id => if (id % 5 == 0) 404 else 200,
        ctypeOf = id =>
          if (id % 2 == 0) "text/html; charset=utf-8" else "text/plain")
      graft.sources.Warc.records(d, "doc_id", "content")
    }),

    // ---- Sources: malformed-JSONL ingestion — PERMISSIVE read with a
    //      corrupt-record column; broken lines are counted into a
    //      quarantine row instead of killing the read (FAILFAST) or
    //      vanishing (DROPMALFORMED) ----
    "src_jsonl_corrupt" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val tmp = Files.createTempDirectory("graft_jlc_").toString
      t(s, dir, "documents")
        .select(when(col("doc_id") % 97 === 0,
          concat(lit("{broken json line "), col("doc_id").cast("string")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"),
            col("n_chars")))).as("value"))
        .write.mode("overwrite").text(s"$tmp/lines")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("_bad", StringType)))
      // Spark disallows querying ONLY the corrupt column straight off a
      // raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the
      // parsed batch first, which an ingestion pipeline does anyway.
      val back = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(s"$tmp/lines")
        .localCheckpoint()
      val clean = back.filter(col("_bad").isNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val bad = back.filter(col("_bad").isNotNull)
        .agg(count(lit(1)).as("n_docs"))
        .select(lit("_corrupt").as("lang"), col("n_docs"),
          lit(null).cast("long").as("sum_chars"))
      clean.unionByName(bad)
    }),

    // Spark 4's built-in XML source (the spark-xml merge): rowTag-framed
    // records; same fidelity contract as the other interchange formats.
    "src_xml_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_xml_").toString
      formatFidelity(graft.sources.Formats.roundTrip(
        s, t(s, dir, "documents"), "xml", s"$tmp/docs",
        options = Map("rowTag" -> "doc")))
    }),

    // ---- Sources: hive-partitioned write + pruned read — the lang
    //      filter must resolve to directory pruning, not a scan-and-drop
    //      (FormatsSpec asserts the PartitionFilters in the plan) ----
    "src_partitioned_prune" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_part_").toString
      graft.sources.Formats.writePartitioned(
        t(s, dir, "documents"), s"$tmp/docs", Seq("lang"))
      graft.sources.Formats.readPartitioned(s, s"$tmp/docs")
        .filter(col("lang") === "en")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- Sources: schema-evolution read — shards written with and
    //      without a later-added column reconcile under mergeSchema
    //      (missing column -> NULL, by-name resolution) ----
    "src_schema_merge" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_msch_").toString
      val docs = t(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.parquet(s"$tmp/m/batch=0")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") * 2L).as("quality"))
        .write.parquet(s"$tmp/m/batch=1")
      graft.sources.Formats.readMergedSchema(s, s"$tmp/m")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          coalesce(sum(col("quality")), lit(0L)).as("sum_quality"))
    }),

    // ---- LLM pipeline: BM25 keyword top-k (lexical search) ----
    "bm25_topk" -> ((s, dir) =>
      graft.ops.TextRank.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text", Bm25Terms, k = Bm25K)),

    // ---- LLM pipeline: TextRank-style keyword extraction — fixed-point
    //      PageRank over the adjacent-word co-occurrence graph (word
    //      nodes = mod-P hashes, so the oracle replays the whole loop),
    //      top-20 by exact integer rank ----
    "text_keywords_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val wh = docs.select(
        TextHash.wordHashes(lower(col("text"))).as("__wh"))
      val adj = wh.filter(size(col("__wh")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("__wh")) - 1),
          i => struct(element_at(col("__wh"), i).as("a"),
            element_at(col("__wh"), i + 1).as("b")))).as("__p"))
        .select(col("__p.a").as("a"), col("__p.b").as("b"))
        .filter(col("a") =!= col("b"))
      val edges = adj.unionByName(
        adj.select(col("b").as("a"), col("a").as("b")))
      val ranked = graft.ops.Graph.pageRank(edges, "a", "b", iters = 3)
      val wmap = docs
        .select(explode(TextHash.words(lower(col("text")))).as("w"))
        .select(col("w"), TextHash.wordHash(col("w")).as("node"))
        .groupBy(col("node")).agg(min(col("w")).as("word"))
      ranked.orderBy(col("rank_q").desc, col("node").asc).limit(20)
        .join(wmap, "node")
        .select(col("node"), col("word"), col("rank_q"))
    }),

    // ---- LLM pipeline: Gopher-style repetition quality metrics ----
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: lexical diversity (TTR + hapax ratio — the
    //      vocabulary-richness quality signal) ----
    "text_ttr" -> ((s, dir) =>
      TextAnalysis.lexicalDiversity(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: boilerplate-line detection (cross-doc line df —
    //      the C4-style template cleaner; per-doc boilerplate ratio) ----
    "text_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateLines(
        t(s, dir, "documents"), "doc_id", "text", minDf = 3L)),

    // ---- LLM pipeline: corpus-wide duplicate-LINE removal (the
    //      CCNet/RefinedWeb scrub): keep only the FIRST occurrence of
    //      each line across the corpus, in (doc, pos) order; fixture
    //      manufactures lines by splitting the text on two frequent
    //      words; md5 fingerprints the kept body per doc ----
    // ---- Text scrub: HOMOGLYPH confusables — Cyrillic/Greek
    //      lookalikes spliced into Latin words defeat exact AND
    //      shingle dedup (the text hashes "unique"); the scan counts
    //      confusable codepoints and mixed-script tokens and emits the
    //      UTS#39-style skeleton md5 (ids 1 mod 3 get three classes
    //      swapped, 2 mod 3 only 'о', 0 mod 3 stay clean — their
    //      skeleton md5 must equal the original text's) ----
    "text_confusable_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val spiked = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 1,
          translate(col("text"), "aeo", "аео"))
          .when(col("doc_id") % 3 === 2,
            translate(col("text"), "o", "о"))
          .otherwise(col("text")).as("text"))
      TextAnalysis.confusableScan(spiked, "doc_id", "text")
    }),

    "text_line_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        call_function("replace",
          call_function("replace", col("text"), lit(" a "), lit("\n")),
          lit(" the "), lit("\n")).as("txt"))
      TextAnalysis.corpusLineDedup(d, "doc_id", "txt")
    }),

    // ---- LLM pipeline: HTML → visible-text extraction (the step
    //      between WARC and every text op): comment/script/style
    //      removal BEFORE tag stripping, entity decode AFTER (the
    //      order that can't double-decode or eat script '<'s), title
    //      + link-count extraction. Patterns shared verbatim with the
    //      oracle — both engines run the same automaton. ----
    "text_html_extract" -> ((s, dir) =>
      Html.extract(htmlFixture(s, dir), "doc_id", "html")),

    // ---- LLM pipeline CAPSTONE: the crawl-ingest composition — gzip
    //      WARC members (HTTP-framed HTML) -> record parse -> visible-
    //      text extraction -> token count, one chained plan. The
    //      oracle replays every stage from the plaintext source, so
    //      stage ORDER and framing are the verified contract. ----
    "pipeline_crawl" -> ((s, dir) => {
      val warcGz = graft.sources.Warc.warcGzFixture(
        htmlFixture(s, dir), "doc_id", "html",
        uriOf = id => s"https://example.com/doc/$id",
        statusOf = id => if (id % 5 == 0) 404 else 200,
        ctypeOf = _ => "text/html; charset=utf-8")
      graft.sources.Warc
        .records(warcGz, "doc_id", "content", keepBody = true)
        .select(col("id").as("doc_id"), col("http_status"), col("body"))
        .withColumn("__txt", Html.visibleText(col("body")))
        .select(col("doc_id"), col("http_status"),
          trim(regexp_extract(col("body"), Html.TitlePat, 1)).as("title"),
          (size(split(col("body"), Html.LinkPat, -1)) - 1)
            .cast("long").as("n_links"),
          size(TextHash.words(col("__txt"))).cast("long").as("n_tokens"),
          md5(col("__txt").cast("binary")).as("text_md5"))
    }),

    // ---- Crawl pipeline: robots.txt evaluation (RFC 9309) — group
    //      selection (a bot with its OWN group ignores the '*' group's
    //      /tmp ban), wildcard + $-anchored rules, longest-match
    //      precedence with Allow on ties. The oracle replays the
    //      decision procedure over the same fixed rule table. ----
    "text_robots_filter" -> ((s, dir) => {
      val id = col("doc_id")
      val path = when(id % 5 === 0, concat(lit("/private/"), id))
        .when(id % 5 === 1, concat(lit("/private/ok/"), id))
        .when(id % 5 === 2, concat(lit("/tmp/x"), id, lit(".html")))
        .when(id % 5 === 3, concat(lit("/doc/"), id))
        .otherwise(concat(lit("/cgi/"), id, lit(".php")))
      val robots =
        """# graft fixture
          |User-agent: graftbot
          |Disallow: /private/
          |Allow: /private/ok/
          |Disallow: /*.php$
          |
          |User-agent: other
          |Disallow: /
          |
          |User-agent: *
          |Disallow: /tmp
          |""".stripMargin
      graft.ops.Robots.filterAllowed(
        t(s, dir, "documents").select(id, path.as("path")),
        "doc_id", "path", robots, agent = "GraftBot")
    }),

    // ---- LLM pipeline: cross-document duplicate-SPAN detection (the
    //      exact-substring dedup complement): 5-grams in ≥2 distinct
    //      docs, consecutive duplicated positions merged to maximal
    //      spans, overlap-exact coverage per doc ----
    "text_dup_spans" -> ((s, dir) =>
      TextAnalysis.dupSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 5, minDf = 2L)),

    // ---- LLM pipeline: Unicode NFC normalization — fixture appends
    //      decomposed (e+́ , A+̊ ) or precomposed (é) tails by id, so
    //      `changed` splits the corpus and the md5 proves the engine
    //      produced the same canonical bytes DuckDB's nfc_normalize
    //      does ----
    "text_nfc_normalize" -> ((s, dir) => {
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        concat(col("text"),
          when(id % 3 === 0, lit(" cafe\u0301")) //  e + combining acute
            .when(id % 3 === 1, lit(" caf\u00e9")) //       precomposed
            .otherwise( //      A + combining ring, o + combining diaeresis
              lit(" A\u030Angstro\u0308m")))
          .as("txt"))
      TextAnalysis.normalizeNfc(d, "doc_id", "txt")
    }),

    // ---- LLM pipeline CAPSTONE: the composed scrub pass — splice PII
    //      into every doc, manufacture lines, corpus-dedup the lines
    //      (first occurrence survives), redact PII in the KEPT body,
    //      count surviving tokens. One gate proving the scrub stages
    //      compose; the oracle chains the same stages in SQL. ----
    "text_scrub_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        call_function("replace",
          call_function("replace",
            piiFixtureText(col("doc_id"), col("text")),
            lit(" a "), lit("\n")),
          lit(" the "), lit("\n")).as("txt"))
      val dd = TextAnalysis.corpusLineDedup(d, "doc_id", "txt",
        keepText = true)
      val red = graft.ops.Pii.redact(dd, "doc_id", "kept_text")
        .withColumnRenamed("redacted_text", "__red")
      dd.select(col("doc_id"), col("n_lines"), col("n_kept"))
        .join(red, "doc_id")
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("redacted_len"), col("redacted_md5"),
          size(filter(split(col("__red"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_tokens"))
    }),

    // ---- LLM pipeline: PII scan — regex recall net + exact arithmetic
    //      validation (octet ≤ 255, Luhn mod-10) over a fixture that
    //      splices synthetic emails/IPs/phones/cards into each doc;
    //      ~15% of IPs fail octet validation and most cards fail Luhn,
    //      so candidates vs valid genuinely diverge ----
    "text_pii_scan" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), piiFixtureText(col("doc_id"), col("text"))
          .as("pii_text"))
      graft.ops.Pii.scan(d, "doc_id", "pii_text")
    }),

    // ---- LLM pipeline: PII redaction — fixed-order global regex
    //      rewrite to typed placeholders; gate ships length + md5 of
    //      the redacted body (the verifiable stand-in) ----
    "text_pii_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), piiFixtureText(col("doc_id"), col("text"))
          .as("pii_text"))
      graft.ops.Pii.redact(d, "doc_id", "pii_text", keepText = false)
    }),

    // ---- LLM pipeline: sentence-level shape stats (structural half of
    //      the quality stack) ----
    "text_sentences" -> ((s, dir) =>
      TextAnalysis.sentenceStats(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: Flesch-style readability (deterministic
    //      vowel-group syllable proxy; row-local) ----
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")),

    // ---- Crawl pipeline: URL decomposition (host / registered domain /
    //      path / query / tld) — row-local regexp parse with an explicit
    //      compound-suffix heuristic; URLs synthesized deterministically
    //      from document fields (the corpus has no URL column), mixing
    //      www subdomains, co.uk suffixes, ports-free hosts, queries ----
    "text_url_parse" -> ((s, dir) => {
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example"),
        when(col("doc_id") % 5 === 0, lit(".co.uk")).otherwise(lit(".com")),
        lit("/docs/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("?lang="), col("lang"))).otherwise(lit("")))
      TextAnalysis.urlParse(
        t(s, dir, "documents").select(col("doc_id"), url.as("u")),
        "doc_id", "u")
    }),

    // ---- LLM pipeline: Zipf fit of the token distribution (corpus
    //      health: exponent + head-mass shares) ----
    "text_zipf_fit" -> ((s, dir) =>
      TextAnalysis.zipfFit(t(s, dir, "documents"), "text")),

    // ---- LLM pipeline: unigram-LM quality scoring (perplexity proxy) ----
    "text_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: bigram-LM quality scoring (the sharper CCNet-
    //      style perplexity proxy — conditional P(w2|w1), add-one
    //      smoothed, same fixed-point determinism as the unigram) ----
    "text_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")),

    // ---- Sources: training-shard export (split dirs, capped files) ----
    "src_shard_export" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_shard_").toString
      val split = graft.ops.Sampling.assignSplits(
        t(s, dir, "documents"), "doc_id")
      graft.sources.Formats.writeShards(split, s"$tmp/shards", "split",
        maxRecordsPerShard = 100L)
      s.read.parquet(s"$tmp/shards").groupBy("split").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- Sources: JSONL training-shard export — the classic LLM
    //      delivery format; split-partitioned, file-capped, read back
    //      through the schema-carrying json reader and re-aggregated ----
    "src_jsonl_export" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_jsonl_").toString
      val split = graft.ops.Sampling.assignSplits(
        t(s, dir, "documents"), "doc_id")
      graft.sources.Formats.writeShards(split, s"$tmp/shards", "split",
        maxRecordsPerShard = 100L, format = "json")
      s.read.schema("doc_id BIGINT, text STRING, lang STRING, " +
          "source STRING, n_chars BIGINT, split STRING")
        .json(s"$tmp/shards")
        .groupBy("split").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- Corpus analysis: Dunning log-likelihood keyness — top-50
    //      terms characterizing the src0-4 slice vs the rest ----
    "text_keyness_llr" -> ((s, dir) =>
      TextAnalysis.keynessLLR(
        t(s, dir, "documents"), "text",
        col("source").isin("src0", "src1", "src2", "src3", "src4"),
        k = 50)),

    // ---- Corpus analysis: Jensen-Shannon divergence between the
    //      src0-4 slice's unigram distribution and the rest — the
    //      bounded domain-mix drift scalar; count-pair-grid fold ----
    "text_jsd_domains" -> ((s, dir) =>
      TextAnalysis.jsDivergence(
        t(s, dir, "documents"), "text",
        col("source").isin("src0", "src1", "src2", "src3", "src4"))),
  )

  def oracles: Map[String, String] = {
    // Confusable scrub replay: rebuild the spiked fixture with the
    // same translate splice, then mirror the scan — n_confusable via
    // delete-translate length delta, mixed tokens via the shared char
    // class, skeleton via the same from/to map (translate is
    // per-codepoint in BOTH engines).
    val confusableSql = {
      val from = graft.ops.TextAnalysis.ConfusableFrom
      val to = graft.ops.TextAnalysis.ConfusableTo
      "WITH sp AS (SELECT doc_id AS id, CASE " +
        "WHEN doc_id % 3 = 1 THEN translate(text, 'aeo', 'аео') " +
        "WHEN doc_id % 3 = 2 THEN translate(text, 'o', 'о') " +
        "ELSE text END AS t FROM documents) " +
        "SELECT id, " +
        s"CAST(length(t) - length(translate(t, '$from', '')) AS BIGINT) " +
        "AS n_confusable, " +
        "CAST(len(list_filter(string_split_regex(t, '\\s+'), tk -> " +
        s"regexp_matches(tk, '[a-z]') AND regexp_matches(tk, '[$from]')" +
        ")) AS BIGINT) AS n_mixed_tokens, " +
        s"md5(translate(t, '$from', '$to')) AS skeleton_md5 FROM sp"
    }
    val htmlTxtCtes: String =
      "h AS (SELECT doc_id, " +
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || " +
        "'</title><script type=\"text/javascript\">var x = 1 < 2;" +
        "</script><style>p { color: red; }</style></head><body>" +
        "<!-- comment <b>x</b> --><h1>Doc</h1><p>' || text || " +
        "' &lt;tag&gt; &amp;co &quot;q&quot; &#39;s&#39;</p>' || " +
        "CASE WHEN doc_id % 3 >= 1 " +
        "THEN '<a href=\"/l1\">one</a>' ELSE '' END || " +
        "CASE WHEN doc_id % 3 = 2 " +
        "THEN '<a class=\"z\" href=\"/l2\">two</a>' ELSE '' END || " +
        "'</body></html>' AS html FROM documents), " +
        "t0 AS (SELECT doc_id, html, regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(html, " +
        s"'${graft.ops.Html.CommentPat}', ' ', 'g'), " +
        s"'${graft.ops.Html.ScriptPat}', ' ', 'g'), " +
        s"'${graft.ops.Html.StylePat}', ' ', 'g'), " +
        s"'${graft.ops.Html.TagPat}', ' ', 'g') AS s FROM h), " +
        "d AS (SELECT doc_id, html, trim(regexp_replace(" +
        "replace(replace(replace(replace(replace(s, " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
        "'&#39;', chr(39)), '&amp;', '&'), " +
        "'\\s+', ' ', 'g')) AS txt FROM t0)"
    val fidelitySql =
      "SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(sum(length(text)) AS BIGINT) AS sum_len, " +
        "min(md5(text)) AS min_md5, max(md5(text)) AS max_md5 " +
        "FROM documents GROUP BY lang"

    // CTE body shared by the bm25 gate and the rank-fusion gate (which
    // re-ranks the same `top` list before fusing).
    val bm25Sql =
      s"WITH $bm25Ctes SELECT doc_id, round(score, 8) AS score FROM top"
    val keywordsPagerankSql = {
      val whs = OracleSql.wordHashes("t")
      val wordHashW = OracleSql.wordHash("w")
      "WITH dl AS (SELECT lower(text) AS t FROM documents), " +
        s"wh AS (SELECT $whs AS whs FROM dl), " +
        "adju AS (SELECT unnest(list_transform(range(1, len(whs)), " +
        "i -> struct_pack(a := whs[i], b := whs[i + 1]))) AS p " +
        "FROM wh WHERE len(whs) >= 2), " +
        "adj AS (SELECT p.a AS a, p.b AS b FROM adju WHERE p.a <> p.b), " +
        "e AS (SELECT a AS src, b AS dst FROM adj " +
        "UNION SELECT b, a FROM adj), " +
        OracleSql.pageRankCtes(iters = 3) + ", " +
        "tp AS (SELECT node, rank_q FROM it3 " +
        "ORDER BY rank_q DESC, node LIMIT 20), " +
        "wmap AS (SELECT node, min(w) AS word FROM (" +
        s"SELECT w, $wordHashW AS node FROM (" +
        s"SELECT unnest(${OracleSql.words("t")}) AS w FROM dl)) GROUP BY node) " +
        "SELECT t.node AS node, m.word, t.rank_q " +
        "FROM tp t JOIN wmap m ON t.node = m.node"
    }
    val repetitionSql =
      "WITH base AS (SELECT doc_id, " +
        "string_split_regex(lower(text), '\\s+') AS l FROM documents), " +
        "wordsu AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, " +
        "unnest(l) AS w FROM base), " +
        "words AS (SELECT * FROM wordsu WHERE w <> ''), " +
        "wc AS (SELECT doc_id, w, count(*) AS c " +
        "FROM words GROUP BY doc_id, w), " +
        "per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, " +
        "count(*) AS n_distinct, max(c) AS top_c, " +
        "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_c " +
        "FROM wc GROUP BY doc_id), " +
        "bgw AS (SELECT doc_id, w, " +
        "lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM words), " +
        "bg AS (SELECT doc_id, w || ' ' || nxt AS bg FROM bgw " +
        "WHERE nxt IS NOT NULL), " +
        "bgc AS (SELECT doc_id, bg, count(*) AS c " +
        "FROM bg GROUP BY doc_id, bg), " +
        "bper AS (SELECT doc_id, max(c) AS top_bg, " +
        "CAST(sum(c) AS BIGINT) AS n_bg FROM bgc GROUP BY doc_id) " +
        "SELECT p.doc_id, p.n_words, p.n_distinct, " +
        "CAST(p.top_c AS DOUBLE) / p.n_words AS top_word_frac, " +
        "CAST(p.dup_c AS DOUBLE) / p.n_words AS dup_word_frac, " +
        "coalesce(CAST(b.top_bg AS DOUBLE) / b.n_bg, CAST(0 AS DOUBLE)) " +
        "AS top_bigram_frac " +
        "FROM per p LEFT JOIN bper b USING (doc_id)"
    val shardExportSql =
      s"SELECT CASE WHEN $hashBucket < 80 THEN 'train' " +
        s"WHEN $hashBucket < 90 THEN 'val' ELSE 'test' END AS split, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY 1"
    val topNgramsSql = {
      val words = OracleSql.words("text")
      s"WITH base AS (SELECT doc_id, $words AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN " +
        "list_transform(range(0, len(toks)-2), " +
        "i -> array_to_string(toks[i+1:i+3], ' ')) " +
        "ELSE CAST([] AS VARCHAR[]) END) AS ngram FROM base), " +
        "a AS (SELECT ngram, count(*) AS cnt, count(DISTINCT doc_id) AS df " +
        "FROM g GROUP BY ngram) " +
        "SELECT ngram, CAST(cnt AS BIGINT) AS cnt, CAST(df AS BIGINT) AS df, " +
        "CAST(row_number() OVER (ORDER BY cnt DESC, ngram) AS BIGINT) AS rank " +
        "FROM a QUALIFY rank <= 20"
    }
    val pipelineEmbeddings = {
      val proj = (0 until 16).map { i =>
        OracleSql.foldSum(s"list_transform(range(0, 64), j -> " +
          s"v0[j+1] * ${OracleSql.planeSign(i, "j", 64)})") + s" AS p$i"
      }.mkString(", ")
      val pvList = (0 until 16).map(i => s"p$i").mkString("[", ", ", "]")
      val dotVC = OracleSql.dot("n.v", "c.cv")
      val dotXY = OracleSql.dot("x.v", "y.v")
      "WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 " +
        "FROM embeddings), " +
        s"pr AS (SELECT vec_id, $proj FROM e0), " +
        s"pvt AS (SELECT vec_id, $pvList AS v FROM pr), " +
        s"n AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) AS nrm " +
        "FROM pvt), " +
        "samp AS (SELECT * FROM n), " +
        OracleSql.kmeansCtes("vec_id", k = 4, iters = 1, dim = 16) + ", " +
        "c AS (SELECT * FROM c1), " +
        s"a AS (SELECT n.vec_id, n.v, n.nrm, c.cid, " +
        s"$dotVC / (n.nrm * c.cnrm) AS cos FROM n CROSS JOIN c), " +
        "cell AS (SELECT vec_id, v, nrm, cid AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, cid ASC) AS rn FROM a) WHERE rn = 1), " +
        s"d AS (SELECT DISTINCT x.vec_id FROM cell x JOIN cell y " +
        s"ON x.cell = y.cell AND x.nrm > 0 AND y.nrm > 0 " +
        s"AND y.vec_id < x.vec_id " +
        s"AND $dotXY / (x.nrm * y.nrm) >= 0.3) " +
        "SELECT cl.cell, count(*) AS n_vecs, " +
        "CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_kept, " +
        "CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) " +
        "AS n_dropped FROM cell cl LEFT JOIN d ON cl.vec_id = d.vec_id " +
        "GROUP BY cl.cell"
    }

    // IVF-PQ replay: the coarse chain (ivfKmeans + cell assignment),
    // per-vector residuals, one kmeans chain per residual subspace,
    // codeword reconstruction ADDED BACK onto the cell centroid,
    // nprobe=2 probing, ADC ranking, exact rerank — every stage the
    // same arithmetic the standalone IVF and PQ oracles already pin.
    val pipelineCorpusSql = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      val cleaned = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[\\x00-\\x1f]', ' ', 'g'), '\\s+', ' ', 'g'))"
      val bucket = s"((((doc_id * ${TextHash.permuteA(0)} + " +
        s"${TextHash.permuteB(0)}) % ${TextHash.P}) % 100) + 100) % 100"
      s"WITH RECURSIVE base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
        s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM banded a JOIN banded b " +
        "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM cand " +
        "UNION SELECT id_b AS src, id_a AS dst FROM cand), " +
        "reach(id, r) AS (SELECT DISTINCT src, src FROM edges " +
        "UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), " +
        "clusters AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id), " +
        s"norm AS (SELECT doc_id, lang, length($cleaned) AS n FROM documents), " +
        "q AS (SELECT * FROM norm WHERE n >= 20 AND n <= 10000), " +
        "keep AS (SELECT q.doc_id, q.lang, q.n FROM q LEFT JOIN clusters c " +
        "USING (doc_id) WHERE c.doc_id IS NULL OR c.comp = q.doc_id), " +
        s"sp AS (SELECT *, CASE WHEN $bucket < 80 THEN 'train' " +
        s"WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split FROM keep) " +
        "SELECT split, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_chars, " +
        "count(DISTINCT lang) AS n_langs FROM sp GROUP BY split"
    }
    val langIdSql = {
      val scoreCols = LangProfiles.map { case (lang, re) =>
        s"len(regexp_extract_all(text, '$re')) AS score_$lang"
      }.mkString(", ")
      val best = LangProfiles.map(p => s"score_${p._1}").mkString("greatest(", ", ", ")")
      val pred = LangProfiles.init.map { case (lang, _) =>
        s"WHEN score_$lang = g THEN '$lang'"
      }.mkString("CASE ", " ", s" ELSE '${LangProfiles.last._1}' END")
      s"WITH sc AS (SELECT doc_id, $scoreCols FROM documents), " +
        s"sg AS (SELECT *, $best AS g FROM sc) " +
        s"SELECT doc_id, ${LangProfiles.map(p => s"score_${p._1}").mkString(", ")}, " +
        s"$pred AS pred_lang FROM sg"
    }
    val tokenClassesSql =
      "WITH c AS (SELECT doc_id, " +
        "len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha_tokens, " +
        "len(regexp_extract_all(text, '[0-9]')) AS n_digit_tokens, " +
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct_tokens " +
        "FROM documents) " +
        "SELECT doc_id, n_alpha_tokens, n_digit_tokens, n_punct_tokens, " +
        "n_alpha_tokens + n_digit_tokens + n_punct_tokens AS n_bpe_tokens FROM c"

    // Position domain is derived from the data (max shingle count), not a
    // hard-coded bound a long doc could silently overflow at larger SFs.
    val shinglesExplode =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents WHERE doc_id % 25 = 0), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base) " +
        "SELECT doc_id, CAST(g.i AS BIGINT) AS pos, sh[g.i + 1] AS shingle " +
        "FROM sh_t CROSS JOIN (SELECT unnest(range(" +
        "(SELECT coalesce(max(len(sh)), 0) FROM sh_t))) AS i) g " +
        "WHERE g.i < len(sh)"

    // DuckDB regexp_replace needs the 'g' flag (default = first match
    // only); Spark's replaces all matches. Patterns are the same Scala
    // constants (RE2 ∩ Java-regex subset).
    val redactSql = {
      import TextAnalysis.{EmailRe, LongNumRe, UrlRe}
      s"WITH r AS (SELECT doc_id, text AS t0, " +
        s"regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM documents), " +
        s"r2 AS (SELECT doc_id, t0, t1, " +
        s"regexp_replace(t1, '$UrlRe', '<URL>', 'g') AS t2 FROM r) " +
        s"SELECT doc_id, " +
        s"len(regexp_extract_all(t0, '$EmailRe')) AS n_emails, " +
        s"len(regexp_extract_all(t1, '$UrlRe')) AS n_urls, " +
        s"len(regexp_extract_all(t2, '$LongNumRe')) AS n_numbers, " +
        s"regexp_replace(t2, '$LongNumRe', '<NUM>', 'g') AS text_redacted FROM r2"
    }
    val winnowFpCte =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        "f AS (SELECT doc_id, CASE WHEN len(sh) = 0 THEN CAST([] AS BIGINT[]) " +
        "WHEN len(sh) < 4 THEN [list_min(sh)] " +
        "ELSE list_distinct(list_transform(range(0, len(sh) - 3), " +
        "i -> list_min(sh[i+1:i+4]))) END AS fp FROM sh_t)"
    val winnowSql =
      s"$winnowFpCte SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp, " +
        "list_min(fp) AS min_fp, list_max(fp) AS max_fp FROM f"

    // w=8 fingerprint CTE (text_winnow's f uses w=4; this one selects over
    // 8-wide windows for the longer shared-run bar)
    // Per-position CDC boundary replay (H_i over the trailing 8 bytes,
    // ASCII fixture: char == byte), prefix-count chunk ids, md5 of each
    // substring — shared by the chunk gate and the storage-stats gate.
    val fingerprintSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"s AS (SELECT doc_id, wh, list_distinct(${OracleSql.shingles("wh", 3)}) AS sh FROM base) " +
        s"SELECT doc_id, ${OracleSql.docHash("wh")} AS doc_fp, " +
        "list_min(sh) AS min_shingle, CAST(len(sh) AS BIGINT) AS n_shingles FROM s"

    // Shared real-pixel luma-grid replay for the perceptual-hash
    // oracles: the fixture (MediaFixtures.pngPixelHex) splices the
    // closed-form raster P(x,y) = (31x + 47y + 7xy + 101s) mod 256 into
    // a genuine zlib/PNG byte stream; the engine must decode the BYTES
    // (inflate, unfilter, area-average) while the oracle area-averages
    // the formula directly over the same pixel blocks. Dims ≥ (9, 8) by
    // fixture construction, so every grid cell is non-empty and the
    // kernel's nearest-pixel fallback never fires.
    // Per-pixel closed forms the image fixtures carry: the PNG/GIF/BMP
    // raster formula, and the DC-only JPEG flat-block formula (pixel =
    // 2·coef + 128 with coef keyed off the 8×8 block coordinates).
    Map(
      "text_tokens" ->
        ("SELECT doc_id, " +
          "array_length(regexp_split_to_array(text, '\\s+')) AS n_tokens, " +
          "length(text) AS n_chars_out FROM documents"),
      "text_chunk" ->
        ("WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents), " +
          "n AS (SELECT doc_id, text, " +
          "greatest(1, CAST(ceil((len - 20) / 180.0) AS BIGINT)) AS n_chunks FROM d), " +
          "g AS (SELECT doc_id, text, unnest(range(n_chunks)) AS i FROM n) " +
          "SELECT doc_id, i AS chunk_idx, i * 180 AS chunk_start, " +
          "substr(text, CAST(i * 180 + 1 AS INT), 200) AS chunk_text, " +
          "CAST(length(substr(text, CAST(i * 180 + 1 AS INT), 200)) AS BIGINT) " +
          "AS n_chunk_chars FROM g"),
      "text_ttr" ->
        ("WITH tk AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), " +
          "x -> len(x) > 0)) AS w FROM documents), " +
          "g AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2) " +
          "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
          "CAST(count(*) AS BIGINT) AS n_types, " +
          "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_hapax, " +
          "CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr, " +
          "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(sum(c) AS DOUBLE) AS hapax_ratio " +
          "FROM g GROUP BY doc_id"),
      "text_boilerplate" ->
        ("WITH ln AS (SELECT DISTINCT doc_id, trim(lower(l)) AS line " +
          "FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l " +
          "FROM documents) WHERE trim(lower(l)) <> ''), " +
          "df AS (SELECT line, CAST(count(*) AS BIGINT) AS d FROM ln " +
          "GROUP BY 1) " +
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
          "CAST(sum(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_boiler, " +
          "CAST(sum(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS boiler_ratio " +
          "FROM ln JOIN df USING (line) GROUP BY doc_id"),
      "text_quality" ->
        ("SELECT doc_id, length(text) AS n_chars_out, " +
          "length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha, " +
          "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / " +
          "length(text) AS alpha_ratio, " +
          "len(regexp_extract_all(text, '\\bthe\\b')) AS n_the FROM documents"),
      "text_nfc_normalize" ->
        // DuckDB's own nfc_normalize + code-point length replay the
        // JDK Normalizer — both implement the same public Unicode
        // canonicalization tables, so md5 of the NFC bytes must agree.
        ("WITH d AS (SELECT doc_id, text || CASE " +
          "WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) " +
          "WHEN doc_id % 3 = 1 THEN ' caf' || chr(233) " +
          "ELSE ' A' || chr(778) || 'ngstro' || chr(776) || 'm' END " +
          "AS txt FROM documents) " +
          "SELECT doc_id AS id, CAST(length(txt) AS BIGINT) AS n_cp_raw, " +
          "CAST(length(nfc_normalize(txt)) AS BIGINT) AS n_cp_nfc, " +
          "nfc_normalize(txt) <> txt AS changed, " +
          "md5(nfc_normalize(txt)) AS nfc_md5 FROM d"),
      "text_scrub_pipeline" ->
        // The composed replay: pii-spliced text -> manufactured lines ->
        // first-occurrence keep -> kept body -> fixed-order redaction ->
        // md5 + whitespace token count. Stage order matters and is the
        // contract.
        (s"WITH d AS (SELECT doc_id, replace(replace($piiFixtureSql, " +
          "' a ', chr(10)), ' the ', chr(10)) AS txt FROM documents), " +
          "sp AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM d), " +
          "l0 AS (SELECT doc_id, unnest(range(len(ls))) AS pos, " +
          "unnest(ls) AS raw FROM sp), " +
          "l AS (SELECT doc_id, pos, trim(raw) AS line FROM l0 " +
          "WHERE trim(raw) <> ''), " +
          "k AS (SELECT doc_id, pos, line, " +
          "row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1 " +
          "AS keep FROM l), " +
          "g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
          "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_kept, " +
          "coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) " +
          "ORDER BY pos), '') AS kept FROM k GROUP BY doc_id), " +
          "r AS (SELECT doc_id, n_lines, n_kept, " +
          "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
          s"kept, '${graft.ops.Pii.EmailPat}', '<EMAIL>', 'g'), " +
          s"'${graft.ops.Pii.Ipv4Pat}', '<IP>', 'g'), " +
          s"'${graft.ops.Pii.PhonePat}', '<PHONE>', 'g'), " +
          s"'${graft.ops.Pii.CardPat}', '<CARD>', 'g') AS red FROM g) " +
          "SELECT doc_id, n_lines, n_kept, " +
          "CAST(length(red) AS BIGINT) AS redacted_len, " +
          "md5(red) AS redacted_md5, " +
          "CAST(len(list_filter(regexp_split_to_array(red, '\\s+'), " +
          "w -> w <> '')) AS BIGINT) AS n_tokens FROM r"),
      "text_confusable_scrub" -> confusableSql,
      "text_line_dedup" ->
        // First-occurrence keep in (doc, pos) order; the oracle's
        // row_number window partitions by LINE (bounded by the most
        // duplicated line, not the corpus). Kept body re-joined by \n,
        // md5 both sides; all-dropped docs hash the empty string.
        ("WITH d AS (SELECT doc_id, replace(replace(text, ' a ', " +
          "chr(10)), ' the ', chr(10)) AS txt FROM documents), " +
          "sp AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM d), " +
          "l0 AS (SELECT doc_id, unnest(range(len(ls))) AS pos, " +
          "unnest(ls) AS raw FROM sp), " +
          "l AS (SELECT doc_id, pos, trim(raw) AS line FROM l0 " +
          "WHERE trim(raw) <> ''), " +
          "k AS (SELECT doc_id, pos, line, " +
          "row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1 " +
          "AS keep FROM l) " +
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
          "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
          "md5(coalesce(string_agg(CASE WHEN keep THEN line END, " +
          "chr(10) ORDER BY pos), '')) AS kept_md5 " +
          "FROM k GROUP BY doc_id"),
      "text_html_extract" ->
        // Same automaton, same order: comment/script/style -> tags ->
        // entities (&amp; last) -> whitespace collapse. Pattern
        // constants interpolated from ops/Html — one source of truth.
        (s"WITH $htmlTxtCtes " +
          "SELECT doc_id, " +
          s"trim(regexp_extract(html, '${Html.TitlePat}', 1)) AS title, " +
          s"CAST(len(regexp_extract_all(html, '${Html.LinkPat}')) " +
          "AS BIGINT) AS n_links, " +
          "CAST(length(txt) AS BIGINT) AS text_len, " +
          "md5(txt) AS text_md5 FROM d"),
      "pipeline_crawl" ->
        // Full-chain replay: the SAME html CTEs, plus the WARC layer's
        // closed-form status and the token count of the extracted text
        // — gzip framing, record parse, extraction, and tokenization
        // all had to hold for the md5 to match.
        (s"WITH $htmlTxtCtes " +
          "SELECT doc_id, " +
          "CAST(CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS INT) " +
          "AS http_status, " +
          s"trim(regexp_extract(html, '${Html.TitlePat}', 1)) AS title, " +
          s"CAST(len(regexp_extract_all(html, '${Html.LinkPat}')) " +
          "AS BIGINT) AS n_links, " +
          s"CAST(len(${OracleSql.words("txt")}) AS BIGINT) AS n_tokens, " +
          "md5(txt) AS text_md5 FROM d"),
      "text_robots_filter" ->
        // Decision replay over the fixed rule table (the binding
        // graftbot group: Disallow /private/ len 9, Allow /private/ok/
        // len 12, Disallow /*.php$ len 7; the '*' group's /tmp rule
        // does NOT bind): longest match wins, ties -> Allow, no match
        // (-1 >= -1) -> allowed.
        ("WITH p AS (SELECT doc_id, CASE CAST(doc_id % 5 AS INT) " +
          "WHEN 0 THEN '/private/' || doc_id " +
          "WHEN 1 THEN '/private/ok/' || doc_id " +
          "WHEN 2 THEN '/tmp/x' || doc_id || '.html' " +
          "WHEN 3 THEN '/doc/' || doc_id " +
          "ELSE '/cgi/' || doc_id || '.php' END AS path FROM documents), " +
          "d AS (SELECT doc_id, path, " +
          "CASE WHEN starts_with(path, '/private/ok/') THEN 12 " +
          "ELSE -1 END AS alw, " +
          "greatest(" +
          "CASE WHEN starts_with(path, '/private/') THEN 9 ELSE -1 END, " +
          "CASE WHEN regexp_matches(path, '^/.*\\.php$') THEN 7 " +
          "ELSE -1 END) AS dis FROM p) " +
          "SELECT doc_id, path, alw >= dis AS allowed FROM d"),
      "text_dup_spans" ->
        // Duplicate 5-gram positions -> gaps-and-islands span merge.
        // The lag/sum windows partition by DOCUMENT (bounded by doc
        // length); coverage counts each token once across overlapping
        // grams (max(pos)+5-min(pos) per island).
        ("WITH toks AS (SELECT doc_id AS id, " +
          OracleSql.words("text") + " AS t FROM documents), " +
          "wn AS (SELECT id, t, len(t) AS ntok FROM toks), " +
          "g AS (SELECT id, ntok, unnest(range(0, " +
          "greatest(len(t) - 4, 0))) AS pos, t FROM wn), " +
          "grams AS (SELECT id, ntok, pos, " +
          "array_to_string(t[pos + 1:pos + 5], ' ') AS gram FROM g), " +
          "dup AS (SELECT gram FROM grams GROUP BY gram " +
          "HAVING count(DISTINCT id) >= 2), " +
          "p AS (SELECT id, ntok, pos FROM grams JOIN dup USING (gram)), " +
          "brk AS (SELECT id, ntok, pos, CASE WHEN pos > " +
          "lag(pos) OVER (PARTITION BY id ORDER BY pos) + 5 " +
          "THEN 1 ELSE 0 END AS b FROM p), " +
          "isl AS (SELECT id, ntok, pos, sum(b) OVER " +
          "(PARTITION BY id ORDER BY pos ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW) AS i FROM brk), " +
          "sp AS (SELECT id, ntok, i, max(pos) + 5 - min(pos) AS cov " +
          "FROM isl GROUP BY id, ntok, i) " +
          "SELECT id, CAST(ntok AS BIGINT) AS n_tokens, " +
          "CAST(count(*) AS BIGINT) AS n_dup_spans, " +
          "CAST(sum(cov) AS BIGINT) AS dup_tokens, " +
          "CAST(sum(cov) * 1000000 // ntok AS BIGINT) AS dup_ratio_q " +
          "FROM sp GROUP BY id, ntok"),
      "text_pii_scan" -> piiScanSql,
      "text_pii_redact" ->
        // Same fixed pass order (email, ip, phone, card), global
        // replace; md5 is the portable fingerprint both engines emit
        // as lowercase hex over the same UTF-8 body.
        (s"WITH d AS (SELECT doc_id, $piiFixtureSql AS txt FROM documents), " +
          "r AS (SELECT doc_id, regexp_replace(regexp_replace(" +
          "regexp_replace(regexp_replace(txt, " +
          s"'${graft.ops.Pii.EmailPat}', '<EMAIL>', 'g'), " +
          s"'${graft.ops.Pii.Ipv4Pat}', '<IP>', 'g'), " +
          s"'${graft.ops.Pii.PhonePat}', '<PHONE>', 'g'), " +
          s"'${graft.ops.Pii.CardPat}', '<CARD>', 'g') AS red FROM d) " +
          "SELECT doc_id, CAST(length(red) AS BIGINT) AS redacted_len, " +
          "md5(red) AS redacted_md5 FROM r"),
      "text_keyness_llr" ->
        // Exact counts to the log step; every log argument a ratio of
        // exact-integer products in the engine's operand order.
        ("WITH tk AS (SELECT CASE WHEN source IN ('src0', 'src1', " +
          "'src2', 'src3', 'src4') THEN 1 ELSE 0 END AS a, " +
          "unnest(list_filter(regexp_split_to_array(lower(text), " +
          "'\\s+'), x -> len(x) > 0)) AS term FROM documents), " +
          "per AS (SELECT term, CAST(sum(a) AS BIGINT) AS c_a, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS c_b FROM tk " +
          "GROUP BY 1), " +
          "tot AS (SELECT CAST(coalesce(sum(c_a), 0) AS BIGINT) AS na, " +
          "CAST(coalesce(sum(c_b), 0) AS BIGINT) AS nb FROM per) " +
          "SELECT term, c_a, c_b, " +
          "2.0 * ((CASE WHEN c_a > 0 THEN CAST(c_a AS DOUBLE) * " +
          "ln(CAST(c_a AS DOUBLE) * CAST(na + nb AS DOUBLE) / " +
          "(CAST(na AS DOUBLE) * CAST(c_a + c_b AS DOUBLE))) " +
          "ELSE 0.0 END) + (CASE WHEN c_b > 0 THEN " +
          "CAST(c_b AS DOUBLE) * ln(CAST(c_b AS DOUBLE) * " +
          "CAST(na + nb AS DOUBLE) / (CAST(nb AS DOUBLE) * " +
          "CAST(c_a + c_b AS DOUBLE))) ELSE 0.0 END)) AS g2, " +
          "CAST(sign(c_a * nb - c_b * na) AS BIGINT) AS direction " +
          "FROM per, tot ORDER BY g2 DESC, term ASC LIMIT 50"),
      "text_jsd_domains" -> {
        // Count-pair-grid strict sorted fold (the q_mutual_info idiom);
        // p, q, and the log arguments repeated inline per DuckDB's
        // let-less lambdas — identical float shape to the engine.
        val p = "(CAST(x.ca AS DOUBLE) / CAST(n_a AS DOUBLE))"
        val q = "(CAST(x.cb AS DOUBLE) / CAST(n_b AS DOUBLE))"
        val ha = s"(CASE WHEN x.ca > 0 THEN $p * ln(2.0 * $p / ($p + $q)) " +
          "ELSE 0.0 END)"
        val hb = s"(CASE WHEN x.cb > 0 THEN $q * ln(2.0 * $q / ($p + $q)) " +
          "ELSE 0.0 END)"
        "WITH tk AS (SELECT CASE WHEN source IN ('src0', 'src1', " +
          "'src2', 'src3', 'src4') THEN 1 ELSE 0 END AS a, " +
          "unnest(list_filter(regexp_split_to_array(lower(text), " +
          "'\\s+'), x -> len(x) > 0)) AS term FROM documents), " +
          "per AS (SELECT term, CAST(sum(a) AS BIGINT) AS ca, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS cb FROM tk " +
          "GROUP BY 1), " +
          "grid AS (SELECT ca, cb, CAST(count(*) AS BIGINT) AS m " +
          "FROM per GROUP BY 1, 2), " +
          "lst AS (SELECT list(struct_pack(ca := ca, cb := cb, m := m) " +
          "ORDER BY ca, cb) AS cs, " +
          "CAST(coalesce(sum(ca * m), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(cb * m), 0) AS BIGINT) AS n_b, " +
          "CAST(coalesce(sum(m), 0) AS BIGINT) AS vocab FROM grid) " +
          "SELECT n_a, n_b, vocab, " +
          "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE " +
          "round(0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(cs, x -> CAST(x.m AS DOUBLE) * ($ha + $hb))), " +
          "(acc, x) -> acc + x), 8) END AS jsd_nats FROM lst"
      },
      // Direct source aggregation: if any field corrupted in the padded
      // round trip (key digits, status char, price cents, date), some
      // group stat moves.
      "src_fixed_width" ->
        ("SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) " +
          "AS n_rows, " +
          "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
          "AS sum_cents, " +
          "CAST(min(o_orderkey) AS BIGINT) AS min_key, " +
          "CAST(max(o_orderkey) AS BIGINT) AS max_key, " +
          "min(strftime(o_orderdate, '%Y%m%d')) AS min_ymd, " +
          "max(strftime(o_orderdate, '%Y%m%d')) AS max_ymd " +
          "FROM orders GROUP BY 1"),
      "src_csv_roundtrip" -> fidelitySql,
      "src_json_roundtrip" -> fidelitySql,
      "src_orc_roundtrip" -> fidelitySql,
      "src_xml_roundtrip" -> fidelitySql,
      "src_gzip_text" -> gzipTextSql,
      "src_tar_entries" ->
        // Same two-row plaintext replay as the zip gate — the engine
        // had to gunzip and walk checksum-verified ustar headers.
        ("SELECT doc_id AS id, 'doc.txt' AS entry_name, " +
          "CAST(strlen(text) AS BIGINT) AS n_bytes, " +
          "md5(text) AS entry_md5 FROM documents " +
          "UNION ALL SELECT doc_id, 'meta.json', " +
          "CAST(strlen('{\"id\":' || doc_id || '}') AS BIGINT), " +
          "md5('{\"id\":' || doc_id || '}') FROM documents"),
      "src_zip_entries" ->
        // Two rows per doc, straight off the plaintext — the engine
        // had to walk local file headers and inflate each entry.
        ("SELECT doc_id AS id, 'doc.txt' AS entry_name, " +
          "CAST(strlen(text) AS BIGINT) AS n_bytes, " +
          "md5(text) AS entry_md5 FROM documents " +
          "UNION ALL SELECT doc_id, 'meta.json', " +
          "CAST(strlen('{\"id\":' || doc_id || '}') AS BIGINT), " +
          "md5('{\"id\":' || doc_id || '}') FROM documents"),
      "src_charset_decode" ->
        // Plaintext replay: one md5 for both charsets (it hashes the
        // DECODED text), byte length differing by encoding — latin-1
        // bytes = codepoints, UTF-8 bytes = strlen.
        ("SELECT doc_id AS id, " +
          "CASE WHEN doc_id % 2 = 0 THEN 'utf-8' ELSE 'iso-8859-1' END " +
          "AS charset, " +
          "CAST(CASE WHEN doc_id % 2 = 0 " +
          "THEN strlen(text || ' café ß ±½') " +
          "ELSE length(text || ' café ß ±½') END " +
          "AS BIGINT) AS n_bytes, " +
          "CAST(length(text || ' café ß ±½') " +
          "AS BIGINT) AS n_chars, " +
          "md5(text || ' café ß ±½') AS text_md5 " +
          "FROM documents"),
      "src_warc_records" ->
        // Closed-form WARC fields + the body md5 straight off the
        // source text — only an engine that really unzips and walks
        // the record framing reproduces all of them.
        ("SELECT doc_id AS id, 'response' AS warc_type, " +
          "'https://example.com/doc/' || doc_id AS target_uri, " +
          "CAST(CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS INT) " +
          "AS http_status, " +
          "CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=utf-8' " +
          "ELSE 'text/plain' END AS content_type, " +
          "CAST(strlen(text) AS BIGINT) AS body_len, " +
          "md5(text) AS body_md5 FROM documents"),
      "src_jsonl_corrupt" ->
        ("SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents " +
          "WHERE doc_id % 97 <> 0 GROUP BY 1 " +
          "UNION ALL SELECT '_corrupt', CAST(count(*) AS BIGINT), " +
          "CAST(NULL AS BIGINT) FROM documents WHERE doc_id % 97 = 0"),
      "src_partitioned_prune" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
          "FROM documents WHERE lang = 'en' GROUP BY source"),
      "src_schema_merge" ->
        // quality exists only in the odd-doc shard; merged read must
        // surface it as NULL (-> 0 here) for the even-doc shard.
        ("SELECT lang, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars * 2 " +
          "ELSE 0 END) AS BIGINT) AS sum_quality " +
          "FROM documents GROUP BY lang"),
      "bm25_topk" -> bm25Sql,
      "text_keywords_pagerank" -> keywordsPagerankSql,
      "text_repetition" -> repetitionSql,
      "text_sentences" -> {
        val ns = "len(list_filter(regexp_split_to_array(text, '[.!?]+'), " +
          "s -> len(trim(s)) > 0))"
        val nw = "len(list_filter(regexp_split_to_array(text, '\\s+'), " +
          "w -> len(w) > 0))"
        s"SELECT doc_id, CAST($ns AS BIGINT) AS n_sentences, " +
          s"CAST($nw AS BIGINT) AS n_words, " +
          "CASE WHEN n_sentences = 0 THEN NULL " +
          "ELSE CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) " +
          "END AS avg_words_per_sentence FROM documents"
      },
      "text_readability" -> {
        val ns = "len(list_filter(regexp_split_to_array(text, '[.!?]+'), " +
          "s -> len(trim(s)) > 0))"
        val nw = "len(list_filter(regexp_split_to_array(text, '\\s+'), " +
          "w -> len(w) > 0))"
        val sy = "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
        s"SELECT doc_id, CAST($ns AS BIGINT) AS n_sentences, " +
          s"CAST($nw AS BIGINT) AS n_words, " +
          s"CAST($sy AS BIGINT) AS n_syllables, " +
          "CASE WHEN n_sentences = 0 OR n_words = 0 THEN NULL " +
          "ELSE 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / " +
          "CAST(n_sentences AS DOUBLE)) - 84.6 * " +
          "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
          "END AS flesch FROM documents"
      },
      "text_url_parse" ->
        ("WITH u0 AS (SELECT doc_id, 'https://' || " +
          "CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || source || " +
          "'.example' || " +
          "CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.com' END || " +
          "'/docs/' || CAST(doc_id AS VARCHAR) || " +
          "CASE WHEN doc_id % 2 = 0 THEN '?lang=' || lang ELSE '' END " +
          "AS url FROM documents), " +
          "p AS (SELECT doc_id, url, lower(trim(url)) AS lu FROM u0), " +
          "h AS (SELECT doc_id, url, " +
          "regexp_replace(regexp_extract(lu, " +
          "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', '') AS host, " +
          "regexp_extract(lu, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) " +
          "AS path, " +
          "regexp_extract(lu, '\\?([^#]*)', 1) AS query_str FROM p), " +
          "r AS (SELECT *, " +
          "regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld, " +
          "regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r2, " +
          "regexp_extract(host, " +
          "'([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r3 FROM h), " +
          "f AS (SELECT *, regexp_extract(r2, '^([a-z0-9-]+)\\.', 1) " +
          "AS sld FROM r) " +
          "SELECT doc_id, url, host, " +
          "CASE WHEN sld IN ('co','com','net','org','gov','ac','edu') " +
          "AND r3 <> '' THEN r3 ELSE r2 END AS registered_domain, " +
          "path, query_str, tld FROM f"),
      "src_shard_export" -> shardExportSql,
      "src_jsonl_export" -> shardExportSql,
      "text_bigram_logprob" -> {
        val q = graft.ops.TextAnalysis.LogQ
        val mean = s"CAST(sq AS DOUBLE) / (n_bigrams * $q)"
        "WITH ws AS (SELECT doc_id, " +
          "list_filter(string_split_regex(lower(text), '\\s+'), " +
          "w -> w <> '') AS ws FROM documents), " +
          "pr AS (SELECT doc_id, unnest(list_transform(" +
          "range(1, len(ws)), i -> struct_pack(w1 := ws[i], " +
          "w2 := ws[i + 1]))) AS p FROM ws WHERE len(ws) >= 2), " +
          "pp AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pr), " +
          "c12 AS (SELECT w1, w2, count(*) AS n12 FROM pp GROUP BY 1, 2), " +
          "c1 AS (SELECT w1, w2, n12, " +
          "CAST(sum(n12) OVER (PARTITION BY w1) AS BIGINT) AS n1 " +
          "FROM c12), " +
          "vv AS (SELECT count(DISTINCT w) AS v FROM " +
          "(SELECT unnest(ws) AS w FROM ws)), " +
          "lm AS (SELECT w1, w2, CAST(floor(ln((n12 + 1) / (n1 + v)) * " +
          s"$q.0) AS BIGINT) AS lpq FROM c1, vv), " +
          "dt AS (SELECT doc_id, w1, w2, count(*) AS tf FROM pp " +
          "GROUP BY 1, 2, 3), " +
          "per AS (SELECT doc_id, CAST(sum(tf * lpq) AS BIGINT) AS sq, " +
          "CAST(sum(tf) AS BIGINT) AS n_bigrams " +
          "FROM dt JOIN lm USING (w1, w2) GROUP BY doc_id) " +
          s"SELECT doc_id, n_bigrams, $mean AS mean_logp, " +
          s"(-($mean)) / ${graft.ops.TextAnalysis.Ln2} AS bits_per_token " +
          "FROM per"
      },
      "text_zipf_fit" ->
        ("WITH toks AS (SELECT unnest(string_split_regex(lower(text), " +
          "'\\s+')) AS w FROM documents), " +
          "tf AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' " +
          "GROUP BY w), " +
          "grid AS (SELECT c, count(*) AS nc FROM tf GROUP BY c), " +
          "pk AS (SELECT list_sort(list({'c': c, 'nc': nc})) AS g, " +
          "CAST(sum(c * nc) AS BIGINT) AS n_tokens, " +
          "CAST(sum(nc) AS BIGINT) AS vocab FROM grid), " +
          "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) " +
          "AS r FROM tf), " +
          "tp AS (SELECT CAST(sum(CASE WHEN r <= 10 THEN c ELSE 0 END) " +
          "AS BIGINT) AS t10, " +
          "CAST(sum(CASE WHEN r <= 100 THEN c ELSE 0 END) AS BIGINT) " +
          "AS t100 FROM rk), " +
          "ln AS (SELECT n_tokens, vocab, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(g, x -> CAST(x.nc AS DOUBLE) * " +
          "ln(CAST(x.c AS DOUBLE)))), (a, b) -> a + b) AS lnsum " +
          "FROM pk) " +
          "SELECT n_tokens, vocab, " +
          "round(CASE WHEN lnsum <> 0 THEN " +
          "1.0 + CAST(vocab AS DOUBLE) / lnsum END, 8) AS alpha_mle, " +
          "CAST(t10 AS DOUBLE) / CAST(n_tokens AS DOUBLE) " +
          "AS top10_share, " +
          "CAST(t100 AS DOUBLE) / CAST(n_tokens AS DOUBLE) " +
          "AS top100_share FROM ln, tp"),
      "text_unigram_logprob" -> {
        val q = graft.ops.TextAnalysis.LogQ
        val mean = s"CAST(sq AS DOUBLE) / (n_words * $q)"
        "WITH toks AS (SELECT doc_id, " +
          "unnest(string_split_regex(lower(text), '\\s+')) AS w " +
          "FROM documents), " +
          "toksf AS (SELECT * FROM toks WHERE w <> ''), " +
          "freq AS (SELECT w, count(*) AS c FROM toksf GROUP BY w), " +
          "stats AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v " +
          "FROM freq), " +
          "freqq AS (SELECT w, CAST(floor(ln((c + 1) / (t + v)) * " +
          s"$q.0) AS BIGINT) AS lpq FROM freq, stats), " +
          "dt AS (SELECT doc_id, w, count(*) AS tf FROM toksf " +
          "GROUP BY doc_id, w), " +
          "per AS (SELECT doc_id, CAST(sum(tf * lpq) AS BIGINT) AS sq, " +
          "CAST(sum(tf) AS BIGINT) AS n_words " +
          "FROM dt JOIN freqq USING (w) GROUP BY doc_id) " +
          s"SELECT doc_id, n_words, $mean AS mean_logp, " +
          s"(-($mean)) / ${graft.ops.TextAnalysis.Ln2} AS bits_per_token " +
          "FROM per"
      },
      "bpe_merges" ->
        ("WITH w0 AS (SELECT w, count(*) AS freq FROM (SELECT unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) GROUP BY w), " +
          graft.functions.OracleSql.bpeCtes(10) + " " +
          (1 to 10).map(r => s"SELECT CAST($r AS BIGINT) AS rank, " +
            s"a AS sym_a, b AS sym_b, cnt AS n_occ FROM b$r")
            .mkString(" UNION ALL ")),
      "bpe_encode" ->
        ("WITH w0 AS (SELECT w, count(*) AS freq FROM (SELECT unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) GROUP BY w), " +
          graft.functions.OracleSql.bpeCtes(10) + ", " +
          "dw AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) " +
          "SELECT dw.doc_id, count(*) AS n_words, " +
          "CAST(sum(len(v10.s)) AS BIGINT) AS n_bpe_tokens " +
          "FROM dw JOIN v10 USING (w) GROUP BY dw.doc_id"),
      "tok_unigram_train" ->
        ("WITH w0 AS MATERIALIZED (SELECT w, count(*) AS freq FROM (SELECT unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) GROUP BY w), " +
          graft.functions.OracleSql.unigramCtes(rounds = 2, multiVocab = 64) + " " +
          "SELECT n2.piece, n2.cnt AS n_uses, c2.costq FROM n2 " +
          "JOIN c2 ON n2.piece = c2.piece WHERE n2.cnt > 0"),
      "tok_unigram_encode" ->
        ("WITH w0 AS MATERIALIZED (SELECT w, count(*) AS freq FROM (SELECT unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) GROUP BY w), " +
          graft.functions.OracleSql.unigramCtes(rounds = 2, multiVocab = 64) + ", " +
          graft.functions.OracleSql.unigramEncodeCtes(rounds = 2) + ", " +
          "dw AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) " +
          "SELECT dw.doc_id, count(*) AS n_words, " +
          "CAST(sum(useg.n_p) AS BIGINT) AS n_tokens " +
          "FROM dw JOIN useg ON dw.w = useg.w GROUP BY dw.doc_id"),
      "tok_unigram_prune" ->
        ("WITH w0 AS MATERIALIZED (SELECT w, count(*) AS freq FROM (SELECT unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents) GROUP BY w), " +
          graft.functions.OracleSql.unigramCtes(rounds = 2, multiVocab = 64) + ", " +
          graft.functions.OracleSql.unigramPruneCtes(rounds = 2, keepMulti = 32) + " " +
          "SELECT nP.piece, nP.cnt AS n_uses, cF.costq FROM nP " +
          "JOIN cF ON nP.piece = cF.piece WHERE nP.cnt > 0"),
      "text_collocations" ->
        ("WITH tk AS (SELECT list_filter(regexp_split_to_array(lower(text), " +
          "'\\s+'), w -> len(w) > 0) AS toks FROM documents), " +
          "u AS (SELECT unnest(toks) AS w1, CAST(NULL AS VARCHAR) AS w2 FROM tk), " +
          "b AS (SELECT unnest(list_transform(range(1, len(toks)), " +
          "i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS p FROM tk), " +
          "bb AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM b), " +
          "cnt AS MATERIALIZED (SELECT w1, w2, count(*) AS c FROM " +
          "(SELECT * FROM u UNION ALL SELECT * FROM bb) GROUP BY w1, w2), " +
          "uni AS (SELECT w1 AS w, c AS cw FROM cnt WHERE w2 IS NULL), " +
          "pr AS (SELECT * FROM cnt WHERE w2 IS NOT NULL AND c >= 5), " +
          "tot AS (SELECT CAST(sum(CASE WHEN w2 IS NULL THEN c END) AS BIGINT) AS n1, " +
          "CAST(sum(CASE WHEN w2 IS NOT NULL THEN c END) AS BIGINT) AS nb FROM cnt) " +
          "SELECT pr.w1, pr.w2, pr.c AS n_pair, " +
          "(CAST(pr.c AS DOUBLE) * CAST(tot.n1 AS DOUBLE) * CAST(tot.n1 AS DOUBLE)) / " +
          "(CAST(tot.nb AS DOUBLE) * CAST(ux.cw AS DOUBLE) * CAST(uy.cw AS DOUBLE)) " +
          "AS score FROM pr CROSS JOIN tot " +
          "JOIN uni ux ON pr.w1 = ux.w JOIN uni uy ON pr.w2 = uy.w " +
          "ORDER BY score DESC, w1, w2 LIMIT 25"),
      "pipeline_corpus" -> pipelineCorpusSql,
      "text_novelty_curve" ->
        // Same shingle kernel; first-seen = min doc_id per shingle.
        (s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
          s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh " +
          "FROM base), " +
          "e AS (SELECT doc_id, unnest(list_distinct(sh)) AS h " +
          "FROM sh_t), " +
          "own AS (SELECT h, min(doc_id) AS o FROM e GROUP BY 1), " +
          "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tot, " +
          "CAST(sum(CASE WHEN o = doc_id THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS nov FROM e JOIN own USING (h) GROUP BY 1) " +
          "SELECT doc_id // 50 AS bucket, " +
          "CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(tot) AS BIGINT) AS n_shingles, " +
          "CAST(sum(nov) AS BIGINT) AS n_novel, " +
          "CAST(sum(nov) AS DOUBLE) / CAST(sum(tot) AS DOUBLE) " +
          "AS novelty FROM per GROUP BY 1"),
      "text_top_ngrams" -> topNgramsSql,
      "text_tfidf" ->
        ("WITH toks AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), w -> len(w) > 0)) AS w " +
          "FROM documents), " +
          "tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2), " +
          "dft AS (SELECT w, count(*) AS df FROM tf GROUP BY w), " +
          "n AS (SELECT count(DISTINCT doc_id) AS nd FROM tf), " +
          "vocab AS (SELECT w, CAST(row_number() OVER (" +
          "ORDER BY df DESC, w) - 1 AS BIGINT) AS term_idx, " +
          s"CAST(floor(ln((nd + 1.0) / (df + 1)) * ${graft.ops.TextAnalysis.LogQ}) " +
          "AS BIGINT) AS idfq " +
          "FROM dft CROSS JOIN n ORDER BY df DESC, w LIMIT 32) " +
          "SELECT tf.doc_id, v.term_idx, v.w AS token, tf.tf, " +
          s"CAST(tf.tf * v.idfq AS DOUBLE) / ${graft.ops.TextAnalysis.LogQ} AS tfidf " +
          "FROM tf JOIN vocab v USING (w)"),
      "text_bigram_lm" ->
        ("WITH wf AS (SELECT list_filter(string_split_regex(lower(text), " +
          "'\\s+'), w -> w <> '') AS ws FROM documents), " +
          "p AS (SELECT unnest(list_transform(range(1, len(ws)), " +
          "i -> {'w1': ws[i], 'w2': ws[i+1]})) AS pr FROM wf " +
          "WHERE len(ws) >= 2), " +
          "c AS (SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS n_pair " +
          "FROM p GROUP BY 1, 2), " +
          "t AS (SELECT w1, w2, n_pair, CAST(sum(n_pair) OVER " +
          "(PARTITION BY w1) AS BIGINT) AS n_prefix FROM c) " +
          s"SELECT w1, w2, n_pair, n_prefix, CAST((n_pair * ${graft.ops.TextAnalysis.LogQ}) " +
          "// n_prefix AS BIGINT) AS p_q FROM t WHERE n_pair >= 2"),
      "pipeline_embeddings" -> pipelineEmbeddings,
      "text_langid" -> langIdSql,
      "text_lang_confusion" ->
        (s"WITH pr AS ($langIdSql) " +
          "SELECT d.lang, pr.pred_lang, count(*) AS n " +
          "FROM pr JOIN documents d USING (doc_id) " +
          "GROUP BY 1, 2"),
      "text_token_classes" -> tokenClassesSql,
      // Code-census replay: same splice, same RE2 feature counts, same
      // pinned score weights and threshold.
      "text_code_detect" -> {
        val code = "def f(x):" + "\n" + "    return x + 1" + "\n" +
          "class A {" + "\n" + "    int y = 0;" + "\n" + "}" + "\n" +
          "import os" + "\n"
        val codeLit = "'" + code.replace("\n", "' || chr(10) || '") + "'"
        def cnt(pat: String) =
          s"CAST(len(regexp_extract_all(txt, '$pat')) AS BIGINT)"
        val braces = cnt("[{}]")
        val semis = cnt(";")
        val kws = cnt("\\b(def|class|import|return|function|var|const|" +
          "void|public)\\b")
        val ind = cnt("(?m)^(    |\\t)")
        val score = s"(3 * $kws + 2 * $braces + 2 * $semis + $ind)"
        "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN " +
          s"$codeLit || text ELSE text END AS txt FROM documents) " +
          "SELECT doc_id, " +
          "CAST(len(regexp_extract_all(txt, '\\n')) + 1 AS BIGINT) " +
          "AS n_lines, " +
          s"$braces AS n_braces, $semis AS n_semicolons, " +
          s"$kws AS n_keyword_hits, $ind AS n_indented_lines, " +
          s"$score AS code_score, $score >= 8 AS is_code FROM d"
      },
      // Markdown replay: identical fixture splice, then the SAME shared
      // step table folded as RE2 (markdownStripSql); counts replayed as
      // regexp_extract_all lengths on the original text.
      "text_markdown_strip" -> {
        val md = "'# Title ' || substr(text, 1, 20) || chr(10) || " +
          "'**bold** see [docs](http://ex.com/' || " +
          "CAST(doc_id AS VARCHAR) || ') and `x = 1` ![img](http://i/' " +
          "|| CAST(doc_id AS VARCHAR) || '.png)' || chr(10) || " +
          "'- item one' || chr(10) || '2. item two' || chr(10) || " +
          "'> quote' || chr(10) || '---' || chr(10) || text"
        def cnt(pat: String) =
          s"CAST(len(regexp_extract_all(md, '$pat')) AS BIGINT)"
        s"WITH d AS (SELECT doc_id, $md AS md FROM documents) " +
          "SELECT doc_id, " +
          graft.ops.TextAnalysis.markdownStripSql("md") +
          " AS text_plain, " +
          "CAST(length(md) AS BIGINT) AS n_chars_in, " +
          s"CAST(length(${graft.ops.TextAnalysis.markdownStripSql("md")}) " +
          "AS BIGINT) AS n_chars_out, " +
          cnt("\\[([^\\]]*)\\]\\(") + " - " + cnt("!\\[([^\\]]*)\\]\\(") +
          " AS n_links, " +
          cnt("!\\[([^\\]]*)\\]\\(") + " AS n_images, " +
          "CAST(len(regexp_extract_all(regexp_replace(md, " +
          "'(?s)```.*?```', ' ', 'g'), '`[^`]+`')) AS BIGINT) " +
          "AS n_code_spans, " +
          cnt("(?m)^#{1,6}[ \\t]+") + " AS n_headings FROM d"
      },
      // Script-census replay: identical fixture splice, counts as
      // length - length(strip) with RE2 \x{...} ranges (the engine's
      // Java-regex ranges cover the same BMP intervals; all counted
      // chars are BMP so UTF-16 units == codepoints).
      "text_script_profile" -> {
        def strip(cls: String) =
          s"length(txt) - length(regexp_replace(txt, '$cls', '', 'g'))"
        val latin = strip("[A-Za-z]")
        val cyr = strip("[\\x{0400}-\\x{04FF}]")
        val cjk = strip("[\\x{4E00}-\\x{9FFF}]")
        val greek = strip("[\\x{0370}-\\x{03FF}]")
        val digit = strip("[0-9]")
        val space = strip("\\s")
        "WITH d AS (SELECT doc_id, text || ' ' || " +
          "(CASE doc_id % 4 WHEN 0 THEN 'привет' WHEN 1 THEN 'мир' " +
          "WHEN 2 THEN 'данные' ELSE 'поток' END) || ' ' || " +
          "(CASE doc_id % 3 WHEN 0 THEN '数据' WHEN 1 THEN '模型' " +
          "ELSE '训练' END) || ' ' || " +
          "(CASE doc_id % 2 WHEN 0 THEN 'αβγ' ELSE 'δεζ' END) || ' ' || " +
          "CAST(doc_id AS VARCHAR) AS txt FROM documents) " +
          "SELECT doc_id, CAST(length(txt) AS BIGINT) AS n_units, " +
          s"CAST($latin AS BIGINT) AS n_latin, " +
          s"CAST($cyr AS BIGINT) AS n_cyrillic, " +
          s"CAST($cjk AS BIGINT) AS n_cjk, " +
          s"CAST($greek AS BIGINT) AS n_greek, " +
          s"CAST($digit AS BIGINT) AS n_digit, " +
          s"CAST($space AS BIGINT) AS n_space, " +
          s"CAST(length(txt) - ($latin) - ($cyr) - ($cjk) - ($greek) - " +
          s"($digit) - ($space) AS BIGINT) AS n_other FROM d"
      },
      "src_parquet_footer" ->
        ("SELECT 'event_id' AS column_name, " +
          "CAST(count(*) AS BIGINT) AS num_values, " +
          "CAST(count(*) - count(event_id) AS BIGINT) AS null_count, " +
          "CAST(min(event_id) AS BIGINT) AS min_value, " +
          "CAST(max(event_id) AS BIGINT) AS max_value FROM events " +
          "UNION ALL SELECT 'user_id', CAST(count(*) AS BIGINT), " +
          "CAST(count(*) - count(user_id) AS BIGINT), " +
          "CAST(min(user_id) AS BIGINT), CAST(max(user_id) AS BIGINT) " +
          "FROM events"),
      "text_kneser_ney" ->
        ("WITH wf AS (SELECT list_filter(string_split_regex(lower(text), " +
          "'\\s+'), w -> w <> '') AS ws FROM documents), " +
          "p AS (SELECT unnest(list_transform(range(1, len(ws)), " +
          "i -> {'w1': ws[i], 'w2': ws[i+1]})) AS pr FROM wf " +
          "WHERE len(ws) >= 2), " +
          "c AS (SELECT pr.w1 AS w1, pr.w2 AS w2, " +
          "CAST(count(*) AS BIGINT) AS c12 FROM p GROUP BY 1, 2), " +
          "lm AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, " +
          "CAST(count(*) AS BIGINT) AS b1 FROM c GROUP BY w1), " +
          "rm AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2t " +
          "FROM c GROUP BY w2), " +
          "ee AS (SELECT CAST(count(*) AS BIGINT) AS e FROM c) " +
          "SELECT c.w1, c.w2, c.c12, lm.c1, lm.b1, rm.c2t, ee.e, " +
          "CAST((4 * c.c12 - 3) * ee.e + 3 * lm.b1 * rm.c2t AS BIGINT) " +
          "AS kn_num, CAST(4 * lm.c1 * ee.e AS BIGINT) AS kn_den " +
          "FROM c JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN ee " +
          "ORDER BY c.c12 DESC, c.w1, c.w2 LIMIT 50"),
      "text_rouge_lcs" -> {
        // Independent LCS DP: the ts_dtw_kernel anti-diagonal recursive
        // CTE shape (cells on diagonal d depend only on d-1 and d-2)
        // with the LCS recurrence — match takes prevdiag+1, mismatch
        // takes max(up, left); out-of-range neighbors coalesce to the
        // LCS zero border.
        val wh = OracleSql.wordHashes("text")
        "WITH RECURSIVE d AS (SELECT doc_id, " +
          s"list_slice($wh, 1, 24) AS xs FROM documents), " +
          "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
          "a.xs AS la, b.xs AS lb, len(a.xs) AS n, len(b.xs) AS m " +
          "FROM d a JOIN d b ON b.doc_id = a.doc_id + 1), " +
          "rec AS (SELECT id_a, id_b, n, m, la, lb, 2 AS dd, " +
          "[CAST(CASE WHEN la[1] = lb[1] THEN 1 ELSE 0 END AS BIGINT)] " +
          "AS diag, CAST([] AS BIGINT[]) AS prevdiag FROM p " +
          "UNION ALL " +
          "SELECT id_a, id_b, n, m, la, lb, dd + 1, " +
          "list_transform(range(greatest(1, dd + 1 - m), " +
          "least(n, dd) + 1), i -> " +
          "CASE WHEN la[i] = lb[dd + 1 - i] THEN " +
          "coalesce(CASE WHEN i - greatest(1, dd - 1 - m) >= 1 " +
          "THEN prevdiag[CAST(i - greatest(1, dd - 1 - m) AS INT)] END, 0) " +
          "+ 1 ELSE greatest(" +
          "coalesce(CASE WHEN i - greatest(1, dd - m) >= 1 " +
          "THEN diag[CAST(i - greatest(1, dd - m) AS INT)] END, 0), " +
          "coalesce(diag[CAST(i - greatest(1, dd - m) + 1 AS INT)], 0)) " +
          "END), diag FROM rec WHERE dd < n + m) " +
          "SELECT id_a, id_b, CAST(n AS BIGINT) AS n_a, " +
          "CAST(m AS BIGINT) AS n_b, CAST(diag[1] AS BIGINT) AS lcs_len, " +
          "CAST(2 * diag[1] AS BIGINT) AS rouge_num, " +
          "CAST(n + m AS BIGINT) AS rouge_den " +
          "FROM rec WHERE dd = n + m"
      },
      // DuckDB's OWN levenshtein over the chr-embedded mod-94 token
      // codes — a fully independent char-DP replaying the token-level
      // kernel through an injective alphabet embedding
      "text_edit_distance" -> {
        val wh = OracleSql.wordHashes("text")
        s"WITH d AS (SELECT doc_id, list_slice($wh, 1, 24) AS xs " +
          "FROM documents), " +
          "e AS (SELECT doc_id, len(xs) AS n, " +
          "array_to_string(list_transform(xs, " +
          "h -> chr(CAST(33 + h % 94 AS INT))), '') AS s FROM d) " +
          "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
          "CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b, " +
          "CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_dist, " +
          "CAST(greatest(a.n, b.n) - levenshtein(a.s, b.s) AS BIGINT) " +
          "AS sim_num, " +
          "CAST(greatest(a.n, b.n) AS BIGINT) AS sim_den " +
          "FROM e a JOIN e b ON b.doc_id = a.doc_id + 1"
      },
      "text_fingerprint" -> fingerprintSql,
      "text_normalize" -> normalizeSql,
      "text_redact" -> redactSql,
      "text_winnow" -> winnowSql,
      "text_shingles_explode" -> shinglesExplode,
    )
  }
}
