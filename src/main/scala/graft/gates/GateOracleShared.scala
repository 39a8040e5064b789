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

/** Oracle-SQL building blocks shared by MORE THAN ONE gate family —
  * CTE bodies and generator lambdas that several families replay (the
  * sessionize CTE feeds both the batch gate and its streaming twin,
  * the luma grid feeds every image family, ...). Family-local CTEs
  * stay inside their registry's `oracles` def; only multi-family ones
  * live here. */
private[graft] object GateOracleShared {
    val dedupState =
      s"SELECT pkey, epoch_us(ts) AS modified_date_us, event_type, value " +
        s"FROM ($oracleDedup) WHERE rn = 1"
    // Shared by q_sessionize and its streaming twin s6_stream_session.
    val sessionizeSql =
      "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), " +
        "m AS (SELECT user_id, us, CASE WHEN lag(us) OVER w IS NULL " +
        "OR us - lag(us) OVER w >= 21600000000 THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)) , " +
        "sess AS (SELECT user_id, us, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us, " +
        "count(*) AS n_events FROM sess GROUP BY user_id, sid"
    // RE2 replay of the Java-regex PII scan: same patterns (common
    // dialect subset), same octet/Luhn validation arithmetic. Shared
    // by the batch gate and its stateless streaming twin.
    val piiScanSql: String = {
        def dig = "CAST(substr(dd, CAST(length(dd) - i AS INT), 1) AS BIGINT)"
        s"WITH d AS (SELECT doc_id, $piiFixtureSql AS txt FROM documents) " +
          "SELECT doc_id, " +
          s"CAST(len(regexp_extract_all(txt, '${graft.ops.Pii.EmailPat}')) " +
          "AS BIGINT) AS n_emails, " +
          s"CAST(len(regexp_extract_all(txt, '${graft.ops.Pii.Ipv4Pat}')) " +
          "AS BIGINT) AS n_ipv4_candidates, " +
          s"CAST(len(list_filter(regexp_extract_all(txt, " +
          s"'${graft.ops.Pii.Ipv4Pat}'), s -> " +
          "len(list_filter(string_split(s, '.'), o -> " +
          "CAST(o AS INT) > 255)) = 0)) AS BIGINT) AS n_ipv4_valid, " +
          s"CAST(len(regexp_extract_all(txt, '${graft.ops.Pii.PhonePat}')) " +
          "AS BIGINT) AS n_phones, " +
          s"CAST(len(regexp_extract_all(txt, '${graft.ops.Pii.CardPat}')) " +
          "AS BIGINT) AS n_card_candidates, " +
          s"CAST(len(list_filter(regexp_extract_all(txt, " +
          s"'${graft.ops.Pii.CardPat}'), dd -> " +
          "list_sum(list_transform(range(0, length(dd)), i -> " +
          s"CASE WHEN i % 2 = 1 THEN CASE WHEN 2 * $dig > 9 " +
          s"THEN 2 * $dig - 9 ELSE 2 * $dig END ELSE $dig END)) % 10 = 0)) " +
          "AS BIGINT) AS n_cards_luhn FROM d"
    }

    // Shared HTML-fixture replay (text_html_extract + pipeline_crawl):
    // the fixture concatenation, then the extraction chain — comment/
    // script/style -> tags -> entities (&amp; last) -> ws collapse.
    val w = graft.ops.RankEval.dcgWeightsScaled(10).mkString(", ")
    val bm25Ctes = {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val caseSums = Bm25Terms.map(t =>
        s"coalesce(sum(CASE WHEN term = '$t' THEN contrib END), " +
          "CAST(0 AS DOUBLE))").mkString(" + ")
      "toks AS (SELECT doc_id, " +
        "unnest(string_split_regex(lower(text), '\\s+')) AS term " +
        "FROM documents), " +
        "toksf AS (SELECT * FROM toks WHERE term <> ''), " +
        "dl AS (SELECT doc_id, count(*) AS dl FROM toksf GROUP BY doc_id), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, " +
        "avg(dl) AS avgdl FROM dl), " +
        s"qtf AS (SELECT doc_id, term, count(*) AS tf FROM toksf " +
        s"WHERE term IN ($termList) GROUP BY doc_id, term), " +
        "dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df " +
        "FROM qtf GROUP BY term), " +
        "scored AS (SELECT q.doc_id, q.term, " +
        "ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * " +
        "(q.tf * (1.2 + 1)) / " +
        "(q.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS contrib " +
        "FROM qtf q JOIN dl l USING (doc_id) JOIN dfreq d USING (term) " +
        "CROSS JOIN stats s), " +
        s"agg AS (SELECT doc_id, $caseSums AS score " +
        "FROM scored GROUP BY doc_id), " +
        s"top AS (SELECT doc_id, score FROM agg " +
        s"ORDER BY score DESC, doc_id LIMIT $Bm25K)"
    }
    val hashBucket = s"((((doc_id * ${TextHash.permuteA(0)} + " +
      s"${TextHash.permuteB(0)}) % ${TextHash.P}) % 100) + 100) % 100"
    val gzipTextSql: String =
      "SELECT doc_id AS id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        "CAST(length(text) AS BIGINT) AS n_chars, " +
        "md5(text) AS text_md5 FROM documents"
    val wh = OracleSql.wordHashes("text")

    // HLL replay: bucket = h mod m, rank = leading zeros of the remaining
    // 24-bit value + 1 via length(bin(x)) — bit length of a positive
    // BIGINT, identical semantics in Spark and DuckDB — and the harmonic
    // denominator Σ 2^(25-r) summed as exact BIGINTs. One double division
    // at the end. Shared by sketch_hll_distinct and sketch_hll_merge
    // (merge == direct build is exactly the mergeability claim).
    val minhashLsh = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
        s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}) " +
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM banded a JOIN banded b " +
        "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"
    }
    val scd2Sql =
      "WITH hist AS (SELECT c_custkey, 'OLDSEG' AS c_mktsegment, " +
        "c_acctbal - 5.0 AS c_acctbal, CAST(-1000000 AS BIGINT) AS valid_from_us, " +
        "CAST(0 AS BIGINT) AS valid_to_us FROM customer WHERE c_custkey % 5 = 0), " +
        "cur AS (SELECT c_custkey, c_mktsegment, c_acctbal, " +
        "CAST(0 AS BIGINT) AS vf FROM customer), " +
        "chg AS (SELECT c_custkey, c_mktsegment, c_acctbal + 10.5 AS c_acctbal, " +
        "CAST(1000 AS BIGINT) AS ts FROM customer WHERE c_custkey % 3 = 0 " +
        "UNION ALL SELECT c_custkey, c_mktsegment, c_acctbal, 2000 " +
        "FROM customer WHERE c_custkey % 3 = 1 " +
        "UNION ALL SELECT c_custkey, 'LATE', c_acctbal, -5 " +
        "FROM customer WHERE c_custkey % 3 = 2 AND c_custkey % 7 = 0 " +
        "UNION ALL SELECT c_custkey + 100000, 'NEWSEG', 1.0, 3000 " +
        "FROM customer WHERE c_custkey % 11 = 0), " +
        "j AS (SELECT coalesce(cur.c_custkey, chg.c_custkey) AS k, " +
        "cur.c_custkey IS NOT NULL AS cp, chg.c_custkey IS NOT NULL AS np, " +
        "cur.c_mktsegment AS cs, cur.c_acctbal AS ca, cur.vf AS vf, " +
        "chg.c_mktsegment AS ns, chg.c_acctbal AS na, chg.ts AS ts " +
        "FROM cur FULL JOIN chg ON cur.c_custkey = chg.c_custkey), " +
        "sm AS (SELECT *, (cs IS NOT DISTINCT FROM ns AND " +
        "ca IS NOT DISTINCT FROM na) AS eq FROM j) " +
        "SELECT * FROM hist " +
        "UNION ALL SELECT k, cs, ca, vf, CAST(NULL AS BIGINT) FROM sm " +
        "WHERE cp AND (NOT np OR eq OR ts <= vf) " +
        "UNION ALL SELECT k, cs, ca, vf, ts FROM sm " +
        "WHERE cp AND np AND NOT eq AND ts > vf " +
        "UNION ALL SELECT k, ns, na, ts, CAST(NULL AS BIGINT) FROM sm " +
        "WHERE np AND (NOT cp OR (NOT eq AND ts > vf))"

    // Brute-force twin of NearDup.prefixJaccardJoin: prefix filtering is
    // exact (no false negatives), so the oracle is the plain all-pairs
    // threshold join over the same distinct 2-gram hash sets.
    val ivfKmeans =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"n AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) AS nrm FROM e), " +
        "samp AS (SELECT * FROM n), " +
        OracleSql.kmeansCtes("vec_id", k = 8, iters = 2, dim = 64) + ", " +
        "c AS (SELECT * FROM c2), "

    // PQ replay: one kmeans CTE chain per subspace (prefixed names), the
    // same cosine-argmax encode as the engine's bestCell, codeword
    // reconstruction by concatenation, ADC ranking, exact rerank.
    val clustersSql = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
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
        "UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) " +
        "SELECT id AS doc_id, min(r) AS canon_id FROM reach GROUP BY id"
    }

    // Mirrors NearDup.clusterRepresentatives over the LSH clusters:
    // singletons via LEFT JOIN + coalesce, argmax via QUALIFY
    // row_number (doc_id is unique, so the window is deterministic).
    val normalizeSql = {
      val cleaned = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[\\x00-\\x1f]', ' ', 'g'), '\\s+', ' ', 'g'))"
      s"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_in, " +
        s"$cleaned AS text_norm, " +
        s"CAST(length($cleaned) AS BIGINT) AS n_chars_norm FROM documents"
    }
    val cdcChunksSql: String =
      "WITH b AS (SELECT doc_id, text, strlen(text) AS n " +
        "FROM documents WHERE strlen(text) > 0), " +
        "pos AS (SELECT doc_id, text, n, " +
        "unnest(range(0, n)) AS i FROM b), " +
        "c AS (SELECT doc_id, text, i, CASE WHEN i >= 7 THEN " +
        "(list_sum(list_transform(range(0, 8), k -> " +
        "((2654435761 * (ascii(substr(text, " +
        "CAST(i - k + 1 AS INT), 1)) + 1)) % 4294967296) * (1 << k)" +
        ")) % 4294967296) % 64 = 0 ELSE false END AS cut FROM pos), " +
        "idx AS (SELECT doc_id, text, i, " +
        "coalesce(sum(CASE WHEN cut THEN 1 ELSE 0 END) OVER " +
        "(PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND 1 PRECEDING), 0) AS ci FROM c), " +
        "ch AS (SELECT doc_id, text, ci, min(i) AS st, " +
        "count(*) AS ln FROM idx GROUP BY 1, 2, 3) " +
        "SELECT doc_id AS id, CAST(ci AS BIGINT) AS chunk_idx, " +
        "CAST(st AS BIGINT) AS start, CAST(ln AS BIGINT) AS len, " +
        "md5(substr(text, CAST(st + 1 AS INT), CAST(ln AS INT))) " +
        "AS chunk_md5 FROM ch"
    val mmPngPx = "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256"
    def mmLumaCte(gw: Int, gh: Int): String =
      mmLumaCteDims(gw, gh,
        "doc_id % 24 + 9", "doc_id % 16 + 8", "doc_id % 97")

    // Same replay with caller-chosen dims/seed expressions — the GIF
    // gates use DIFFERENT dims than the PNG gates, so a decoder that
    // silently fell through to the wrong codec path could not match.
    // Full-raster moment replay (exact luma moments + L1-gradient edge
    // count over the interior) for the pixel-stats gates — shared by
    // the PNG, GIF, and mixed-codec fixtures, which all carry the same
    // closed-form raster at their own dims.
    def mmLumaCteDims(
        gw: Int, gh: Int, wE: String, hE: String, sE: String,
        pxE: String = mmPngPx): String =
      s"m AS (SELECT doc_id AS id, $wE AS w, " +
        s"$hE AS h, $sE AS s FROM documents), " +
        s"l AS (SELECT id, list_transform(range(0, ${gw * gh}), g -> " +
        s"list_sum(flatten(list_transform(" +
        s"range((g // $gw) * h // $gh, ((g // $gw) + 1) * h // $gh), yy -> " +
        s"list_transform(" +
        s"range((g % $gw) * w // $gw, ((g % $gw) + 1) * w // $gw), xx -> " +
        s"$pxE)))) // " +
        s"((((g % $gw) + 1) * w // $gw - (g % $gw) * w // $gw) * " +
        s"(((g // $gw) + 1) * h // $gh - (g // $gw) * h // $gh))) " +
        "AS lum FROM m)"

    // Shared aHash replay (real-pixel luma grid -> mean threshold ->
    // two 32-bit words) for mm_ahash_neardup and the streaming dedup twin.
    val mmAHashCtes: String =
      mmLumaCte(8, 8) + ", " +
        "sm AS (SELECT id, lum, list_sum(lum) // 64 AS mn FROM l), " +
        "hsh AS (SELECT id, " +
        "CAST(list_sum(list_transform(range(0, 32), g -> " +
        "CASE WHEN lum[g + 1] > mn THEN (CAST(1 AS BIGINT) << g) " +
        "ELSE 0 END)) AS BIGINT) AS lo, " +
        "CAST(list_sum(list_transform(range(32, 64), g -> " +
        "CASE WHEN lum[g + 1] > mn THEN (CAST(1 AS BIGINT) << (g - 32)) " +
        "ELSE 0 END)) AS BIGINT) AS hi FROM sm)"
}
