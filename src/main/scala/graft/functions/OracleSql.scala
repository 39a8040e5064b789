package graft.functions

/** DuckDB-SQL generators that re-derive the engine's deterministic hash
  * pipelines (TextHash, Similarity's hyperplane LSH, Multimodal's stub
  * checksum) value-for-value, so the driver's DuckDB oracle can
  * hash-compare every near-dup / similarity / fingerprint query instead of
  * falling back to a weak rows-only check.
  *
  * Every fragment mirrors one Column builder: integer arithmetic is mod
  * TextHash.P in BIGINT (no platform sensitivity), and every float sum is a
  * strict left-to-right `list_reduce` fold — the same association order as
  * Spark's `aggregate(zip_with(...))` — so doubles are bit-identical, not
  * merely close. Constants (MinHash permutation coefficients, hyperplane
  * signs) are computed by the SAME Scala functions that feed the Spark
  * plan, so the two sides cannot drift.
  */
object OracleSql {

  private val P = TextHash.P

  // ---- TextHash mirrors -------------------------------------------------

  /** words(t): non-empty whitespace-separated tokens. */
  def words(t: String): String =
    s"list_filter(regexp_split_to_array($t, '\\s+'), w -> len(w) > 0)"

  /** wordHash(w): fold a = (a*31 + ascii(c)) % P, seed 7, over chars. */
  def wordHash(w: String): String = {
    val codes = s"list_transform(range(1, len($w)+1), i -> ascii(substr($w, i, 1)))"
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), $codes), (a, c) -> (a*31 + c) % $P)"
  }

  /** wordHashes(t): hash of every token, order-preserving. */
  def wordHashes(t: String): String =
    s"list_transform(${words(t)}, w -> ${wordHash("w")})"

  /** shingleHashes(wh, n): word-n-gram polynomial hashes (empty if < n). */
  def shingles(wh: String, n: Int): String = {
    val fold = (0 until n).foldLeft("CAST(7 AS BIGINT)") { (acc, k) =>
      s"(($acc)*31 + $wh[i+$k+1]) % $P"
    }
    s"CASE WHEN len($wh) < $n THEN CAST([] AS BIGINT[]) " +
      s"ELSE list_transform(range(0, len($wh)-$n+1), i -> $fold) END"
  }

  /** Position-carrying twin of [[shingles]]: (pos, h) structs with pos
    * 1-based — the anchor form the maximal-span dedup joins on. */
  def shingleStructs(wh: String, n: Int): String = {
    val fold = (0 until n).foldLeft("CAST(7 AS BIGINT)") { (acc, k) =>
      s"(($acc)*31 + $wh[i+$k+1]) % $P"
    }
    s"CASE WHEN len($wh) < $n THEN CAST([] AS STRUCT(pos BIGINT, h BIGINT)[]) " +
      s"ELSE list_transform(range(0, len($wh)-$n+1), " +
      s"i -> struct_pack(pos := CAST(i + 1 AS BIGINT), h := $fold)) END"
  }

  /** minhash(sh, j) with the same permutation coefficients as TextHash. */
  def minhash(sh: String, j: Int): String =
    s"list_min(list_transform(list_distinct($sh), s -> " +
      s"(s*${TextHash.permuteA(j)} + ${TextHash.permuteB(j)}) % $P))"

  /** simhash(wh, bits): per-bit ±1 majority vote, empty doc → 0. */
  def simhash(wh: String, bits: Int): String =
    (0 until bits).map { j =>
      s"CASE WHEN coalesce(list_sum(list_transform($wh, " +
        s"h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 " +
        s"THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** docHash(wh): order-sensitive whole-doc fold, seed 7. */
  def docHash(wh: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), $wh), (a, h) -> (a*31 + h) % $P)"

  // ---- Similarity mirrors ----------------------------------------------

  /** Strict left-to-right double sum of a list expression. */
  def foldSum(products: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $products), (a, b) -> a + b)"

  /** dot(v, w): Σ v[i]*w[i], left-to-right (Similarity.dot). */
  def dot(v: String, w: String): String =
    foldSum(s"list_transform(range(1, len($v)+1), i -> $v[i] * $w[i])")

  /** planeSign(i, j, dim): ±1 component of hyperplane i
    * (Similarity.planeSign — sign-hash stride is dim). */
  def planeSign(i: Int, j: String, dim: Int): String =
    s"CASE WHEN (((($j + ${dim.toLong * i}) * 1103515245) % $P + 12345) % $P) % 2 = 0 " +
      "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"

  /** hyperplaneBucket(v, dim, planes): bit i = sign of projection i. */
  def hyperplaneBucket(v: String, dim: Int, planes: Int): String =
    (0 until planes).map { i =>
      val proj = foldSum(
        s"list_transform(range(0, $dim), j -> $v[j+1] * ${planeSign(i, "j", dim)})")
      s"CASE WHEN ($proj) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** LSH band keys for a MinHash signature already projected as mh0..mh{m-1}:
    * one SELECT per band over a `sig` CTE, UNION ALL'd. */
  def lshBanded(idCol: String, m: Int, r: Int): String = {
    val bands = m / r
    (0 until bands).map { b =>
      val key = (0 until r).foldLeft("CAST(7 AS BIGINT)") { (acc, k) =>
        s"(($acc)*31 + mh${b * r + k}) % $P"
      }
      s"SELECT $idCol, $b AS band, $key AS key FROM sig WHERE mh0 IS NOT NULL"
    }.mkString(" UNION ALL ")
  }

  /** Lloyd's k-means CTE chain mirroring `Similarity.kmeansCentroids`
    * stage-for-stage, over a prior CTE `samp`($idCol, v, nrm). Emits CTEs
    * `c0 .. c$iters`; the final `c$iters` holds (cid, cv, cnrm).
    *
    * Init = the k lowest-id sample vectors; assignment = argmax cosine
    * with (cos DESC, cid ASC) tie-break (NaN ranks first in both engines,
    * matching the Spark fold's zero-norm handling); means accumulate as
    * `floor(x * 2^20)` BIGINTs so the sums are exact integers —
    * order-independent, hence bit-identical across engines — and cells
    * that lose all members keep their previous centroid (LEFT JOIN +
    * coalesce).
    *
    * PRECONDITION: `$idCol` must be unique within `samp`. The assignment
    * step deduplicates via `row_number() OVER (PARTITION BY $idCol)`, so
    * duplicate-id rows collapse to ONE assigned row here while
    * `Similarity.kmeansCentroids`' bestCell fold assigns EVERY row — the
    * engines silently diverge on duplicate ids (the same pitfall
    * `Packing.packContiguous` documents for non-unique order keys). */
  def kmeansCtes(idCol: String, k: Int, iters: Int, dim: Int,
      prefix: String = ""): String = {
    // `prefix` namespaces every CTE (and the expected input CTE
    // `${prefix}samp`) so several independent chains — e.g. one per PQ
    // subspace — can live in one statement.
    val q = 1048576L // Similarity.MeanQ
    val samp = s"${prefix}samp"
    val init =
      s"${prefix}c0 AS (SELECT CAST(row_number() OVER (ORDER BY $idCol) - 1 AS BIGINT) " +
        "AS cid, v AS cv, nrm AS cnrm " +
        s"FROM (SELECT * FROM $samp ORDER BY $idCol LIMIT $k))"
    val steps = (1 to iters).map { i =>
      val p = s"${prefix}c${i - 1}"
      s"${prefix}a$i AS (SELECT sid, sv, cid AS cell FROM (" +
        s"SELECT s.$idCol AS sid, s.v AS sv, c.cid, row_number() OVER (" +
        s"PARTITION BY s.$idCol ORDER BY ${dot("s.v", "c.cv")} / " +
        "(s.nrm * c.cnrm) DESC, c.cid ASC) AS rn " +
        s"FROM $samp s CROSS JOIN $p c) WHERE rn = 1), " +
        s"${prefix}m$i AS (SELECT cell AS cid, t.j AS j, " +
        s"sum(CAST(floor(a.sv[t.j] * $q.0) AS BIGINT)) AS sq, count(*) AS cnt " +
        s"FROM ${prefix}a$i a, range(1, ${dim + 1}) t(j) GROUP BY cell, t.j), " +
        s"${prefix}g$i AS (SELECT cid, list(CAST(sq AS DOUBLE) / " +
        s"CAST(cnt * $q AS DOUBLE) ORDER BY j) AS cv FROM ${prefix}m$i GROUP BY cid), " +
        s"${prefix}c$i AS (SELECT cid, cv, sqrt(${dot("cv", "cv")}) AS cnrm FROM " +
        s"(SELECT p.cid, coalesce(g.cv, p.cv) AS cv " +
        s"FROM $p p LEFT JOIN ${prefix}g$i g USING (cid)))"
    }
    (init +: steps).mkString(", ")
  }

  /** Fixed-point PageRank CTE chain mirroring `Graph.pageRank`
    * stage-for-stage, over a prior CTE `e`(src, dst) that must already be
    * DISTINCT (the engine collapses duplicate edges; a non-distinct `e`
    * would double-count contributions here). Emits CTEs `deg`, `nodes`,
    * `cst`, `it0 .. it$iters`; the final `it$iters` holds (node, rank_q).
    *
    * Every division is BIGINT floor division (`//`, matching Spark's
    * `div` on the all-nonnegative ranks) and the contribution sum is cast
    * back to BIGINT immediately (DuckDB sums BIGINT into HUGEINT — the
    * round-4 type-fidelity lesson), so rank_q is bit-identical to the
    * engine's. */
  def pageRankCtes(iters: Int, q: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val telNum = (dampDen - dampNum) * q
    val base =
      "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), " +
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "cst AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), " +
        s"it0 AS (SELECT node, CAST($q AS BIGINT) // cst.n AS rank_q " +
        "FROM nodes CROSS JOIN cst)"
    val steps = (1 to iters).map { i =>
      val p = s"it${i - 1}"
      s"s$i AS (SELECT e.dst AS node, " +
        "CAST(sum(r.rank_q // d.outdeg) AS BIGINT) AS acc " +
        s"FROM e JOIN deg d ON e.src = d.src JOIN $p r ON r.node = e.src " +
        "GROUP BY e.dst), " +
        s"it$i AS (SELECT nd.node, CAST($telNum AS BIGINT) // " +
        s"($dampDen * cst.n) + ($dampNum * coalesce(s$i.acc, " +
        s"CAST(0 AS BIGINT))) // $dampDen AS rank_q " +
        s"FROM nodes nd CROSS JOIN cst LEFT JOIN s$i ON s$i.node = nd.node)"
    }
    (base +: steps).mkString(", ")
  }

  /** Katz-centrality CTE chain mirroring `Graph.katz` round-for-round
    * over prior CTEs `e`(src, dst) and the implicit node set: emits
    * `kz0 .. kz$iters`, each (node, katz_q) in exact quantized integer
    * arithmetic — x₀ = q, x_{t+1} = q + (alphaNum·Σ_in x_t) // alphaDen. */
  def katzCtes(iters: Int, q: Long = 1000000L,
      alphaNum: Long = 1L, alphaDen: Long = 32L): String = {
    val base =
      "knodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        s"kz0 AS (SELECT node, CAST($q AS BIGINT) AS katz_q FROM knodes)"
    val steps = (1 to iters).map { i =>
      s"ks$i AS (SELECT e.dst AS node, CAST(sum(r.katz_q) AS BIGINT) " +
        s"AS acc FROM e JOIN kz${i - 1} r ON r.node = e.src " +
        "GROUP BY e.dst), " +
        s"kz$i AS (SELECT nd.node, $q + ($alphaNum * coalesce(ks$i.acc, " +
        s"CAST(0 AS BIGINT))) // $alphaDen AS katz_q " +
        s"FROM knodes nd LEFT JOIN ks$i ON ks$i.node = nd.node)"
    }
    (base +: steps).mkString(", ")
  }

  /** Synchronous label-propagation CTE chain mirroring
    * `Graph.labelPropagation` round-for-round, over prior CTEs
    * `e`(src, dst) — SYMMETRIC, distinct, self-loop-free — and
    * `nodes`(node). Emits `lp0 .. lp$iters`; the final `lp$iters` holds
    * (node, lbl). Argmax tie-break (count DESC, lbl ASC) matches the
    * engine's `max_by(lbl, struct(c, -lbl))`; isolated nodes keep their
    * previous label via the LEFT JOIN + coalesce. */
  def labelPropCtes(iters: Int): String = {
    val init = "lp0 AS (SELECT node, node AS lbl FROM nodes)"
    val steps = (1 to iters).map { i =>
      s"a$i AS (SELECT e.dst AS node, l.lbl, count(*) AS c " +
        s"FROM e JOIN lp${i - 1} l ON l.node = e.src " +
        "GROUP BY e.dst, l.lbl), " +
        s"m$i AS (SELECT node, lbl FROM (SELECT node, lbl, " +
        "row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) " +
        s"AS rn FROM a$i) WHERE rn = 1), " +
        s"lp$i AS (SELECT n.node, coalesce(m.lbl, p.lbl) AS lbl " +
        s"FROM nodes n LEFT JOIN m$i m USING (node) " +
        s"JOIN lp${i - 1} p ON p.node = n.node)"
    }
    (init +: steps).mkString(", ")
  }

  /** Personalized-PageRank CTE chain mirroring
    * `Graph.personalizedPageRank` round-for-round, over prior CTEs
    * `e`(src, dst) — DISTINCT directed edges — and `seeds`(node).
    * Seeds outside the graph are dropped by the same node-set join the
    * engine performs; teleport and init are the identical floor
    * divisions. Emits `it0 .. it$iters`. */
  def pprCtes(iters: Int, q: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val telNum = (dampDen - dampNum) * q
    val base =
      "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), " +
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "sd AS (SELECT DISTINCT s.node FROM seeds s " +
        "JOIN nodes n ON n.node = s.node), " +
        "sct AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sd), " +
        s"it0 AS (SELECT n.node, CASE WHEN sd.node IS NOT NULL THEN " +
        s"CAST($q AS BIGINT) // sct.ns ELSE CAST(0 AS BIGINT) END " +
        "AS rank_q FROM nodes n CROSS JOIN sct " +
        "LEFT JOIN sd ON sd.node = n.node)"
    val steps = (1 to iters).map { i =>
      val p = s"it${i - 1}"
      s"s$i AS (SELECT e.dst AS node, " +
        "CAST(sum(r.rank_q // d.outdeg) AS BIGINT) AS acc " +
        s"FROM e JOIN deg d ON e.src = d.src JOIN $p r ON r.node = e.src " +
        "GROUP BY e.dst), " +
        s"it$i AS (SELECT nd.node, " +
        s"CASE WHEN sd.node IS NOT NULL THEN CAST($telNum AS BIGINT) // " +
        s"($dampDen * sct.ns) ELSE CAST(0 AS BIGINT) END + " +
        s"($dampNum * coalesce(s$i.acc, CAST(0 AS BIGINT))) // $dampDen " +
        "AS rank_q FROM nodes nd CROSS JOIN sct " +
        "LEFT JOIN sd ON sd.node = nd.node " +
        s"LEFT JOIN s$i ON s$i.node = nd.node)"
    }
    (base +: steps).mkString(", ")
  }

  /** HITS CTE chain mirroring `Graph.hits` half-round-for-half-round
    * over a prior CTE `e`(src, dst) — DISTINCT directed edges. Emits
    * `h0 .. h$iters` (hub scores) and `a1 .. a$iters` (authority
    * scores); the final state is `h$iters` + `a$iters`, each
    * (node, h|a) in exact fixed-point `q` units with L1 normalization
    * via BIGINT floor division — DuckDB's `//` replays Spark's `div`
    * exactly on the non-negative scores. */
  def hitsCtes(iters: Int, q: Long = 1000000L): String = {
    val init = "h0 AS (SELECT DISTINCT src AS node, " +
      s"CAST($q AS BIGINT) AS h FROM e)"
    val steps = (1 to iters).map { i =>
      s"ra$i AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS r " +
        s"FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst), " +
        s"ta$i AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM ra$i), " +
        s"a$i AS (SELECT node, (r * $q) // t AS a " +
        s"FROM ra$i CROSS JOIN ta$i), " +
        s"rh$i AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS r " +
        s"FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src), " +
        s"th$i AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM rh$i), " +
        s"h$i AS (SELECT node, (r * $q) // t AS h " +
        s"FROM rh$i CROSS JOIN th$i)"
    }
    (init +: steps).mkString(", ")
  }

  /** k-core peeling CTE chain mirroring `Graph.kCore` round-for-round,
    * over a prior CTE `e`(src, dst) that must be symmetrized, deduped,
    * and self-loop-free. Emits `s0 .. s$rounds` (survivor sets with
    * in-subgraph degree) and `e1 .. e$rounds`; the final `s$rounds`
    * holds (node, core_deg).
    *
    * `rounds` is a FIXED budget that must be >= the engine's convergence
    * round count — the k-core is a unique fixpoint, so extra rounds are
    * no-ops and the fixed-round replay lands on exactly the engine's
    * run-to-convergence answer (the same contract as `kmeansCtes`'
    * fixed iteration count). */
  def kCoreCtes(k: Int, rounds: Int): String = {
    // Every CTE MATERIALIZED: s$i is referenced twice by round i+1 and
    // e$i feeds a chain — default inlining would re-expand the prefix
    // exponentially (the farthestPointCtes lesson).
    def surv(i: Int, edges: String): String =
      s"s$i AS MATERIALIZED (SELECT src AS node, " +
        s"CAST(count(*) AS BIGINT) AS core_deg " +
        s"FROM $edges GROUP BY src HAVING count(*) >= $k)"
    val init = surv(0, "e")
    val steps = (1 to rounds).map { i =>
      s"e$i AS MATERIALIZED (SELECT t.src, t.dst " +
        s"FROM ${if (i == 1) "e" else s"e${i - 1}"} t " +
        s"JOIN s${i - 1} x ON t.src = x.node " +
        s"JOIN s${i - 1} y ON t.dst = y.node), " +
        surv(i, s"e$i")
    }
    (init +: steps).mkString(", ")
  }

  /** Bounded-depth multi-source BFS CTE chain mirroring `Graph.bfsHops`
    * round-for-round, over prior CTEs `e`(src, dst) and `seeds`(node,
    * distinct). Emits `d0 .. d$depth` and frontiers `f1 .. f$depth`; the
    * final `d$depth` holds (node, dist). Fixed depth in both engines —
    * no convergence dependence at all. */
  def bfsCtes(depth: Int): String = {
    // d$i is read twice per round (frontier scan + NOT EXISTS) —
    // MATERIALIZED for the same anti-re-expansion reason as kCoreCtes.
    val init =
      "d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds)"
    val steps = (1 to depth).map { i =>
      val prevFrontier =
        if (i == 1) "d0" else s"(SELECT node FROM d${i - 1} WHERE dist = ${i - 1})"
      s"f$i AS MATERIALIZED (SELECT DISTINCT t.dst AS node FROM e t " +
        s"JOIN $prevFrontier f ON t.src = f.node " +
        s"WHERE NOT EXISTS (SELECT 1 FROM d${i - 1} p WHERE p.node = t.dst)), " +
        s"d$i AS MATERIALIZED (SELECT node, dist FROM d${i - 1} UNION ALL " +
        s"SELECT node, CAST($i AS BIGINT) FROM f$i)"
    }
    (init +: steps).mkString(", ")
  }

  /** Multi-source BFS CTE chain mirroring `Graph.bfsMultiSource` over
    * prior CTEs `e`(src, dst) and `seeds`(node): emits `md0 .. md$depth`
    * of (seed, node, dist). */
  def bfsMultiCtes(depth: Int): String = {
    val init = "md0 AS MATERIALIZED (SELECT node AS seed, node, " +
      "CAST(0 AS BIGINT) AS dist FROM seeds)"
    val steps = (1 to depth).map { i =>
      val prevFrontier =
        if (i == 1) "md0"
        else s"(SELECT seed, node FROM md${i - 1} WHERE dist = ${i - 1})"
      s"mf$i AS MATERIALIZED (SELECT DISTINCT f.seed, t.dst AS node " +
        s"FROM e t JOIN $prevFrontier f ON t.src = f.node " +
        s"WHERE NOT EXISTS (SELECT 1 FROM md${i - 1} p " +
        "WHERE p.seed = f.seed AND p.node = t.dst)), " +
        s"md$i AS MATERIALIZED (SELECT seed, node, dist FROM md${i - 1} " +
        s"UNION ALL SELECT seed, node, CAST($i AS BIGINT) FROM mf$i)"
    }
    (init +: steps).mkString(", ")
  }

  /** Landmark-betweenness CTE chain mirroring
    * `Graph.betweennessLandmarks` level-for-level over prior CTEs
    * `e`(src, dst), `seeds`(node), and [[bfsMultiCtes]]'s `md$depth`:
    * σ forward (`sg0..sg$depth`), quantized δ backward
    * (`dq$depth..dq0`), betweenness in `bq`(node, betweenness_q). */
  def betweennessCtes(depth: Int, q: Long = 1000000L): String = {
    val d = depth
    val sg = (1 to d).map { l =>
      s"sg$l AS (SELECT dd.seed, dd.node, CAST(sum(p.sig) AS BIGINT) " +
        s"AS sig FROM (SELECT seed, node FROM md$d WHERE dist = $l) dd " +
        s"JOIN e ON e.dst = dd.node " +
        s"JOIN sg${l - 1} p ON p.seed = dd.seed AND p.node = e.src " +
        "GROUP BY dd.seed, dd.node)"
    }
    val sg0 = "sg0 AS (SELECT node AS seed, node, CAST(1 AS BIGINT) " +
      "AS sig FROM seeds)"
    val dqD = s"dq$d AS (SELECT seed, node, CAST(0 AS BIGINT) AS dq " +
      s"FROM md$d WHERE dist = $d)"
    val dq = ((d - 1) to 0 by -1).map { l =>
      s"ct$l AS (SELECT su.seed, su.node, " +
        s"CAST(sum((su.sig * ($q + w.dq)) // sw.sig) AS BIGINT) AS s " +
        s"FROM sg$l su JOIN e ON e.src = su.node " +
        s"JOIN dq${l + 1} w ON w.seed = su.seed AND w.node = e.dst " +
        s"JOIN sg${l + 1} sw ON sw.seed = su.seed AND sw.node = e.dst " +
        "GROUP BY su.seed, su.node), " +
        s"dq$l AS (SELECT m.seed, m.node, coalesce(c.s, 0) AS dq " +
        s"FROM (SELECT seed, node FROM md$d WHERE dist = $l) m " +
        s"LEFT JOIN ct$l c ON c.seed = m.seed AND c.node = m.node)"
    }
    val bq = "bq AS (SELECT node, CAST(sum(dq) AS BIGINT) " +
      "AS betweenness_q FROM (" +
      (1 to d).map(l => s"SELECT node, dq FROM dq$l")
        .mkString(" UNION ALL ") +
      ") GROUP BY node)"
    ((sg0 +: sg) ++ (dqD +: dq) :+ bq).mkString(", ")
  }

  /** Jaro-Winkler CTE stages mirroring `NativeKernels.jaroWinkler`
    * decision-for-decision over a prior CTE `pairsCte`(…, $a, $b):
    * emits `jwst`, `jwext`, `jwout`, where `jwout` carries every
    * `pairsCte` column plus `jw` (DOUBLE).
    *
    * The greedy match scan is a `list_reduce` whose accumulator packs
    * BOTH match sets as BIGINT bitmasks (b-side used positions, a-side
    * matched positions) — DuckDB 1.0's `list_reduce` drops LIST fields
    * from struct accumulators (observed: only the last `list_append`
    * survives), so positions are recovered AFTER the fold by filtering
    * `range` against the masks. The element struct smuggles the 1-based
    * position i in its `am` field. Transpositions then compare the
    * a-matched chars (ascending i = match order) against the b-matched
    * chars (ascending j), exactly the kernel's sorted-mj comparison, and
    * the score is the kernel's IEEE sequence operation-for-operation:
    * `(m/|a| + m/|b| + (m − t/2)/m)/3` then `+ l·0.1·(1−jaro)`.
    *
    * CONSTRAINT: both strings must be ≤ 63 characters (BIGINT bitmask) —
    * gates feed bounded title/name slices. Correlation note: built as
    * table-level CTE stages, not a scalar subquery, because DuckDB does
    * not resolve outer-row columns two subquery levels deep. */
  def jaroWinklerCtes(pairsCte: String, a: String, b: String): String = {
    val la = s"len($a)"
    val lb = s"len($b)"
    val w = s"greatest(greatest($la, $lb) // 2 - 1, 0)"
    val empty = "{'bm': CAST(0 AS BIGINT), 'am': CAST(0 AS BIGINT)}"
    val elems = s"list_transform(range(1, $la + 1), i -> " +
      "{'bm': CAST(0 AS BIGINT), 'am': CAST(i AS BIGINT)})"
    val js =
      s"list_filter(range(greatest(1, x.am - ($w)), least($lb, x.am + ($w)) + 1), " +
        s"j -> ((acc.bm >> (j - 1)) & 1) = 0 AND " +
        s"substr($b, CAST(j AS BIGINT), 1) = substr($a, CAST(x.am AS BIGINT), 1))"
    val step = s"CASE WHEN len($js) = 0 THEN acc ELSE " +
      s"{'bm': acc.bm | (CAST(1 AS BIGINT) << (CAST(list_min($js) AS BIGINT) - 1)), " +
      "'am': acc.am | (CAST(1 AS BIGINT) << (CAST(x.am AS BIGINT) - 1))} END"
    val fold = s"list_reduce(list_prepend($empty, $elems), (acc, x) -> $step)"
    val m = "CAST(len(al) AS BIGINT)"
    val t2 = "CAST(len(list_filter(range(1, len(al) + 1), " +
      s"k -> substr($a, CAST(al[k] AS BIGINT), 1) <> " +
      s"substr($b, CAST(jl[k] AS BIGINT), 1))) AS BIGINT)"
    val prefix =
      s"least(4, $la, $lb, CASE WHEN substr($a,1,1) <> substr($b,1,1) THEN 0 " +
        s"WHEN substr($a,2,1) <> substr($b,2,1) THEN 1 " +
        s"WHEN substr($a,3,1) <> substr($b,3,1) THEN 2 " +
        s"WHEN substr($a,4,1) <> substr($b,4,1) THEN 3 ELSE 4 END)"
    val jaro =
      s"(CAST($m AS DOUBLE) / CAST($la AS DOUBLE) + " +
        s"CAST($m AS DOUBLE) / CAST($lb AS DOUBLE) + " +
        s"(CAST($m AS DOUBLE) - CAST($t2 AS DOUBLE) / 2.0) / " +
        s"CAST($m AS DOUBLE)) / 3.0"
    s"jwst AS (SELECT *, $fold AS st FROM $pairsCte), " +
      "jwext AS (SELECT *, " +
      s"list_filter(range(1, $la + 1), p -> ((st.am >> (p - 1)) & 1) = 1) AS al, " +
      s"list_filter(range(1, $lb + 1), p -> ((st.bm >> (p - 1)) & 1) = 1) AS jl " +
      "FROM jwst), " +
      s"jwout AS (SELECT *, CASE WHEN $la = 0 AND $lb = 0 THEN 1.0 " +
      s"WHEN $la = 0 OR $lb = 0 THEN 0.0 " +
      "WHEN len(al) = 0 THEN 0.0 " +
      s"ELSE ($jaro) + CAST($prefix AS DOUBLE) * 0.1 * (1.0 - ($jaro)) END " +
      "AS jw FROM jwext)"
  }

  /** Farthest-point selection CTE chain mirroring
    * `Similarity.farthestPointSample` round-for-round, over a prior CTE
    * `kc`(vec_id, v, nrm). Emits `sel0 .. sel${k-1}`; the final
    * `sel${k-1}` holds (pick, vec_id, v, nrm) for all k picks.
    *
    * Scores are per-row `list_inner_product` cosines (bit-identical to
    * the engine's strict-fold dot — no cross-row accumulation), the max
    * over centers is an aggregate max (associative, NaN-greatest in both
    * engines, = the engine's fold), and each round's argmin tie-breaks
    * (mc ASC, vec_id ASC) exactly like the engine's TakeOrdered.
    *
    * Every chained CTE is MATERIALIZED: each `sel$i` is referenced twice
    * by round i+1 (the scan and the NOT IN), so DuckDB's default CTE
    * inlining would re-expand the whole prefix 2^k times — measured 283 s
    * for k=8 over 500 vectors; materialized, milliseconds. */
  def farthestPointCtes(k: Int, src: String = "kc", pre: String = ""): String = {
    val init =
      s"${pre}sel0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS pick, vec_id, v, nrm " +
        s"FROM (SELECT * FROM $src ORDER BY vec_id LIMIT 1))"
    val steps = (1 until k).map { i =>
      val p = s"${pre}sel${i - 1}"
      s"${pre}m$i AS MATERIALIZED (SELECT e.vec_id, max(list_inner_product(e.v, s.v) / " +
        s"(e.nrm * s.nrm)) AS mc FROM $src e, $p s " +
        s"WHERE e.vec_id NOT IN (SELECT vec_id FROM $p) GROUP BY e.vec_id), " +
        s"${pre}pk$i AS (SELECT vec_id FROM ${pre}m$i ORDER BY mc ASC, vec_id ASC LIMIT 1), " +
        s"${pre}sel$i AS MATERIALIZED (SELECT * FROM $p UNION ALL " +
        s"SELECT CAST($i AS BIGINT), e.vec_id, e.v, e.nrm " +
        s"FROM $src e JOIN ${pre}pk$i USING (vec_id))"
    }
    (init +: steps).mkString(", ")
  }

  /** Batched-oversampling k-center CTE chain mirroring
    * `Similarity.farthestPointSampleScalable` round-for-round: `cand0`
    * is the min-id seed; each round `r` scores every non-candidate by
    * max cosine against the whole candidate set (`bm$r`) and admits the
    * ℓ farthest at once (`bt$r`: mc ASC, vec_id ASC LIMIT ℓ); the final
    * bounded candidate table `kcand` feeds the exact greedy chain
    * ([[farthestPointCtes]] with the `g` prefix). Select from
    * `gsel{k-1}`. Expects a prior CTE `kc`(vec_id, v, nrm). */
  def farthestPointBatchCtes(k: Int, ell: Int, rounds: Int): String = {
    val init =
      "cand0 AS MATERIALIZED (SELECT vec_id, v, nrm " +
        "FROM (SELECT * FROM kc ORDER BY vec_id LIMIT 1))"
    val steps = (1 to rounds).map { r =>
      val p = s"cand${r - 1}"
      s"bm$r AS MATERIALIZED (SELECT e.vec_id, max(list_inner_product(e.v, s.v) / " +
        s"(e.nrm * s.nrm)) AS mc FROM kc e, $p s " +
        s"WHERE e.vec_id NOT IN (SELECT vec_id FROM $p) GROUP BY e.vec_id), " +
        s"bt$r AS (SELECT vec_id FROM bm$r ORDER BY mc ASC, vec_id ASC LIMIT $ell), " +
        s"cand$r AS MATERIALIZED (SELECT * FROM $p UNION ALL " +
        s"SELECT e.vec_id, e.v, e.nrm FROM kc e JOIN bt$r USING (vec_id))"
    }
    val kcand = s"kcand AS MATERIALIZED (SELECT * FROM cand$rounds)"
    ((init +: steps) :+ kcand :+ farthestPointCtes(k, "kcand", "g"))
      .mkString(", ")
  }

  /** MMR (maximal-marginal-relevance) CTE chain mirroring
    * `Similarity.mmrSelect` round-for-round at λ = 0.5: `mrel` scores
    * relevance against a prior CTE `q`(qv, qn), `mpool` is the
    * (rel DESC, vec_id ASC) top-`pool` cut, `msel0` seeds with the most
    * relevant, and each round's argmax orders by
    * `0.5 * rel - 0.5 * mx DESC, vec_id ASC` — the engine's exact score
    * chain. Expects a prior CTE `kc`(vec_id, v, nrm) with zero-norm rows
    * already excluded. Select from `msel${k-1}`. All chained CTEs
    * MATERIALIZED (the farthestPointCtes inlining-blowup lesson). */
  def mmrCtes(k: Int, pool: Int): String = {
    val init =
      "mrel AS MATERIALIZED (SELECT vec_id, v, nrm, " +
        "list_inner_product(v, qv) / (nrm * qn) AS rel " +
        "FROM kc CROSS JOIN q), " +
        s"mpool AS MATERIALIZED (SELECT * FROM mrel " +
        s"ORDER BY rel DESC, vec_id ASC LIMIT $pool), " +
        "msel0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS pick, " +
        "vec_id, v, nrm, rel FROM mpool " +
        "ORDER BY rel DESC, vec_id ASC LIMIT 1)"
    val steps = (1 until k).map { i =>
      val p = s"msel${i - 1}"
      s"mm$i AS MATERIALIZED (SELECT e.vec_id, e.rel, " +
        "max(list_inner_product(e.v, s.v) / (e.nrm * s.nrm)) AS mx " +
        s"FROM mpool e, $p s WHERE e.vec_id NOT IN " +
        s"(SELECT vec_id FROM $p) GROUP BY e.vec_id, e.rel), " +
        s"mpk$i AS (SELECT vec_id FROM mm$i " +
        "ORDER BY 0.5 * rel - 0.5 * mx DESC, vec_id ASC LIMIT 1), " +
        s"msel$i AS MATERIALIZED (SELECT * FROM $p UNION ALL " +
        s"SELECT CAST($i AS BIGINT), e.vec_id, e.v, e.nrm, e.rel " +
        s"FROM mpool e JOIN mpk$i USING (vec_id))"
    }
    (init +: steps).mkString(", ")
  }

  /** BPE merge-training CTE chain mirroring `Bpe.learnMerges`
    * iteration-for-iteration, over a prior CTE `w0`(w, freq) — the
    * word-frequency dict. Emits `v0` (character split) and, per round r,
    * `p$r` (freq-weighted adjacent-pair counts), `b$r` (the chosen merge:
    * count DESC, a ASC, b ASC) and `v$r` (dict rewritten by the greedy
    * left-to-right merge fold). Select the merge table from `b1..b$k`.
    *
    * All chained CTEs are MATERIALIZED (each round reads the previous
    * twice — the inlining-blowup lesson from farthestPointCtes); the
    * merge fold is a seedless list_reduce whose accumulator starts as
    * `[s1]` via the `list_transform(s, x -> [x])` wrapping, identical to
    * the engine's empty-seed append fold. */
  def bpeCtes(merges: Int): String = {
    val init =
      "v0 AS MATERIALIZED (SELECT w, list_transform(range(1, len(w) + 1), " +
        "i -> substr(w, i, 1)) AS s, freq FROM w0)"
    val steps = (1 to merges).map { r =>
      val p = s"v${r - 1}"
      s"p$r AS MATERIALIZED (SELECT t.p.a AS a, t.p.b AS b, " +
        "CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
        "SELECT unnest(list_transform(range(1, len(s)), " +
        s"i -> struct_pack(a := s[i], b := s[i+1]))) AS p, freq FROM $p) t " +
        "GROUP BY t.p.a, t.p.b), " +
        s"b$r AS (SELECT a, b, cnt FROM p$r " +
        "ORDER BY cnt DESC, a ASC, b ASC LIMIT 1), " +
        s"v$r AS MATERIALIZED (SELECT w, list_reduce(" +
        "list_transform(s, x -> [x]), (acc, x) -> " +
        s"CASE WHEN acc[-1] = b$r.a AND x[1] = b$r.b " +
        s"THEN list_append(list_slice(acc, 1, len(acc) - 1), b$r.a || b$r.b) " +
        "ELSE list_append(acc, x[1]) END) AS s, freq " +
        s"FROM $p, b$r)"
    }
    (init +: steps).mkString(", ")
  }

  /** Decimal log-bucket quantile-sketch CTE chain mirroring
    * `Sketches.quantileSketch` + `quantileFromSketch`: expects a prior
    * CTE `qraw`(g, x); emits `qest`(g, pct, n_rows, est). The power-of-
    * ten literals are rendered from the SAME exact doubles the engine
    * multiplies by (`Sketches.Pow10` — every one exactly representable),
    * so bucketing is bit-identical: IEEE multiply/divide + floor, no
    * libm on either side. */
  def quantileSketchCtes(
      percents: Seq[Int], gCols: Seq[String] = Seq("g")): String = {
    val pow = graft.ops.Sketches.Pow10
    val mCase = "CASE d WHEN 1 THEN floor(x * 100.0) WHEN 2 THEN floor(x * 10.0) " +
      (3 to 19).map(dd => s"WHEN $dd THEN floor(x / ${pow(dd - 3)})").mkString(" ") +
      " END"
    val midCase = "CASE dd WHEN 0 THEN 0.5 WHEN 1 THEN mm / 100.0 WHEN 2 THEN mm / 10.0 " +
      (3 to 19).map(dd => s"WHEN $dd THEN mm * ${pow(dd - 3)}").mkString(" ") +
      " END"
    val pctList = percents.mkString("[", ",", "]")
    val g = gCols.mkString(", ")
    s"qb0 AS (SELECT $g, x, length(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)) AS d " +
      "FROM qraw WHERE x IS NOT NULL), " +
      s"qb AS (SELECT $g, CASE WHEN x < 1.0 THEN 0 ELSE d*1000 + CAST($mCase AS BIGINT) END AS qbucket FROM qb0), " +
      s"qs AS (SELECT $g, qbucket, count(*) AS qcnt FROM qb " +
      "WHERE qbucket IS NOT NULL GROUP BY ALL), " +
      s"qc AS (SELECT $g, qbucket, qcnt, " +
      s"sum(qcnt) OVER (PARTITION BY $g ORDER BY qbucket) AS cum, " +
      s"sum(qcnt) OVER (PARTITION BY $g) AS n FROM qs), " +
      s"qp AS (SELECT CAST(unnest($pctList) AS INT) AS pct), " +
      s"qf AS (SELECT $g, pct, CAST(max(n) AS BIGINT) AS n_rows, min(qbucket) AS qb " +
      "FROM qc, qp WHERE cum >= (pct*n + 99) // 100 GROUP BY ALL), " +
      s"qm AS (SELECT $g, pct, n_rows, qb // 1000 AS dd, " +
      "CAST(qb % 1000 AS DOUBLE) + 0.5 AS mm FROM qf), " +
      s"qest AS (SELECT $g, pct, n_rows, $midCase AS est FROM qm)"
  }

  // ---- Multimodal mirror -------------------------------------------------

  /** The stub decode checksum over an ASCII text column's bytes:
    * fold a = (a*31 + byte) % P, seed 7 (Multimodal.decodeBatch). */
  def asciiChecksum(t: String): String = {
    val codes =
      s"list_transform(range(1, len($t)+1), i -> CAST(ascii(substr($t, i, 1)) AS BIGINT))"
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), $codes), (x, c) -> (x*31 + c) % $P)"
  }

  // ---- Unigram-LM tokenizer mirror ---------------------------------------
  //
  // LAMBDA-FOLD HAZARD (duckdb 1.0.0, found live in r13): a list_reduce
  // whose lambda CAPTURES other columns of the same row (`substr(w, …)`,
  // `dp[…]` inside the fold body) evaluates nondeterministically —
  // ~30% of runs paired one word's fold result with another row, and a
  // struct-packed workaround corrupted the accumulator itself. bpeCtes
  // is immune because its fold only touches acc/x and one-row-CTE
  // constants. The sequential parts below therefore use WITH RECURSIVE
  // (plain scans + hash joins, no lambdas); 0/12 flaky vs 4-8/15 for
  // every fold variant tried.

  /** Viterbi DP for round `r` as a recursive CTE reading cost table
    * `csrc`(piece, costq): emits `udp{r}`(w, freq, arr) where arr is the
    * packed BIGINT dp list of `Unigram.dpCol` — dp[i] = cost·4 + (3−L),
    * seed 3 at position 0. Candidate lookups are three LEFT JOINs on the
    * ≤3 pieces ending at the position being filled; `least` skips the
    * NULLs of absent pieces, and single chars are always in vocab so
    * every position is reachable. Recursion depth = max word length. */
  private def unigramDpCte(r: Int, csrc: String): String =
    s"udp$r AS MATERIALIZED (WITH RECURSIVE rec(w, freq, i, n, arr) AS (" +
      "SELECT w, freq, 0, CAST(len(w) AS INT), [CAST(3 AS BIGINT)] FROM w0 " +
      "UNION ALL " +
      "SELECT rec.w, rec.freq, rec.i + 1, rec.n, " +
      "list_append(rec.arr, least(" +
      "((rec.arr[rec.i + 1] // 4) + ca.costq) * 4 + 2, " +
      "CASE WHEN rec.i >= 1 THEN ((rec.arr[rec.i] // 4) + cb.costq) * 4 + 1 END, " +
      "CASE WHEN rec.i >= 2 THEN ((rec.arr[rec.i - 1] // 4) + cc.costq) * 4 + 0 END)) " +
      "FROM rec " +
      s"LEFT JOIN $csrc ca ON ca.piece = substr(rec.w, rec.i + 1, 1) " +
      s"LEFT JOIN $csrc cb ON rec.i >= 1 AND cb.piece = substr(rec.w, rec.i, 2) " +
      s"LEFT JOIN $csrc cc ON rec.i >= 2 AND cc.piece = substr(rec.w, rec.i - 1, 3) " +
      "WHERE rec.i < rec.n) " +
      "SELECT w, freq, arr FROM rec WHERE i = n)"

  /** Backtrace of `udp{r}` as a recursive CTE: walk pos ← pos − L with
    * L = 3 − (arr[pos] & 3), collecting pieces; emits `d{r}`(w, freq,
    * pieces) once pos reaches 0. */
  private def unigramBtCte(r: Int): String = {
    val l = "(3 - (arr[pos + 1] % 4))"
    s"d$r AS MATERIALIZED (WITH RECURSIVE bt(w, freq, arr, pos, ps) AS (" +
      s"SELECT w, freq, arr, CAST(len(w) AS INT), CAST([] AS VARCHAR[]) FROM udp$r " +
      "UNION ALL " +
      s"SELECT w, freq, arr, pos - $l, " +
      s"list_append(ps, substr(w, pos - $l + 1, $l)) FROM bt WHERE pos > 0) " +
      "SELECT w, freq, ps AS pieces FROM bt WHERE pos = 0)"
  }

  /** The full unigram-LM training run as a MATERIALIZED CTE chain
    * (`Unigram.trained`): expects a prior CTE `w0`(w, freq); emits
    * per-round CTEs `d{r}`(w, freq, pieces), `n{r}`(piece, cnt) and
    * `c{r}`(piece, costq) for r = 1..rounds (plus `c0` seed costs).
    * Costs are the LogQ fixed-point convention; the census / seed-vocab
    * / EM-round semantics mirror the Scala scaladoc line for line. */
  def unigramCtes(rounds: Int, multiVocab: Int): String = {
    val maxL = graft.ops.Unigram.MaxPieceLen
    val q = graft.ops.TextAnalysis.LogQ
    val base =
      "ucensus AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt " +
        "FROM (SELECT substr(w, p.i, p.L) AS piece, freq FROM (" +
        "SELECT w, freq, unnest(flatten(list_transform(range(1, len(w) + 1), i -> " +
        s"list_transform(range(1, least($maxL, len(w) - i + 1) + 1), L -> " +
        "struct_pack(i := i, L := L))))) AS p FROM w0)) GROUP BY piece), " +
        "vocab0 AS MATERIALIZED (SELECT piece, cnt FROM ucensus WHERE len(piece) = 1 " +
        "UNION ALL SELECT piece, cnt FROM (SELECT piece, cnt FROM ucensus " +
        s"WHERE len(piece) >= 2 ORDER BY cnt DESC, piece ASC LIMIT $multiVocab)), " +
        "uvs AS (SELECT CAST(count(*) AS BIGINT) AS vs, " +
        "CAST(sum(cnt) AS BIGINT) AS t0 FROM vocab0), " +
        "c0 AS MATERIALIZED (SELECT piece, " +
        s"CAST(-floor(ln((cnt + 1) / (t0 + vs)) * $q.0) AS BIGINT) AS costq " +
        "FROM vocab0, uvs)"
    val steps = (1 to rounds).map { r =>
      unigramDpCte(r, s"c${r - 1}") + ", " + unigramBtCte(r) + ", " +
        s"n$r AS MATERIALIZED (SELECT v.piece, CAST(coalesce(u.n, 0) AS BIGINT) AS cnt " +
        "FROM vocab0 v LEFT JOIN (SELECT piece, sum(freq) AS n FROM " +
        s"(SELECT unnest(pieces) AS piece, freq FROM d$r) GROUP BY piece) u " +
        "ON v.piece = u.piece), " +
        s"t$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM n$r), " +
        s"c$r AS MATERIALIZED (SELECT piece, " +
        s"CAST(-floor(ln((cnt + 1) / (t + vs)) * $q.0) AS BIGINT) AS costq " +
        s"FROM n$r, t$r, uvs)"
    }
    (base +: steps).mkString(", ")
  }

  /** Prune-and-refit extension of [[unigramCtes]] (the
    * `Unigram.trainPruned` replay): keep singles + top-`keepMulti`
    * multi-char pieces of `n{rounds}` by (cnt DESC, piece ASC),
    * renormalize costs over the kept vocab, one more DP/backtrace
    * round under the pruned costs, re-count, refit. Emits `vocabP`,
    * `cP` (pruned seed costs), `d{rounds+1}`, `nP` (post-round
    * counts), `cF` (refit costs). */
  def unigramPruneCtes(rounds: Int, keepMulti: Int): String = {
    val q = graft.ops.TextAnalysis.LogQ
    val r1 = rounds + 1
    s"vocabP AS MATERIALIZED (SELECT piece, cnt FROM n$rounds " +
      "WHERE len(piece) = 1 " +
      s"UNION ALL SELECT piece, cnt FROM (SELECT piece, cnt FROM n$rounds " +
      s"WHERE len(piece) >= 2 ORDER BY cnt DESC, piece ASC LIMIT $keepMulti)), " +
      "uvsP AS (SELECT CAST(count(*) AS BIGINT) AS vs, " +
      "CAST(sum(cnt) AS BIGINT) AS t0 FROM vocabP), " +
      "cP AS MATERIALIZED (SELECT piece, " +
      s"CAST(-floor(ln((cnt + 1) / (t0 + vs)) * $q.0) AS BIGINT) AS costq " +
      "FROM vocabP, uvsP), " +
      unigramDpCte(r1, "cP") + ", " + unigramBtCte(r1) + ", " +
      "nP AS MATERIALIZED (SELECT v.piece, " +
      "CAST(coalesce(u.n, 0) AS BIGINT) AS cnt " +
      "FROM vocabP v LEFT JOIN (SELECT piece, sum(freq) AS n FROM " +
      s"(SELECT unnest(pieces) AS piece, freq FROM d$r1) GROUP BY piece) u " +
      "ON v.piece = u.piece), " +
      "tP AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM nP), " +
      "cF AS MATERIALIZED (SELECT piece, " +
      s"CAST(-floor(ln((cnt + 1) / (t + vs)) * $q.0) AS BIGINT) AS costq " +
      "FROM nP, tP, uvsP)"
  }

  /** One extra segmentation pass under the final costs `c{rounds}`
    * (encode side): emits `useg`(w, n_p) — per-word trained token count. */
  def unigramEncodeCtes(rounds: Int): String =
    unigramDpCte(rounds + 1, s"c$rounds") + ", " +
      unigramBtCte(rounds + 1) + ", " +
      "useg AS MATERIALIZED (SELECT w, " +
      s"CAST(len(pieces) AS BIGINT) AS n_p FROM d${rounds + 1})"
}
