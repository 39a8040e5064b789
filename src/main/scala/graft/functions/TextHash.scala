package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs._

/** Deterministic integer text-hash primitives used by the near-duplicate
  * and fingerprinting operators (MinHash/LSH, SimHash, winnowing).
  *
  * All arithmetic is mod P = 1e9+7 in 64-bit integers, chosen so every
  * intermediate fits in an i64 (max (P-1)*31 + c ≈ 3.1e10; max
  * (P-1)*(P-1) ≈ 1.0e18 < 2^63) and so the EXACT same computation is
  * expressible in ANSI-ish SQL (the driver's DuckDB oracle re-derives
  * every value with list lambdas — integer arithmetic has no
  * platform/order sensitivity, unlike float folds).
  *
  * The default builders wrap native codegen Catalyst expressions
  * (TextHashExprs → NativeKernels): one JIT-compiled call per row inside
  * the WholeStageCodegen span. The `*Hof` variants are the same algorithms
  * over Spark's higher-order array functions — interpreted, an order of
  * magnitude slower — kept as executable documentation and as an
  * independent implementation the specs cross-check the native kernels
  * against (NativeExprSpec). At 100 TB the hashing stage is embarrassingly
  * parallel map work either way; native keeps it CPU-cheap too.
  * (The reference has no text operators; these extend the engine for
  * training-data pipelines per BASELINE.json's north star.)
  */
object TextHash {

  /** Modulus: largest common 31-bit prime; see overflow analysis above. */
  val P = 1000000007L

  // ---- native builders (default) ----------------------------------------

  /** Hash every whitespace-separated token of `text`: Array[Long],
    * order-preserving, with multiplicity (SimHash weights by term freq). */
  def wordHashes(text: Column): Column =
    GraftSql.column(WordHashesExpr(GraftSql.expression(text)))

  /** Word-n-gram shingle hashes from a word-hash array; docs shorter than
    * n words yield an empty array. */
  def shingleHashes(wh: Column, n: Int): Column =
    GraftSql.column(ShingleHashesExpr(GraftSql.expression(wh), n))

  /** All `m` MinHash signature values over a shingle array in one pass;
    * NULL for empty docs. Index with element_at(sig, j+1). */
  def minhashSignature(shingles: Column, m: Int): Column =
    GraftSql.column(MinHashSignatureExpr(GraftSql.expression(shingles), m))

  /** SimHash fingerprint of `bits` bits from a word-hash array: bit j set
    * iff the (+1/-1) majority vote of that bit across tokens is positive. */
  def simhash(wh: Column, bits: Int): Column =
    GraftSql.column(SimHashExpr(GraftSql.expression(wh), bits))

  /** Order-sensitive whole-document hash: fold f = (f*31 + wordHash) % P,
    * seed 7 — two docs with the same words in different order differ. */
  def docHash(wh: Column): Column =
    GraftSql.column(DocHashExpr(GraftSql.expression(wh)))

  /** Jaro-Winkler similarity in [0, 1] (record linkage; see
    * NativeKernels.jaroWinkler for the deterministic contract). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSql.column(JaroWinklerExpr(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** True Damerau-Levenshtein distance (unrestricted adjacent
    * transpositions; see NativeKernels.damerauLevenshtein). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftSql.column(DamerauLevenshteinExpr(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** DTW alignment cost of two Long series (see NativeKernels.dtw). */
  def dtw(a: Column, b: Column): Column =
    GraftSql.column(DtwExpr(GraftSql.expression(a), GraftSql.expression(b)))

  /** LCS length of two Long sequences (see NativeKernels.lcsLength). */
  def lcs(a: Column, b: Column): Column =
    GraftSql.column(LcsExpr(GraftSql.expression(a), GraftSql.expression(b)))

  /** Exact integer squared distance of two quantized Long vectors
    * (see NativeKernels.sqDist). */
  def sqDist(a: Column, b: Column): Column =
    GraftSql.column(SqDistExpr(GraftSql.expression(a), GraftSql.expression(b)))

  /** Canonical gcd-reduced numerator of a DECIMAL(38,0) rational,
    * emitted BIGINT (see NativeKernels.ratReduce). */
  def ratNum(num: Column, den: Column): Column =
    GraftSql.column(RatReduceExpr(
      GraftSql.expression(num), GraftSql.expression(den), emitNum = true))

  /** Canonical gcd-reduced denominator twin of [[ratNum]]. */
  def ratDen(num: Column, den: Column): Column =
    GraftSql.column(RatReduceExpr(
      GraftSql.expression(num), GraftSql.expression(den), emitNum = false))

  /** Levenshtein edit distance of two Long TOKEN sequences — the
    * token-granularity sibling of [[lcs]] (ROUGE-L) and the
    * sequence-level counterpart of the char-level
    * [[damerauLevenshtein]]; see NativeKernels.editDistance. */
  def editDistance(a: Column, b: Column): Column =
    GraftSql.column(EditDistExpr(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Hilbert-curve index of bounded (x, y) cells — the locality-optimal
    * clustering key beside [[graft.ops.Layout.mortonKey]]. */
  def hilbertD(a: Column, b: Column, bits: Int): Column =
    GraftSql.column(HilbertDExpr(
      GraftSql.expression(a), GraftSql.expression(b), bits))

  /** Pinned-variant Soundex phonetic code (entity-resolution blocking;
    * see NativeKernels.soundex). */
  def soundexCode(a: Column): Column =
    GraftSql.column(SoundexCodeExpr(GraftSql.expression(a)))

  /** Winnowing fingerprints: distinct sliding-window minima (window `w`)
    * of a shingle-hash array, first-occurrence order; O(len) native. */
  def winnow(sh: Column, w: Int): Column =
    GraftSql.column(WinnowExpr(GraftSql.expression(sh), w))

  // ---- MinHash permutation family (shared by both impls + the oracle) ----

  /** j-th universal hash h_j(x) = (A_j*x + B_j) % P with fixed
    * pseudo-random odd multipliers — the MinHash permutation family. */
  /** LSH band keys from MinHash signature slots: one struct(band, key)
    * per band, key = polynomial fold (seed 7, ×31, mod P) of the band's
    * `r` signature values. THE single source of the banding constants —
    * batch (`NearDup.lshCandidatePairs`) and streaming
    * (`StreamSimilarity.lshSelfJoinPairs`) both call this, and the
    * DuckDB mirror (`OracleSql.lshBanded`) derives from the same fold,
    * so candidates cannot drift between the three. */
  def bandKeys(sigSlots: Seq[Column], r: Int): Column = {
    require(sigSlots.nonEmpty && sigSlots.size % r == 0,
      s"signature size ${sigSlots.size} must divide into bands of $r")
    array((0 until sigSlots.size / r).map { b =>
      val key = (0 until r).foldLeft(lit(7L): Column)((acc, k) =>
        (acc * 31L + sigSlots(b * r + k)) % P)
      struct(lit(b).as("band"), key.as("key"))
    }: _*)
  }

  def permuteA(j: Int): Long = ((2L * j + 1L) * 1103515245L) % P
  def permuteB(j: Int): Long = (j * 12345L + 678910111L) % P
  def permute(j: Int, x: Column): Column = (x * permuteA(j) + permuteB(j)) % P

  // ---- higher-order-function variants (cross-check + documentation) ------

  /** Non-empty whitespace-separated tokens. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Polynomial rolling hash of one token: fold a = (a*31 + codepoint) % P
    * over its characters, seed 7. Code-point semantics match the native
    * kernel (NativeKernels folds codePointAt) on ALL of Unicode, astral
    * planes included: Java's regex split("") never splits a surrogate
    * pair and `ascii` returns the full code point — NativeExprSpec
    * asserts bit-equality on emoji/CJK-extension inputs. */
  def wordHash(w: Column): Column =
    aggregate(
      filter(split(w, ""), c => length(c) > 0),
      lit(7L),
      (a, c) => (a * 31L + ascii(c)) % P)

  def wordHashesHof(text: Column): Column = transform(words(text), wordHash(_))

  def shingleHashesHof(wh: Column, n: Int): Column =
    when(size(wh) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(0), size(wh) - n),
        i => (0 until n).foldLeft(lit(7L): Column)((acc, k) =>
          (acc * 31L + element_at(wh, i + k + 1)) % P)))

  /** MinHash signature value j over a shingle-hash array: min of the j-th
    * permutation over the DISTINCT shingle set; NULL for empty docs. */
  def minhash(shingles: Column, j: Int): Column =
    minhashDistinct(array_distinct(shingles), j)

  /** MinHash over an already-deduplicated shingle array. */
  def minhashDistinct(distinctShingles: Column, j: Int): Column =
    array_min(transform(distinctShingles, s => permute(j, s)))

  def simhashHof(wh: Column, bits: Int): Column =
    (0 until bits).map { j =>
      val vote = aggregate(wh, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def docHashHof(wh: Column): Column =
    aggregate(wh, lit(7L), (a, h) => (a * 31L + h) % P)

  /** HOF twin of [[winnow]] (O(len × w) interpreted — cross-check only). */
  def winnowHof(sh: Column, w: Int): Column =
    when(size(sh) === 0, array().cast("array<bigint>"))
      .when(size(sh) < w, array(array_min(sh)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(sh) - w),
        i => array_min(slice(sh, i + 1, lit(w))))))
}
