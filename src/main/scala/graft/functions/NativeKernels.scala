package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native Catalyst expressions (TextHashExprs):
  * single-pass, allocation-light loops the JIT compiles to tight machine
  * code. Each computes EXACTLY the same values as the higher-order-function
  * builders in TextHash / Similarity (and therefore the DuckDB oracle SQL
  * from OracleSql): same mod-P integer folds, same left-to-right IEEE
  * float accumulation — only the evaluation cost changes (one virtual call
  * per row instead of one interpreted lambda eval per array element;
  * measured ~10x on the text pipelines).
  *
  * Called from whole-stage-generated Java via the static forwarders this
  * object compiles to, so the expressions stay inside codegen spans.
  */
object NativeKernels {

  final val P: Long = TextHash.P

  /** Java-regex `\s` charset (the split pattern of TextHash.words). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** wordHashes: polynomial hash of every whitespace-separated token,
    * order-preserving — one pass over the string's code points. */
  def wordHashes(s: UTF8String): ArrayData = {
    val str = s.toString
    var n = 0
    var i = 0
    var inWord = false
    // pass 1: count words (avoids a growable buffer in the hot path)
    while (i < str.length) {
      val c = str.charAt(i)
      if (isWs(c)) { if (inWord) { n += 1; inWord = false } }
      else inWord = true
      i += 1
    }
    if (inWord) n += 1
    val out = new Array[Long](n)
    var k = 0
    var a = 7L
    i = 0
    inWord = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (w == 1 && isWs(str.charAt(i))) {
        if (inWord) { out(k) = a; k += 1; a = 7L; inWord = false }
      } else {
        a = (a * 31L + cp) % P
        inWord = true
      }
      i += w
    }
    if (inWord) { out(k) = a }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** shingleHashes: n-gram polynomial fold over a word-hash array; empty
    * result for docs shorter than n words. */
  def shingleHashes(wh: ArrayData, n: Int): ArrayData = {
    val len = wh.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) {
      var a = 7L
      var k = 0
      while (k < n) { a = (a * 31L + wh.getLong(i + k)) % P; k += 1 }
      out(i) = a
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All m MinHash signature values in one pass; null for empty docs.
    * Distinctness of the shingle set is irrelevant to a minimum, so no
    * dedup pass is needed to match the array_distinct-based oracle. */
  def minhashSignature(sh: ArrayData, m: Int): ArrayData = {
    val len = sh.numElements()
    if (len == 0) return null
    val mins = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < len) {
      val s = sh.getLong(i)
      var j = 0
      while (j < m) {
        val h = (s * TextHash.permuteA(j) + TextHash.permuteB(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** SimHash: per-bit ±1 majority vote across all token hashes. */
  def simhash(wh: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val len = wh.numElements()
    var i = 0
    while (i < len) {
      val h = wh.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Order-sensitive whole-document hash (seed 7, step *31 mod P). */
  def docHash(wh: ArrayData): Long = {
    var a = 7L
    val len = wh.numElements()
    var i = 0
    while (i < len) { a = (a * 31L + wh.getLong(i)) % P; i += 1 }
    a
  }

  /** Winnowing fingerprint selection (value-set variant): the distinct
    * sliding-window minima of the shingle sequence, in first-occurrence
    * order (matching array_distinct over the per-window minima). O(len)
    * via a monotonic deque — the HOF twin pays O(len × w) interpreted.
    * Fewer than w shingles → the global minimum; none → empty. */
  def winnowFingerprints(sh: ArrayData, w: Int): ArrayData = {
    val len = sh.numElements()
    if (len == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    if (len < w) {
      var m = Long.MaxValue
      var i = 0
      while (i < len) { val v = sh.getLong(i); if (v < m) m = v; i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(m))
    }
    // monotonic deque of candidate indices (values increasing front→back)
    val deque = new Array[Int](len)
    var head = 0
    var tail = 0 // exclusive
    val minima = new Array[Long](len - w + 1)
    var i = 0
    while (i < len) {
      val v = sh.getLong(i)
      while (tail > head && sh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) minima(i - w + 1) = sh.getLong(deque(head))
      i += 1
    }
    // dedupe, first occurrence wins (== array_distinct semantics)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](minima.length)
    var k = 0
    var j = 0
    while (j < minima.length) {
      if (seen.add(minima(j))) { out(k) = minima(j); k += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Dot product with strict left-to-right accumulation — the same IEEE
    * result as aggregate(zip_with(...)) and the oracle's list_reduce.
    * Ragged inputs fail loud (unchecked indexing into UnsafeArrayData
    * would read out of bounds and return garbage silently). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val len = a.numElements()
    if (b.numElements() != len)
      throw new IllegalArgumentException(
        s"graft_dot: vector lengths differ (${len} vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < len) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Pack an array of integer-valued doubles in [-127, 127] (the output
    * of Similarity's scalar quantization) into true int8 bytes — 8× less
    * storage and scan bandwidth than the double array. Non-integral or
    * out-of-range components fail loud: silent truncation here would
    * corrupt every downstream distance. */
  def packI8(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val d = v.getDouble(i)
      val l = d.toLong
      if (l.toDouble != d || l < -127L || l > 127L)
        throw new IllegalArgumentException(
          s"graft_pack_i8: component $i is $d — must be an integer in [-127, 127]")
      out(i) = l.toByte
      i += 1
    }
    out
  }

  /** Exact integer dot product over packed int8 codes. |acc| is bounded
    * by len · 127² ≪ 2^63 — no overflow for any realistic dimension. */
  def dotI8(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"graft_dot_i8: code lengths differ (${a.length} vs ${b.length})")
    var acc = 0L
    var i = 0
    while (i < a.length) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  /** Hyperplane-LSH bucket: bit i = sign of the projection onto the
    * deterministic ±1 plane i (Similarity.planeSign's exact formula,
    * left-to-right accumulation). The sign-hash stride is `dim` so planes
    * stay independent for every dimension (a fixed stride would make
    * plane i+1 a shifted copy of plane i whenever dim ≥ stride). */
  def hyperplaneBucket(v: ArrayData, dim: Int, planes: Int): Long = {
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"graft_hyperplane_bucket: vector has ${v.numElements()} elements, needs $dim")
    var bucket = 0L
    var i = 0
    while (i < planes) {
      var proj = 0.0
      var j = 0
      while (j < dim) {
        val h = ((j + dim.toLong * i) * 1103515245L) % P
        val sign = if (((h + 12345L) % P) % 2L == 0L) 1.0 else -1.0
        proj += v.getDouble(j) * sign
        j += 1
      }
      if (proj > 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Jaro-Winkler similarity in [0, 1] — the record-linkage staple for
    * short identifier strings (names, titles): tolerant of character
    * transpositions and rewards a shared prefix. Classic definition:
    * greedy in-order match within a window of max(|a|,|b|)/2 − 1,
    * transpositions = half the matched-sequence mismatches, Winkler
    * prefix boost `l·0.1·(1−jaro)` with l ≤ 4.
    *
    * Deterministic contract: matching/transposition counts are exact
    * integers from a fixed greedy order (smallest unused window position
    * wins), and the final score is a FIXED sequence of IEEE operations —
    * `(m/|a| + m/|b| + (m − t/2)/m)/3` then the prefix boost — which the
    * DuckDB oracle replays operation-for-operation
    * (`OracleSql.jaroWinkler`), so scores hash-gate bit-exactly.
    * Code-point semantics (astral planes included), like [[wordHashes]]. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = codePoints(ua.toString)
    val b = codePoints(ub.toString)
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = new Array[Boolean](l2)
    val cap = math.min(l1, l2)
    val mi = new Array[Int](cap)
    val mj = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - w)
      val hi = math.min(l2 - 1, i + w)
      var j = lo
      var found = -1
      while (j <= hi && found < 0) {
        if (!used(j) && b(j) == a(i)) found = j
        j += 1
      }
      if (found >= 0) { used(found) = true; mi(m) = a(i); mj(m) = found; m += 1 }
      i += 1
    }
    if (m == 0) return 0.0
    val mjSorted = java.util.Arrays.copyOf(mj, m)
    java.util.Arrays.sort(mjSorted)
    var t2 = 0
    var k = 0
    while (k < m) { if (mi(k) != b(mjSorted(k))) t2 += 1; k += 1 }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t2 / 2.0) / md) / 3.0
    var l = 0
    val lmax = math.min(4, cap)
    while (l < lmax && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** TRUE Damerau-Levenshtein distance (unrestricted adjacent
    * transpositions — "ca"→"abc" is 2, where the optimal-string-
    * alignment variant says 3): the classic alphabet-table DP
    * (Lowrance-Wagner). Spark ships only plain Levenshtein; DL is the
    * record-linkage metric that prices the single most common human
    * typo — a transposition — as one edit instead of two. Exact
    * integers, code-point semantics (astral planes included), O(|a|·|b|)
    * time and space over the candidate-pair verify set — never run
    * all-pairs; feed it blocked candidates. The DuckDB oracle is the
    * INDEPENDENT implementation `damerau_levenshtein()` (core, same
    * unrestricted variant — verified on the discriminator pairs). */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val a = codePoints(ua.toString)
    val b = codePoints(ub.toString)
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    // d is (la+2) x (lb+2) with a sentinel row/col of `inf`
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Int, Int]() // last row of each symbol in a
    i = 1
    while (i <= la) {
      var db = 0 // last column in THIS row where a(i-1) matched b
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b(j - 1), 0) // last row where b[j] occurs in a
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }

  /** Dynamic-time-warping alignment cost between two integer series:
    * local cost |a_i − b_j|, full DP (no band), exact Long arithmetic,
    * two rolling rows → O(n·m) time, O(m) space. DTW is the
    * time-series twin of edit distance — it prices the best monotonic
    * alignment, so phase-shifted or locally stretched series score
    * close while genuinely different shapes score far. Feed it
    * BOUNDED series (per-key daily/hourly aggregates — O(days), never
    * raw events); the n·m ≤ 2²⁴ guard makes an unbounded series a loud
    * error, not a silent executor stall. Empty series → -1 (callers
    * null it out). */
  def dtw(ad: ArrayData, bd: ArrayData): Long = {
    val n = ad.numElements()
    val m = bd.numElements()
    if (n == 0 || m == 0) return -1L
    require(n.toLong * m <= (1L << 24),
      s"graft_dtw: $n x $m DP exceeds the 2^24 cell bound — " +
        "aggregate the series first")
    val a = new Array[Long](n)
    val b = new Array[Long](m)
    var i = 0
    while (i < n) { a(i) = ad.getLong(i); i += 1 }
    var j = 0
    while (j < m) { b(j) = bd.getLong(j); j += 1 }
    var prev = new Array[Long](m)
    var cur = new Array[Long](m)
    prev(0) = math.abs(a(0) - b(0))
    j = 1
    while (j < m) { prev(j) = prev(j - 1) + math.abs(a(0) - b(j)); j += 1 }
    i = 1
    while (i < n) {
      cur(0) = prev(0) + math.abs(a(i) - b(0))
      j = 1
      while (j < m) {
        var best = prev(j)
        if (cur(j - 1) < best) best = cur(j - 1)
        if (prev(j - 1) < best) best = prev(j - 1)
        cur(j) = best + math.abs(a(i) - b(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  /** Longest-common-subsequence LENGTH between two Long sequences —
    * the kernel under ROUGE-L (Lin 2004): token sequences share score
    * 2·LCS/(n+m), the order-sensitive overlap metric exact n-gram
    * counts miss. Standard DP with two rolling rows — O(n·m) time,
    * O(m) space, exact Long arithmetic; the n·m ≤ 2²⁴ guard makes an
    * unbounded pair a loud error (truncate token sequences first).
    * Empty side → 0. */
  def lcsLength(ad: ArrayData, bd: ArrayData): Long = {
    val n = ad.numElements()
    val m = bd.numElements()
    if (n == 0 || m == 0) return 0L
    require(n.toLong * m <= (1L << 24),
      s"graft_lcs: $n x $m DP exceeds the 2^24 cell bound — " +
        "truncate the sequences first")
    val a = new Array[Long](n)
    val b = new Array[Long](m)
    var i = 0
    while (i < n) { a(i) = ad.getLong(i); i += 1 }
    var j = 0
    while (j < m) { b(j) = bd.getLong(j); j += 1 }
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    i = 1
    while (i <= n) {
      j = 1
      while (j <= m) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1L
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0L)
      i += 1
    }
    prev(m)
  }

  /** Exact integer squared Euclidean distance Σ(a_i−b_i)² between two
    * quantized Long vectors — the hot inner loop of the bucketed
    * vector operators (triplet mining, hubness, quantized kNN). A
    * zip_with/aggregate HOF computes the same value but re-enters the
    * interpreter per element; this is one fused loop inside codegen.
    * Mismatched lengths are a contract violation (quantized vectors
    * come from one corpus schema) and fail loud. */
  def sqDist(ad: ArrayData, bd: ArrayData): Long = {
    val n = ad.numElements()
    require(bd.numElements() == n,
      s"graft_sqdist: length mismatch $n vs ${bd.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = ad.getLong(i) - bd.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Levenshtein EDIT DISTANCE between two Long sequences — the
    * token-level mutation metric ROUGE-L's LCS cannot give (LCS ignores
    * substitutions; edit distance prices insert/delete/substitute at 1
    * each), used for typo-class near-dup verification and
    * reference-vs-candidate drift. Standard Wagner–Fischer DP with two
    * rolling rows — O(n·m) time, O(m) space, exact Long arithmetic,
    * the same n·m ≤ 2²⁴ loud-error bound as [[lcsLength]] (truncate
    * token sequences first). Empty side → the other side's length. */
  def editDistance(ad: ArrayData, bd: ArrayData): Long = {
    val n = ad.numElements()
    val m = bd.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    require(n.toLong * m <= (1L << 24),
      s"graft_editdist: $n x $m DP exceeds the 2^24 cell bound — " +
        "truncate the sequences first")
    val a = new Array[Long](n)
    val b = new Array[Long](m)
    var i = 0
    while (i < n) { a(i) = ad.getLong(i); i += 1 }
    var j = 0
    while (j < m) { b(j) = bd.getLong(j); j += 1 }
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    j = 0
    while (j <= m) { prev(j) = j.toLong; j += 1 }
    i = 1
    while (i <= n) {
      cur(0) = i.toLong
      j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
        var best = prev(j) + 1L // delete
        if (cur(j - 1) + 1L < best) best = cur(j - 1) + 1L // insert
        if (sub < best) best = sub
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Hilbert-curve index of a 2-D point on the 2^bits × 2^bits grid —
    * the xy→d direction of the public iterative algorithm (per-level
    * quadrant digit + Gray-style rotation). Unlike Morton interleave,
    * consecutive d values are always GRID NEIGHBORS (unit step in one
    * coordinate), so range-partitioning on d gives files whose (x, y)
    * footprint has the best known worst-case locality of any
    * space-filling curve — strictly better min-max pruning than
    * Z-order on range predicates. Data-dependent per-level rotation
    * makes this a loop, not an unrollable bit expression (an
    * expression-tree unroll doubles per level — exponential), hence a
    * native kernel behind a codegen'd expression. */
  def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // Canonical public xy→d walk; the rotation complements against the
    // FULL grid (n−1−x), so intermediates stay in [0, n) — the DuckDB
    // replay depends on that (its // and % truncate on negatives).
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (d→xy) of [[hilbertD]] — used by the spec to prove the
    * two directions are mutually inverse and by consumers that need
    * the cell back from a curve position. */
  def hilbertXY(d0: Long, bits: Int): (Long, Long) = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    var x = 0L
    var y = 0L
    var d = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (d / 2)
      val ry = 1L & (d ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s *= 2
    }
    (x, y)
  }

  /** US-Census Soundex code with the DOCUMENTED automaton both engines
    * replay (variants differ on H/W; this one is pinned and mirrored
    * character-for-character by the DuckDB oracle):
    *  - letters only, case-insensitive; empty input → empty code;
    *  - first letter kept verbatim (uppercased);
    *  - classes b f p v→1, c g j k q s x z→2, d t→3, l→4, m n→5, r→6;
    *  - a e i o u y reset the previous-code state (separators);
    *  - h w are INVISIBLE (same-class consonants across h/w collapse);
    *  - a digit equal to the previous emitted/first-letter code is
    *    skipped; output is letter + first 3 digits, zero-padded. */
  def soundex(u: UTF8String): UTF8String = {
    val s = u.toString
    def cls(c: Char): Int = c match {
      case 'b' | 'f' | 'p' | 'v' => 1
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => 2
      case 'd' | 't' => 3
      case 'l' => 4
      case 'm' | 'n' => 5
      case 'r' => 6
      case 'h' | 'w' => -1 //                                invisible
      case _ => 0 //                               vowel-ish separator
    }
    val letters = s.toLowerCase.filter(c => c >= 'a' && c <= 'z')
    if (letters.isEmpty) return UTF8String.fromString("")
    val head = letters.head
    val sb = new StringBuilder
    sb.append(Character.toUpperCase(head))
    var last = cls(head)
    var i = 1
    while (i < letters.length && sb.length < 4) {
      val c = cls(letters(i))
      if (c > 0) {
        if (c != last) sb.append(('0' + c).toChar)
        last = c
      } else if (c == 0) last = 0 //     vowel: breaks the run; h/w: no-op
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    UTF8String.fromString(sb.toString)
  }

  /** G.711 μ-law byte → linear PCM (14-bit magnitude range, the public
    * closed form): complement, split sign/exponent/mantissa,
    * magnitude = ((2·mantissa + 33) << exponent) − 33. Exact integers
    * end-to-end, so the oracle replays it per byte. */
  def mulawToPcm(b: Int): Int = {
    val u = (~b) & 0xff
    val sign = u & 0x80
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag = (((mantissa << 1) + 33) << exponent) - 33
    if (sign != 0) -mag else mag
  }

  /** G.711 A-law byte → linear PCM (13-bit magnitude range, the public
    * ITU closed form): XOR 0x55, split sign/segment/mantissa,
    * magnitude = (mantissa·16 + 8) for segment 0,
    * (mantissa·16 + 264) << (segment − 1) otherwise; the POST-XOR sign
    * bit SET means positive (A-law's even-bit inversion flips it, the
    * classic trap vs μ-law). Exact integers end-to-end, so the oracle
    * replays it per byte. |pcm| ≤ 32256. */
  def alawToPcm(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a >> 4) & 0x07
    val mantissa = a & 0x0f
    val mag =
      if (seg == 0) (mantissa << 4) + 8
      else (((mantissa << 4) + 0x108) << (seg - 1))
    if ((a & 0x80) != 0) mag else -mag
  }

  /** IMA/DVI ADPCM step-size table (89 entries, the public spec
    * constants) — shared by the decoder and its spec. */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** IMA ADPCM per-nibble index adjustment (the public spec table). */
  val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Canonical gcd-reduction of an exact integer rational carried as a
    * DECIMAL(38,0) pair: returns num/g (emitNum) or den/g, g =
    * gcd(num, den) (1 when both are zero), as BIGINT. This is the
    * decimal-free OUTPUT lane for statistics whose intermediates need
    * the 38-digit width (Gwet's AC1 n³ products overflow BIGINT past
    * n ≈ 10⁶): the wide lane stays internal, the emitted rational is
    * the reduced canonical form. DuckDB replays it as
    * `num // greatest(gcd(num, den), 1)` over HUGEINT — BigInteger
    * truncating division equals floor division here because the
    * division is exact by construction. `longValueExact` fails LOUD if
    * a reduced quotient ever outgrows BIGINT (for AC1 both num and den
    * share the factor n, so quotients are O(n²·k): safe past n = 10⁹;
    * a corpus beyond that must emit the string lane instead). */
  def ratReduce(num: Decimal, den: Decimal, emitNum: Boolean): Long = {
    val n = num.toJavaBigDecimal.toBigIntegerExact
    val d = den.toJavaBigDecimal.toBigIntegerExact
    val g0 = n.gcd(d)
    val g = if (g0.signum == 0) java.math.BigInteger.ONE else g0
    (if (emitNum) n else d).divide(g).longValueExact()
  }

  /** One IMA ADPCM decode step on state (predictor, index): returns the
    * new clamped predictor; the caller advances the index via
    * [[AdpcmIndexTable]]. Pure shift-add arithmetic (the spec's
    * vpdiff = step>>3 + bit-selected step, step>>1, step>>2), exact
    * integers — the oracle replays it as a recursive state walk. */
  def adpcmStep(predictor: Int, index: Int, nibble: Int): Int = {
    val step = AdpcmStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    math.max(-32768, math.min(32767, p))
  }
}
