package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Near-duplicate detection for document corpora — the training-data
  * pipeline operators beyond the reference's exact latest-wins dedup
  * (SURVEY.md §2 O1). Three families, all shuffle-frugal by design:
  *
  *  - MinHash + LSH banding: per-doc signature is row-local map work; the
  *    only shuffle is the band-bucket self-join, whose volume is
  *    O(docs × bands), independent of pairwise candidates — the classic
  *    way to avoid the O(n²) blow-up at 100 TB.
  *  - SimHash: one 64-bit-ish fingerprint per doc, row-local; grouping by
  *    fingerprint (or banding its bits) finds near-identical docs with a
  *    single hash-aggregate shuffle.
  *  - n-gram Jaccard: the exact verifier, run only on bounded candidate
  *    sets (same-bucket or sampled pairs), never on the full cross join.
  */
object NearDup {

  /** MinHash signature columns `mh0..mh{m-1}` over word-`n`-gram shingles.
    * Row-local: no shuffle. Docs with fewer than `n` words get NULL
    * signatures (no shingles to hash). */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3): DataFrame = {
    val sh = TextHash.shingleHashes(TextHash.wordHashes(col(textCol)), n)
    docs.select(
      col(idCol) +:
        (0 until m).map(j => TextHash.minhash(sh, j).as(s"mh$j")): _*)
  }

  /** LSH banding over a MinHash signature: `bands` bands of `r` rows; two
    * docs are candidates iff some band agrees exactly. Emits distinct
    * candidate pairs (a < b). The self-join is on (band, key) — each side
    * is docs×bands rows, so shuffle volume scales linearly with the corpus
    * while recall follows 1-(1-J^r)^bands. */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2): DataFrame = {
    require(m % r == 0, s"signature size $m must divide into bands of $r")
    val sig = minhashSignatures(docs, idCol, textCol, m, n)
      .where(col("mh0").isNotNull)
    val bands = m / r
    // band key = polynomial fold of the band's signature values
    val banded = sig.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        val key = (0 until r).foldLeft(lit(7L): Column)((acc, k) =>
          (acc * 31L + col(s"mh${b * r + k}")) % TextHash.P)
        struct(lit(b).as("band"), key.as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** SimHash fingerprints: (id, simhash) with a `bits`-bit fingerprint. */
  def simhashFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    docs.select(
      col(idCol),
      TextHash.simhash(TextHash.wordHashes(col(textCol)), bits).as("simhash"))

  /** Exact word-bigram Jaccard similarity over candidate pairs. The
    * candidate set here is sampled (`idCol % sampleMod == 0`) and blocked
    * by `blockCol` equality — the pattern for the verify stage after LSH:
    * never the raw cross join. Emits (id_a, id_b, jaccard) for pairs with
    * jaccard >= minJaccard. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      sampleMod: Int = 5, minJaccard: Double = 0.01): DataFrame = {
    val grams = array_distinct(
      TextHash.shingleHashes(TextHash.wordHashes(col(textCol)), 2))
    val base = docs
      .where(col(idCol) % sampleMod === 0)
      .select(col(idCol), col(blockCol), grams.as("grams"))
      .where(size(col("grams")) > 0)
    val a = base.select(col(blockCol), col(idCol).as("id_a"), col("grams").as("g_a"))
    val b = base.select(col(blockCol), col(idCol).as("id_b"), col("grams").as("g_b"))
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
    val union = size(array_union(col("g_a"), col("g_b"))).cast("double")
    a.join(b, Seq(blockCol))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", inter / union)
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
