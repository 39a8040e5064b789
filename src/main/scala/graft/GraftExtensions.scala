package graft

import org.apache.spark.sql.{GraftSql, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TextHashExprs._

/** SQL surface for the engine's native expressions — wire with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (new
  * sessions) or `GraftExtensions.install(spark)` (a live session) and the
  * kernels become callable from `spark.sql`:
  *
  * {{{
  *   SELECT graft_simhash(graft_word_hashes(text), 16) FROM documents
  *   SELECT graft_dot(a.v, b.v) FROM ...
  * }}}
  *
  * Integer arguments must be foldable literals (they parameterize the
  * generated code). This is the `SparkSessionExtensions.injectFunction`
  * path — the standard extension seam, no session-internal APIs on the
  * conf route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def lit(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "",
      "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triples — the exact shape
    * `injectFunction` and the session FunctionRegistry share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_word_hashes"),
        info("graft_word_hashes", "_FUNC_(text) - polynomial hash per whitespace token"),
        (args: Seq[Expression]) => WordHashesExpr(args.head)),
      (FunctionIdentifier("graft_shingle_hashes"),
        info("graft_shingle_hashes", "_FUNC_(wordHashes, n) - word n-gram shingle hashes"),
        (args: Seq[Expression]) => ShingleHashesExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("graft_minhash_signature"),
        info("graft_minhash_signature", "_FUNC_(shingles, m) - m MinHash values"),
        (args: Seq[Expression]) => MinHashSignatureExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("graft_simhash"),
        info("graft_simhash", "_FUNC_(wordHashes, bits) - SimHash fingerprint"),
        (args: Seq[Expression]) => SimHashExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("graft_doc_hash"),
        info("graft_doc_hash", "_FUNC_(wordHashes) - order-sensitive document hash"),
        (args: Seq[Expression]) => DocHashExpr(args.head)),
      (FunctionIdentifier("graft_winnow"),
        info("graft_winnow", "_FUNC_(shingles, w) - distinct sliding-window minima (winnowing)"),
        (args: Seq[Expression]) => WinnowExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("graft_dot"),
        info("graft_dot", "_FUNC_(a, b) - strict left-to-right dot product"),
        (args: Seq[Expression]) => DotExpr(args(0), args(1))),
      (FunctionIdentifier("graft_jaro_winkler"),
        info("graft_jaro_winkler",
          "_FUNC_(a, b) - Jaro-Winkler similarity in [0, 1]"),
        (args: Seq[Expression]) => JaroWinklerExpr(args(0), args(1))),
      (FunctionIdentifier("graft_hyperplane_bucket"),
        info("graft_hyperplane_bucket", "_FUNC_(v, dim, planes) - LSH bucket id"),
        (args: Seq[Expression]) => HyperplaneBucketExpr(args(0), lit(args(1)), lit(args(2)))),
      (FunctionIdentifier("graft_pack_i8"),
        info("graft_pack_i8", "_FUNC_(v) - pack quantized [-127,127] doubles into int8 bytes"),
        (args: Seq[Expression]) => PackI8Expr(args.head)),
      (FunctionIdentifier("graft_dot_i8"),
        info("graft_dot_i8", "_FUNC_(a, b) - exact integer dot over int8 codes"),
        (args: Seq[Expression]) => DotI8Expr(args(0), args(1))),
      (FunctionIdentifier("graft_damerau_levenshtein"),
        info("graft_damerau_levenshtein",
          "_FUNC_(a, b) - true Damerau-Levenshtein distance (unrestricted transpositions)"),
        (args: Seq[Expression]) => DamerauLevenshteinExpr(args(0), args(1))),
      (FunctionIdentifier("graft_dtw"),
        info("graft_dtw",
          "_FUNC_(a, b) - dynamic-time-warping alignment cost of two Long series"),
        (args: Seq[Expression]) => DtwExpr(args(0), args(1))),
      (FunctionIdentifier("graft_hilbert_d"),
        info("graft_hilbert_d",
          "_FUNC_(x, y, bits) - Hilbert-curve index on the 2^bits grid"),
        (args: Seq[Expression]) => HilbertDExpr(args(0), args(1), lit(args(2)))),
      (FunctionIdentifier("graft_soundex"),
        info("graft_soundex",
          "_FUNC_(s) - pinned-variant US-Census Soundex phonetic code"),
        (args: Seq[Expression]) => SoundexCodeExpr(args.head)))

  /** Register into an already-running session (e.g. a REPL). */
  def install(spark: SparkSession): Unit =
    GraftSql.registerFunctions(spark, functions)
}
