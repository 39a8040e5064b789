package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, ImplicitCastInputTypes, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hash/vector kernels —
  * preference (b) of the extension ladder (compose built-ins > custom
  * Expression > custom plan > mapPartitions): these are scalar/array
  * functions, so an Expression with `doGenCode` is the right altitude.
  * Each generates a single static call into NativeKernels, keeping the
  * operator inside the WholeStageCodegen span (the higher-order-function
  * equivalents in TextHash fall out of codegen and pay one interpreted
  * lambda eval per array element).
  *
  * Values are bit-identical to the HOF builders and the DuckDB oracle
  * (cross-checked in NativeExprSpec and by the driver's correctness gate).
  */
object TextHashExprs {

  case class WordHashesExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_word_hashes"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.wordHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.wordHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): WordHashesExpr =
      copy(child = newChild)
  }

  case class ShingleHashesExpr(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n > 0, "shingle size must be positive")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.shingleHashes(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.shingleHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
      copy(child = newChild)
  }

  /** All m signature values at once; NULL for shingle-less docs (matching
    * per-column array_min-of-empty semantics). */
  case class MinHashSignatureExpr(child: Expression, m: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(m > 0, "signature size must be positive")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_signature"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.minhashSignature(input.asInstanceOf[ArrayData], m)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.NativeKernels.minhashSignature($c, $m);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
      res
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
      copy(child = newChild)
  }

  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(bits > 0 && bits <= 63, "bits must be in [1, 63]")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.simhash(input.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.simhash($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
      copy(child = newChild)
  }

  case class DocHashExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_doc_hash"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.docHash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.docHash($c)")
    override protected def withNewChildInternal(newChild: Expression): DocHashExpr =
      copy(child = newChild)
  }

  /** Distinct sliding-window minima of a shingle array (winnowing),
    * first-occurrence order; O(len) monotonic-deque kernel. */
  case class WinnowExpr(child: Expression, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(w > 0, "winnow window must be positive")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.winnowFingerprints(input.asInstanceOf[ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeKernels.winnowFingerprints($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
      copy(child = newChild)
  }

  /** Σ a[i]*b[i], strict left-to-right (bit-identical to the HOF fold). */
  case class DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeKernels.dot($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Jaro-Winkler similarity of two strings (record linkage). */
  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.jaroWinkler(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinklerExpr =
      copy(left = newLeft, right = newRight)
  }

  /** True Damerau-Levenshtein distance (unrestricted transpositions). */
  case class DamerauLevenshteinExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_damerau_levenshtein"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.damerauLevenshtein(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.damerauLevenshtein($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DamerauLevenshteinExpr =
      copy(left = newLeft, right = newRight)
  }

  /** DTW alignment cost between two Long series; NULL for empty input. */
  case class DtwExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dtw"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val v = NativeKernels.dtw(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (v < 0L) null else v
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |${ev.value} = graft.functions.NativeKernels.dtw($a, $b);
           |${ev.isNull} = ${ev.value} < 0L;
         """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DtwExpr =
      copy(left = newLeft, right = newRight)
  }

  /** LCS length between two Long sequences (ROUGE-L kernel; see
    * NativeKernels.lcsLength). */
  case class LcsExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_lcs"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.lcsLength(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.lcsLength($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LcsExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Exact integer squared Euclidean distance of two quantized Long
    * vectors (see NativeKernels.sqDist). */
  case class SqDistExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sqdist"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.sqDist(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.sqDist($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SqDistExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Canonical gcd-reduction of a DECIMAL(38,0) exact rational to a
    * BIGINT numerator or denominator (see NativeKernels.ratReduce) —
    * the decimal-free output lane mandated for gate schemas: the
    * driver's hash canonicalization of DECIMAL output columns diverges
    * from the local oracle compare (round-11 `q_gwet_ac1` lesson), so
    * wide-decimal statistics keep the 38-digit lane INTERNAL and emit
    * the reduced rational.
    *
    * FAIL-LOUD input contract: a null operand here is never a
    * legitimate value — the only way the exact rational lane produces
    * one is a DECIMAL(38,0) product outgrowing 38 digits, which Spark's
    * non-ANSI decimal arithmetic turns into NULL instead of raising. A
    * nullSafeEval would propagate that into silently-null gate output,
    * so both eval paths throw ArithmeticException on null input
    * instead (r12 advice item). */
  case class RatReduceExpr(left: Expression, right: Expression,
      emitNum: Boolean)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(DecimalType(38, 0), DecimalType(38, 0))
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String =
      if (emitNum) "graft_rat_num" else "graft_rat_den"
    private def overflow(): Nothing =
      throw new ArithmeticException(
        s"$prettyName: null rational operand — the DECIMAL(38,0) exact " +
          "lane overflowed 38 digits (Spark non-ANSI decimal returns " +
          "NULL past that); the statistic cannot be emitted exactly")
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      if (a == null || b == null) overflow()
      NativeKernels.ratReduce(
        a.asInstanceOf[Decimal], b.asInstanceOf[Decimal], emitNum)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      val self = ctx.addReferenceObj("ratReduceExpr", this,
        classOf[RatReduceExpr].getName)
      ev.copy(
        code = code"""
          ${l.code}
          ${r.code}
          if (${l.isNull} || ${r.isNull}) { $self.overflowFromCodegen(); }
          long ${ev.value} = graft.functions.NativeKernels.ratReduce(
            ${l.value}, ${r.value}, $emitNum);""",
        isNull = FalseLiteral)
    }
    /** Public trampoline for generated code (overflow() is private). */
    def overflowFromCodegen(): Unit = overflow()
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): RatReduceExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Levenshtein edit distance between two Long sequences (token-level
    * mutation metric; see NativeKernels.editDistance). */
  case class EditDistExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_editdist"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.editDistance(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.editDistance($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): EditDistExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Hilbert-curve index of a 2-D cell on the 2^bits grid (layout
    * clustering; see NativeKernels.hilbertD for why this is a kernel). */
  case class HilbertDExpr(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert_d"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.NativeKernels.hilbertD($a, $b, $bits)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HilbertDExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Pinned-variant US-Census Soundex (see NativeKernels.soundex for
    * the automaton the DuckDB oracle mirrors). */
  case class SoundexCodeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_soundex"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.soundex(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.soundex($c)")
    override protected def withNewChildInternal(newChild: Expression): SoundexCodeExpr =
      copy(child = newChild)
  }

  /** Pack quantized integer-valued doubles into int8 bytes (BinaryType). */
  case class PackI8Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_pack_i8"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.packI8(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NativeKernels.packI8($c)")
    override protected def withNewChildInternal(newChild: Expression): PackI8Expr =
      copy(child = newChild)
  }

  /** Exact integer dot product over two packed int8 code columns. */
  case class DotI8Expr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_dot_i8"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeKernels.dotI8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeKernels.dotI8($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotI8Expr =
      copy(left = newLeft, right = newRight)
  }

  case class HyperplaneBucketExpr(child: Expression, dim: Int, planes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(planes > 0 && planes <= 62, "planes must be in [1, 62]")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane_bucket"
    override protected def nullSafeEval(input: Any): Any =
      NativeKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], dim, planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NativeKernels.hyperplaneBucket($c, $dim, $planes)")
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
      copy(child = newChild)
  }
}
