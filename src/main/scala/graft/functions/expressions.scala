package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** F1 `ascii_fold` as a native Catalyst expression (SURVEY.md §2.9): NFKD →
  * ASCII fold, with real `doGenCode` so it stays inside whole-stage codegen
  * (a Scala UDF would force serialization in/out of the codegen'd row
  * format). Kernel in [[TextKernels.asciiFold]] with an allocation-free
  * pure-ASCII fast path. */
case class AsciiFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_fold"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.asciiFold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.asciiFold($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiFold =
    copy(child = newChild)
}

/** Whitespace-token n-gram shingles as a codegen'd expression — the
  * workhorse of MinHash/Jaccard dedup. The equivalent built-in composition
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n)))`)
  * is CodegenFallback and ~10× slower (interpreted lambda + array copy per
  * window). */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** 64-bit rolling-hash document fingerprint as a codegen'd expression. */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.fingerprint64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.fingerprint64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** One-pass SimHash-64 fingerprint as a codegen'd expression
  * ([[TextKernels.simHash64]]) — the narrow-map replacement for the
  * explode + 64-column aggregation formulation of the same hash. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** One-pass PORTABLE MinHash signature
  * ([[TextKernels.minhashSignaturePortable]]): md5-48 shingle hashes +
  * Carter–Wegman minima, rebuildable in any engine, with the same narrow
  * shape as [[MinHashSignature]]. */
case class MinHashSignaturePortable(child: Expression, shingleSize: Int,
    numHashes: Int, seed: Long) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_portable"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignaturePortable(input.asInstanceOf[UTF8String],
      shingleSize, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minhashSignaturePortable($c, " +
        s"$shingleSize, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignaturePortable =
    copy(child = newChild)
}

/** One-pass PORTABLE SimHash-48 ([[TextKernels.simHash48Portable]]):
  * md5-48 token hashes so the fingerprint is rebuildable in any engine,
  * with the same narrow-map shape as [[SimHash64]]. */
case class SimHash48Portable(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48_portable"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simHash48Portable(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.simHash48Portable($c, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash48Portable =
    copy(child = newChild)
}

/** One-pass MinHash signature as a codegen'd expression
  * ([[TextKernels.minhashSignature]]): `array<long>` of `numHashes`
  * seeded minimums over the text's `shingleSize`-token shingles; empty
  * array when the text is too short. Bit-identical to the explode +
  * k-column min-aggregation formulation, as a narrow map. */
case class MinHashSignature(child: Expression, shingleSize: Int,
    numHashes: Int) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(input.asInstanceOf[UTF8String],
      shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minhashSignature($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** One-pass text statistics as a codegen'd struct expression — fuses the
  * ~6 regex scans the token/punct/stopword/BPE column compositions used
  * into a single character loop ([[TextKernels.textProfile]]). Downstream
  * functions project fields off this struct; whole-stage codegen's
  * subexpression elimination evaluates the profile once per row however
  * many fields a projection reads. */
case class TextProfile(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "text_profile"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.textProfile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.textProfile($c)")

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false)))
}

/** Bit-interleave kernel for Z-order clustering. */
object BitKernels {
  /** Morton code of the low 32 bits of `a` and `b` (`a` on even bit
    * positions): sorting by this value walks the Z-curve, giving 2-D
    * locality — nearby (a, b) pairs land in the same file. */
  def morton2(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}

/** Codegen'd 2-column Morton (Z-order) code — the clustering key behind
  * [[graft.operators.CorpusExport.writeZOrdered]]: one interleaved sort
  * key gives file-level min/max pruning on BOTH columns, where a plain
  * sort prunes only its leading column. */
case class Morton2(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  // Number.longValue rather than a Long cast: integral literals arrive as
  // Integer on the interpreted path (no ExpectsInputTypes coercion here —
  // it is private[sql]); generated code widens implicitly.
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.morton2(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitKernels.morton2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton2 =
    copy(left = newLeft, right = newRight)
}
