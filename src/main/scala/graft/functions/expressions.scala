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
