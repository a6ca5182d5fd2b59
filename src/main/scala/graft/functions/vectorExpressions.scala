package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over `ArrayType(Float|Double)` embedding
  * columns. Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — every element goes through an interpreted lambda —
  * which makes them the hot-path bottleneck of similarity search. These
  * expressions emit a tight primitive loop instead (measured ~3× on the
  * brute-force near-dup scan at sf0.1).
  *
  * Accumulation is strict left-to-right in double precision — bit-identical
  * to the `aggregate(zip_with(a,b,(x,y)=>x.cast(double)*y.cast(double)))`
  * formulation they replace, so DuckDB-oracle parity is preserved.
  */
private[graft] object VecCodegen {
  def elemAccessor(t: DataType): String = t match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"vector ops need array<float|double>, got $other")
  }
}

/** Σ aᵢ·bᵢ in double. Null if either side is null or lengths differ. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private lazy val leftAcc = VecCodegen.elemAccessor(left.dataType)
  private lazy val rightAcc = VecCodegen.elemAccessor(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var acc = 0.0
    var i = 0
    val fl = leftAcc == "getFloat"
    val fr = rightAcc == "getFloat"
    while (i < n) {
      val x = if (fl) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (fr) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n == $b.numElements()) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.$leftAcc($i) * (double) $b.$rightAcc($i);
         |  }
         |  ${ev.value} = $acc;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ in double (left-to-right Σx² then sqrt). */
case class ArrayNorm2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_norm2"

  private lazy val acc0 = VecCodegen.elemAccessor(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val aa = input.asInstanceOf[ArrayData]
    val n = aa.numElements()
    var acc = 0.0
    var i = 0
    val fl = acc0 == "getFloat"
    while (i < n) {
      val x = if (fl) aa.getFloat(i).toDouble else aa.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $c.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $c.$acc0($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNorm2 =
    copy(child = newChild)
}

/** Σ (aᵢ−bᵢ)² in double, strict left-to-right — the squared-L2 distance
  * kernel of product quantization (no sqrt: argmin and additivity over
  * subspaces both survive the square). Null if either side is null or
  * lengths differ. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_l2sq"

  private lazy val leftAcc = VecCodegen.elemAccessor(left.dataType)
  private lazy val rightAcc = VecCodegen.elemAccessor(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var acc = 0.0
    var i = 0
    val fl = leftAcc == "getFloat"
    val fr = rightAcc == "getFloat"
    while (i < n) {
      val x = if (fl) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (fr) bb.getFloat(i).toDouble else bb.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n == $b.numElements()) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.$leftAcc($i)
         |      - (double) $b.$rightAcc($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Σ ((xᵢ−cᵢ) − wᵢ)² in double, strict left-to-right — the residual-PQ
  * distance kernel: the vector's residual against its coarse centroid
  * `c`, measured against a residual codeword `w`, without ever
  * materializing the residual array (one fused loop instead of a
  * CodegenFallback `zip_with` allocation per row·sub·code combo). The
  * association (x − c) − w is fixed and mirrored verbatim by the
  * DuckDB oracle's ((x − c) − (y − b)) formulation, where w = y − b is
  * prebuilt in double — identical double ops in identical order, so
  * distances are bit-equal. Null if any input is null or lengths
  * differ. */
case class ArrayL2SqResid(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_l2sq_resid"

  private lazy val xAcc = VecCodegen.elemAccessor(first.dataType)
  private lazy val cAcc = VecCodegen.elemAccessor(second.dataType)
  private lazy val wAcc = VecCodegen.elemAccessor(third.dataType)

  override protected def nullSafeEval(x: Any, c: Any, w: Any): Any = {
    val xa = x.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val wa = w.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != ca.numElements() || n != wa.numElements()) return null
    var acc = 0.0
    var i = 0
    val fx = xAcc == "getFloat"
    val fc = cAcc == "getFloat"
    val fw = wAcc == "getFloat"
    while (i < n) {
      val xv = if (fx) xa.getFloat(i).toDouble else xa.getDouble(i)
      val cv = if (fc) ca.getFloat(i).toDouble else ca.getDouble(i)
      val wv = if (fw) wa.getFloat(i).toDouble else wa.getDouble(i)
      val d = (xv - cv) - wv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, c, w) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n == $c.numElements() && $n == $w.numElements()) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ((double) $x.$xAcc($i)
         |      - (double) $c.$cAcc($i)) - (double) $w.$wAcc($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ArrayL2SqResid =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Asymmetric-distance computation (ADC) gather-sum of product
  * quantization: Σ_s dtable[s·k + codes[s]], strict left-to-right in
  * double — the approximate distance between a query's per-subspace
  * distance table (m·k doubles) and a PQ-encoded vector (m small ints).
  * Null if either input is null or any index falls outside the table
  * (code ≥ k or table shorter than m·k). */
case class ArrayAdc(codes: Expression, dtable: Expression, k: Int)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = dtable
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_adc"

  override protected def nullSafeEval(c: Any, t: Any): Any = {
    val cc = c.asInstanceOf[ArrayData]
    val tt = t.asInstanceOf[ArrayData]
    val m = cc.numElements()
    val tn = tt.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val code = cc.getInt(s)
      val idx = s * k + code
      if (code < 0 || code >= k || idx >= tn) return null
      acc += tt.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val tn = ctx.freshName("tn")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |int $tn = $t.numElements();
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $s = 0; $s < $m && !$bad; $s++) {
         |  int $code = $c.getInt($s);
         |  int $idx = $s * $k + $code;
         |  if ($code < 0 || $code >= $k || $idx >= $tn) {
         |    $bad = true;
         |  } else {
         |    $acc += $t.getDouble($idx);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAdc =
    copy(codes = newLeft, dtable = newRight)
}

/** Static kernels shared by the interpreted and generated paths of the
  * quantization expressions. */
object VectorKernels {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** [[RandomProject]] kernel: ±1 sign from the low bit of
    * splitmix64(i·p + j, seed), accumulation in double, scaled by
    * 1/√outDim so squared norms are preserved in expectation. */
  def randomProject(arr: ArrayData, isFloat: Boolean, outDim: Int,
      seed: Long): ArrayData = {
    val n = arr.numElements()
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val h = SampleK.hash64(i.toLong * 0x100000001BL + j, seed)
        acc += (if ((h & 1L) == 0L) x else -x)
        i += 1
      }
      out(j) = (acc * scale).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[RandomProjectPortable]] kernel: the same Rademacher projection as
    * [[randomProject]], but signs come from the engine-portable md5-48
    * parity ([[PortableHash.hash48]] of "i,j") and accumulation runs in
    * FIXED index order — so the oracle (or any engine) can rebuild every
    * output bit-identically up to its own summation order, absorbed by
    * the final float rounding. ~n·outDim MD5 calls per row: audit mode,
    * not the throughput path. */
  def randomProjectPortable(arr: ArrayData, isFloat: Boolean, outDim: Int,
      seed: Long): ArrayData = {
    val n = arr.numElements()
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val h = PortableHash.hash48(i.toString + "," + j, seed)
        acc += (if ((h & 1L) == 0L) x else -x)
        i += 1
      }
      out(j) = (acc * scale).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric int8 quantization: scale = max|x|/127 (1 for the zero
    * vector), qᵢ = round(xᵢ/scale) ∈ [−127, 127]. One quarter the bytes of
    * fp32 — the storage/broadcast scale lever for 100 TB embedding
    * corpora. */
  def quantize8(arr: ArrayData, isFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0f else (maxAbs / 127.0).toFloat
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val r = math.round(x / scale)
      q(i) = math.max(-127L, math.min(127L, r)).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, q))
  }

  /** Inverse of [[quantize8]]: xᵢ ≈ qᵢ·scale as float. */
  def dequantize8(scale: Float, q: Array[Byte]): ArrayData = {
    val out = new Array[Any](q.length)
    var i = 0
    while (i < q.length) {
      out(i) = q(i) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Unit-L2 vector as float array (zero vector passes through). */
  def normalize(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      acc += x * x
      i += 1
    }
    val norm = math.sqrt(acc)
    val inv = if (norm == 0.0) 1.0 else 1.0 / norm
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = (x * inv).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** int8-quantize a float/double array → struct(scale: float, q: binary). */
case class ArrayQuantize8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayQuantize8.schema
  override def prettyName: String = "array_quantize8"

  private lazy val isFloat =
    VecCodegen.elemAccessor(child.dataType) == "getFloat"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.quantize8(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.quantize8($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): ArrayQuantize8 =
    copy(child = newChild)
}

object ArrayQuantize8 {
  val schema: StructType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false)))
}

/** Inverse of [[ArrayQuantize8]]: struct(scale, q) → array<float>. */
case class ArrayDequantize8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "array_dequantize8"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    VectorKernels.dequantize8(row.getFloat(0), row.getBinary(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.dequantize8($c.getFloat(0), $c.getBinary(1))")

  override protected def withNewChildInternal(newChild: Expression): ArrayDequantize8 =
    copy(child = newChild)
}

/** Seeded random projection (Achlioptas ±1 signs from a splitmix64 hash
  * of (i, j, seed)) as a codegen'd kernel: out_j = Σᵢ s(i,j)·vᵢ / √d_out.
  * Johnson–Lindenstrauss dimension reduction for embeddings — shrink
  * vectors BEFORE they broadcast/shuffle through the similarity tier; the
  * implicit projection matrix is recomputed from the hash, so nothing is
  * stored or shipped, and the result is identical on any cluster. */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {

  require(outDim >= 1, "outDim must be >= 1")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "random_project"

  private lazy val isFloat =
    VecCodegen.elemAccessor(child.dataType) == "getFloat"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.randomProject(input.asInstanceOf[ArrayData], isFloat,
      outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.randomProject($c, $isFloat, $outDim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

/** [[RandomProject]], engine-portable audit mode: md5-parity signs (see
  * [[VectorKernels.randomProjectPortable]]). Interpreted-eval path would
  * suffice for audit runs, but codegen keeps it composable with the rest
  * of the vector tier. */
case class RandomProjectPortable(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {

  require(outDim >= 1, "outDim must be >= 1")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "random_project_portable"

  private lazy val isFloat =
    VecCodegen.elemAccessor(child.dataType) == "getFloat"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.randomProjectPortable(input.asInstanceOf[ArrayData],
      isFloat, outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.randomProjectPortable($c, $isFloat, $outDim, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): RandomProjectPortable =
    copy(child = newChild)
}

/** Unit-L2 normalization as a codegen'd kernel (float output). */
case class ArrayNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "array_normalize"

  private lazy val isFloat =
    VecCodegen.elemAccessor(child.dataType) == "getFloat"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.normalize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.normalize($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): ArrayNormalize =
    copy(child = newChild)
}
