package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Vector math over `ArrayType` embedding columns. The dot/norm kernels are
  * custom codegen'd Catalyst expressions ([[ArrayDot]]/[[ArrayNorm2]]) — a
  * tight primitive loop per row. The previously-used higher-order-function
  * composition (`aggregate(zip_with(...))`) is CodegenFallback and paid an
  * interpreted lambda per element; numerics are identical (strict
  * left-to-right double accumulation), so oracle parity is unchanged.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ (double). Null on length mismatch. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(ArrayDot(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** ‖a‖₂ (double). */
  def l2_norm(a: Column): Column =
    ColumnShim.column(ArrayNorm2(ColumnShim.expression(a)))

  /** Σ (aᵢ−bᵢ)² (double) — squared L2 distance. Null on length mismatch. */
  def l2sq(a: Column, b: Column): Column =
    ColumnShim.column(ArrayL2Sq(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Σ ((xᵢ−cᵢ) − wᵢ)² (double) — residual-PQ distance of `x`'s
    * residual against centroid `c`, measured against residual codeword
    * `w`, in one fused codegen loop (no residual array materialized).
    * Null on any length mismatch. */
  def l2sqResid(x: Column, c: Column, w: Column): Column =
    ColumnShim.column(ArrayL2SqResid(ColumnShim.expression(x),
      ColumnShim.expression(c), ColumnShim.expression(w)))

  /** PQ asymmetric distance: Σ_s dtable[s·k + codes[s]] (double). */
  def adc(codes: Column, dtable: Column, k: Int): Column =
    ColumnShim.column(ArrayAdc(
      ColumnShim.expression(codes), ColumnShim.expression(dtable), k))

  /** Cosine similarity ∈ [-1,1]; null-safe zero-vector guard → null. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2_norm(a) * l2_norm(b)
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / denom)
  }

  /** L2-normalize a vector to unit length (codegen'd kernel, float
    * output; the zero vector passes through). */
  def normalize(a: Column): Column =
    ColumnShim.column(ArrayNormalize(ColumnShim.expression(a)))

  /** Seeded Johnson–Lindenstrauss random projection to `outDim`
    * dimensions (±1 signs recomputed from a hash — no stored matrix,
    * identical on any cluster). Pairwise distances/angles are preserved
    * within the JL bound; shrink embeddings BEFORE they broadcast or
    * shuffle through similarity search. */
  def random_project(a: Column, outDim: Int, seed: Long = 42L): Column =
    ColumnShim.column(RandomProject(ColumnShim.expression(a), outDim, seed))

  /** [[random_project]], engine-portable audit mode: ±1 signs from md5-48
    * parity so any engine can rebuild the projection (n·outDim MD5 calls
    * per row — use for cross-engine audits, not throughput). */
  def random_project_portable(a: Column, outDim: Int,
      seed: Long = 42L): Column =
    ColumnShim.column(RandomProjectPortable(
      ColumnShim.expression(a), outDim, seed))

  /** Symmetric int8 quantization → struct(scale: float, q: binary): 4×
    * smaller than fp32 — the storage/broadcast lever for embedding
    * corpora at 100 TB. Recall cost is bounded by the per-element error
    * ≤ scale/2 (see `SimilaritySpec`). */
  def quantize8(a: Column): Column =
    ColumnShim.column(ArrayQuantize8(ColumnShim.expression(a)))

  /** Inverse of [[quantize8]] → array<float>. */
  def dequantize8(qs: Column): Column =
    ColumnShim.column(ArrayDequantize8(ColumnShim.expression(qs)))

  /** SimHash-style signed random-hyperplane bucket id with `bits` bits:
    * sign pattern of the dot product against `bits` pseudo-random
    * hyperplanes derived deterministically from element index and plane id
    * (hash-based projection — no stored hyperplane matrix, so the same
    * expression works on any executor without broadcast state). */
  def hyperplane_bucket(a: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, "bits must be in [1,30]")
    val terms = (0 until bits).map { p =>
      // pseudo-random ±1 weight per (plane, index): parity of a cheap hash
      val proj = aggregate(
        zip_with(a, transform(a, (_, i) => i),
          (x, i) => x.cast("double") *
            when(pmod(hash(i, lit(p)), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    terms.reduce[Column](_ + _)
  }
}
