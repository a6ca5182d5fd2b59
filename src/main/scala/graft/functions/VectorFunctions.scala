package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, composed from Spark's
  * higher-order functions (`zip_with`, `aggregate`, `transform`) so the hot
  * path stays inside whole-stage codegen — no UDF serialization and no
  * mllib Vector boxing.
  *
  * All kernels compute in double precision with strict left-to-right
  * accumulation, which makes results bit-reproducible and comparable with
  * an external oracle computing the same sequence of IEEE ops.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ (double). */
  def l2_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity ∈ [-1,1]; null-safe zero-vector guard → null. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2_norm(a) * l2_norm(b)
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / denom)
  }

  /** L2-normalize a vector to unit length (element type double). */
  def normalize(a: Column): Column = {
    val n = l2_norm(a)
    transform(a, x => x.cast("double") / n)
  }

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
