package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable seeded hash: the first 48 bits of `md5("<seed>:<value>")`
  * as a non-negative BIGINT in `[0, 2^48)`.
  *
  * Every other hash in the engine is xxhash64 (native, codegen'd, the right
  * default) — but xxhash64 exists in no other SQL engine, so membership
  * decisions made with it can only be re-derived by running Spark. Pipelines
  * that must AUDIT a sampling/dedup decision elsewhere (a warehouse
  * verifying "was this doc in train?", a DuckDB/Trino reconciliation job, a
  * correctness oracle) need a hash both sides can compute bit-identically
  * from the SQL standard surface. md5 is that: the 12-hex-char prefix parses
  * into a BIGINT everywhere —
  *
  *   Spark:  `CAST(conv(substr(md5(concat(seed, ':', x)), 1, 12), 16, 10)
  *                 AS BIGINT)`
  *   DuckDB: `CAST(concat('0x', substr(md5(concat(seed, ':', x)), 1, 12))
  *                 AS BIGINT)`
  *
  * 48 bits (not 64) so the value is always non-negative and safely inside
  * BIGINT on engines with checked overflow; collision odds are irrelevant
  * for sampling (membership needs uniformity, not injectivity).
  *
  * Scale: the column form is built
  * entirely from codegen'd builtins (md5/substring/conv) — a narrow
  * per-row map, no shuffle; ~3× the cost of xxhash64 per row, which is why
  * it is the opt-in `portable = true` path rather than the default.
  */
object PortableHash {

  /** Size of the hash space: 2^48. */
  val Space: Long = 1L << 48

  /** Column form (codegen'd builtins only). The value is rendered
    * `cast(x AS string)` before hashing, so only use id types whose string
    * form is engine-stable (integers, strings — not floats). */
  def hash48(c: Column, seed: Long): Column =
    conv(substring(md5(
      concat_ws(":", lit(seed).cast("string"), c.cast("string"))), 1, 12),
      16, 10).cast("long")

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** JVM twin of the column form — bit-identical (specs pin this), for
    * aggregate buffers ([[SampleK]]) and tests. */
  def hash48(value: String, seed: Long): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(
      (seed.toString + ":" + value).getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}
