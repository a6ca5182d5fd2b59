package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native typed
  * aggregate — approximate POINT-FREQUENCY estimation with bounded state,
  * completing the engine's sketch quartet (HLL distinct counts, Misra–
  * Gries heavy hitters [[TopKFreq]], Bloom membership
  * [[BloomShingleAgg]]; CMS answers "how often did THIS item occur?").
  * At 100 TB the true token/URL/shingle frequency table doesn't fit
  * anywhere, but a depth×width counter matrix answering point queries
  * with a one-sided error bound does.
  *
  * Guarantees (classic CMS): `estimate(x) = min_d counts[d][h_d(x)]` is
  * an UPPER bound on the true count, over-counting by at most
  * `e·n/width` with probability ≥ 1 − (1/e)^depth (n = stream weight).
  * The matrix is a pure counter grid: merge = element-wise sum, so
  * partial aggregation works map-side like any algebraic agg, and
  * sketches built on different clusters/days union losslessly.
  *
  * Hashing: row d hashes with seed `seed + d`. The default kernel is
  * XXH64 over the UTF-8 bytes (native, fast); `portable = true` swaps in
  * [[PortableHash]]'s md5-48 so every counter — and therefore every
  * estimate — can be re-derived bit-exactly by any SQL engine
  * (`CAST(conv(substr(md5(concat(seed + d, ':', x)), 1, 12), 16, 10) AS
  * BIGINT) % width`), the same audit contract as the portable MinHash/
  * SimHash tiers.
  *
  * State is `depth·width` longs per group regardless of group size
  * (default 4×1024 = 32 KiB); eval emits the counter rows as
  * `array<array<bigint>>` for storage/join-side probing.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Long = 42L,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_sketch needs a string column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(state: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        state(d * width + CmsSketch.bucket(s, seed + d, width, portable)) += 1L
        d += 1
      }
    }
    state
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(state: Array[Long]): Any =
    new GenericArrayData((0 until depth).map { d =>
      val row = new Array[Any](width)
      var w = 0
      while (w < width) { row(w) = state(d * width + w); w += 1 }
      new GenericArrayData(row): Any
    }.toArray)

  override def serialize(state: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(state.length * 8)
    var i = 0
    while (i < state.length) { buf.putLong(state(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val s = new Array[Long](depth * width)
    var i = 0
    while (i < s.length) { s(i) = buf.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {

  /** Row-d bucket of `s` — shared by the aggregate (build) and the JVM
    * probe [[estimate]], and mirrored column-side by [[estimateCol]] so
    * probing can also happen inside whole-stage codegen. */
  def bucket(s: UTF8String, rowSeed: Long, width: Int,
      portable: Boolean): Int =
    if (portable)
      (PortableHash.hash48(s.toString, rowSeed) % width).toInt
    else {
      val b = s.getBytes
      val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(b, off, b.length, rowSeed), width.toLong).toInt
    }

  /** Column-side point estimate — the same min-over-rows probe as
    * [[estimate]], built entirely from codegen'd builtins
    * (element_at + least; md5 chain or XxHash64 per row), so a
    * broadcast sketch can be probed inside whole-stage codegen with no
    * UDF. `sketch` is the `array<array<bigint>>` the aggregate emits. */
  def estimateCol(sketch: org.apache.spark.sql.Column,
      item: org.apache.spark.sql.Column, depth: Int, width: Int,
      seed: Long = 42L, portable: Boolean = false)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(depth >= 1, "depth must be >= 1")
    val probes = (0 until depth).map { d =>
      import org.apache.spark.sql.graftshim.ColumnShim
      val h =
        if (portable) PortableHash.hash48(item, seed + d) % width
        else pmod(ColumnShim.column(
          org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(ColumnShim.expression(item)), seed + d)), lit(width.toLong))
      element_at(element_at(sketch, d + 1), (h + 1).cast("int"))
    }
    least(probes: _*)
  }

  /** Point estimate from an evaluated sketch: min over rows — the
    * classic one-sided CMS query. */
  def estimate(sketch: Seq[Seq[Long]], item: String, seed: Long,
      portable: Boolean): Long = {
    val depth = sketch.length
    val width = sketch.head.length
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d)(
        bucket(UTF8String.fromString(item), seed + d, width, portable))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
