package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic fixed-k per-group sampler as a native typed aggregate —
  * the custom-UDAF tier of the engine (SURVEY §2.9), with semantics a
  * reservoir sample can't give: membership is the k ids with the SMALLEST
  * seeded hash, so the result is independent of row order, partitioning,
  * and cluster size (a classic bottom-k sketch). "Show me 3 example docs
  * per language" returns the same 3 docs every run, on any cluster.
  *
  * State is a bounded k-element buffer (merge keeps the k smallest of
  * both sides), so memory per group is O(k) no matter the group size —
  * safe under billion-row groups where collect_list would OOM.
  */
case class SampleK(
    child: Expression,
    k: Int,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleK.State] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sample_k"

  // analysis-time guard: a non-integral id would otherwise surface as a
  // ClassCastException deep inside a running aggregation
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sample_k needs an integral id column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): SampleK.State =
    new SampleK.State(k)

  override def update(state: SampleK.State, input: InternalRow): SampleK.State = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Number].longValue()
      state.offer(SampleK.hash64(id, seed), id)
    }
    state
  }

  override def merge(a: SampleK.State, b: SampleK.State): SampleK.State = {
    b.foreach((h, id) => a.offer(h, id))
    a
  }

  override def eval(state: SampleK.State): Any =
    new GenericArrayData(state.sortedIds.map(x => x: Any))

  override def serialize(state: SampleK.State): Array[Byte] = {
    val n = state.size
    val buf = ByteBuffer.allocate(4 + n * 16)
    buf.putInt(n)
    state.foreach { (h, id) => buf.putLong(h); buf.putLong(id) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): SampleK.State = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new SampleK.State(k)
    var i = 0
    while (i < n) { s.offer(buf.getLong, buf.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleK =
    copy(child = newChildren.head)
}

object SampleK {

  /** Splittable 64-bit mix (splitmix64 finalizer) of (id, seed) — cheap,
    * well-distributed, and independent of Spark's partitioner hash. */
  def hash64(id: Long, seed: Long): Long = {
    var z = id + seed * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bounded bottom-k buffer of (hash, id), ties broken by id (duplicate
    * ids collapse — the sample is over distinct ids). Simple sorted-array
    * implementation: k is small (examples-per-group), so O(k) insert is
    * fine and serialization is trivial. */
  final class State(k: Int) {
    private var hs = new Array[Long](math.min(k, 16))
    private var ids = new Array[Long](math.min(k, 16))
    private var n = 0

    def size: Int = n

    def offer(h: Long, id: Long): Unit = {
      // find insert position (sorted by (hash, id)); reject dups + overflow
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compare(hs(mid), h) match {
          case 0 => java.lang.Long.compare(ids(mid), id)
          case x => x
        }
        if (c < 0) lo = mid + 1 else hi = mid
      }
      if (lo < n && hs(lo) == h && ids(lo) == id) return // dup
      if (n == k && lo == k) return // worse than current worst
      val newN = math.min(n + 1, k)
      if (newN > hs.length) {
        hs = java.util.Arrays.copyOf(hs, k)
        ids = java.util.Arrays.copyOf(ids, k)
      }
      val moveLen = math.min(n, k - 1) - lo
      if (moveLen > 0) {
        System.arraycopy(hs, lo, hs, lo + 1, moveLen)
        System.arraycopy(ids, lo, ids, lo + 1, moveLen)
      }
      hs(lo) = h
      ids(lo) = id
      n = newN
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(hs(i), ids(i)); i += 1 }
    }

    /** Members ordered by hash (the canonical sample order). */
    def sortedIds: Array[Long] = java.util.Arrays.copyOf(ids, n)
  }
}
