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
    portable: Boolean = false,
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
      // portable: md5-derived 48-bit hash — non-negative, so the signed
      // (hash, id) buffer order below equals the unsigned/SQL order and
      // the sample is re-derivable in any engine (see PortableHash)
      val h =
        if (portable) PortableHash.hash48(id.toString, seed)
        else SampleK.hash64(id, seed)
      state.offer(h, id)
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

/** Misra–Gries heavy-hitters sketch as a native typed aggregate — top
  * frequent items with BOUNDED state, the scale-safe alternative to a full
  * `groupBy(token).count()` when the domain is huge (URLs, shingles,
  * n-grams at 100 TB: the true vocabulary doesn't fit anywhere, but the
  * heavy hitters do).
  *
  * Guarantees (classic MG + the mergeable-summaries merge): every reported
  * count is a LOWER bound, under-counting by at most `n / (capacity + 1)`
  * (n = stream length), and any item with true frequency above that bound
  * is guaranteed present. With `capacity` ≥ distinct items the sketch is
  * EXACT. State is O(capacity) per group regardless of group size; merge
  * is counter-wise sum followed by the (capacity+1)-th-largest subtraction,
  * so partial aggregation works map-side like any algebraic agg.
  */
case class TopKFreq(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKFreq.State] {

  require(capacity >= 1, "capacity must be >= 1")
  require(k >= 1 && k <= capacity, "k must be in [1, capacity]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_freq"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_freq needs a string column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): TopKFreq.State =
    new TopKFreq.State(capacity)

  override def update(state: TopKFreq.State, input: InternalRow): TopKFreq.State = {
    val v = child.eval(input)
    if (v != null) state.offer(v.asInstanceOf[UTF8String].toString, 1L)
    state
  }

  override def merge(a: TopKFreq.State, b: TopKFreq.State): TopKFreq.State = {
    // counter-wise sum first (table may transiently exceed capacity), THEN
    // one (capacity+1)-th-largest subtraction — the mergeable-summaries
    // merge, whose error stays additive; folding b in via offer() would
    // instead pay an eviction penalty per distinct item
    b.foreach((item, c) => a.add(item, c))
    a.shrinkToCapacity()
    a
  }

  override def eval(state: TopKFreq.State): Any = {
    val top = state.top(k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(state: TopKFreq.State): Array[Byte] = {
    val entries = state.entries
    var size = 4
    val encoded = entries.map { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (b, c)
    }
    encoded.foreach { case (b, _) => size += 4 + b.length + 8 }
    val buf = ByteBuffer.allocate(size)
    buf.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      buf.putInt(b.length); buf.put(b); buf.putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKFreq.State = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new TopKFreq.State(capacity)
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      val c = buf.getLong
      // serialized states are ≤ capacity by construction; add() restores
      // the exact counters without paying offer()'s eviction logic
      s.add(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren.head)
}

object TopKFreq {

  /** Misra–Gries counter table. `offer(item, w)` adds weight w; when the
    * table would exceed capacity, the minimum counter value is subtracted
    * from ALL counters and zeros are evicted (the weighted MG step —
    * equivalent to w repetitions of the classic decrement). Merge-side
    * overflow is handled by [[shrinkToCapacity]]: subtract the
    * (capacity+1)-th largest value, keeping the error bound additive
    * across merges (Agarwal et al., "Mergeable Summaries"). */
  final class State(capacity: Int) {
    private val counts =
      new java.util.HashMap[String, java.lang.Long](capacity * 2)

    /** Unconditional counter add — merge/deserialize path; may leave the
      * table above capacity until [[shrinkToCapacity]] runs. */
    def add(item: String, w: Long): Unit = {
      val cur = counts.get(item)
      counts.put(item, if (cur != null) cur + w else w)
    }

    def offer(item: String, w: Long): Unit = {
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur + w)
      else if (counts.size < capacity) counts.put(item, w)
      else {
        // subtract the min counter (≥ classic decrement-all, amortized)
        var minV = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < minV) minV = v }
        val dec = math.min(minV, w)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - dec
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
        val rem = w - dec
        if (rem > 0) offer(item, rem) // slot freed unless all counters equal
      }
    }

    /** Enforce ≤ capacity entries after a merge: subtract the
      * (capacity+1)-th largest counter from all, drop non-positives. */
    def shrinkToCapacity(): Unit = {
      if (counts.size <= capacity) return
      val vals = new Array[Long](counts.size)
      var i = 0
      val it0 = counts.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cut
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }

    def foreach(f: (String, Long) => Unit): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); f(e.getKey, e.getValue) }
    }

    def entries: Seq[(String, Long)] = {
      val b = Seq.newBuilder[(String, Long)]
      foreach((s, c) => b += ((s, c)))
      b.result()
    }

    /** Top-k by (count desc, item asc) — deterministic output order. */
    def top(k: Int): Seq[(String, Long)] =
      entries.sortBy { case (s, c) => (-c, s) }.take(k)
  }
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
