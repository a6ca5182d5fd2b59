package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Private-API shim (hence the `org.apache.spark.sql` package — the one
  * place `Dataset.ofRows`'s `private[sql]` scope is visible; everything
  * else used here is public Spark API).
  *
  * Why it exists: `Dataset.checkpoint`/`localCheckpoint` wrap the
  * materialized RDD in a [[LogicalRDD]] that INHERITS the parent plan's
  * ESTIMATED statistics (`originStats`). For iterative operators that
  * checkpoint per round this is compounding poison: size-only
  * estimation MULTIPLIES child `sizeInBytes` at every join, so a
  * checkpointed round whose plan held J joins carries a stat of
  * ~(bytes)^J — and the next round's joins multiply THOSE. Measured on
  * the round-8 Leiden refinement (six pointer-jumping CC rounds over a
  * checkpointed Louvain labeling): the stat went 527k bits → 27.8M bits
  * while per-round wall time went 0.4 s → 6.9 s with every executor
  * thread IDLE — the driver was spending the time in
  * `BigInteger.multiplyToomCook3` inside
  * `SizeInBytesOnlyStatsPlanVisitor`, between jobs, planning each
  * round's joins. No SQLConf disables the inheritance.
  *
  * The fix: after eager materialization the TRUE size is known to the
  * block manager, so replace `originStats` with the measured byte size
  * (summed over memory + disk), falling back to NO stats — the leaf
  * default (`spark.sql.defaultSizeInBytes`) — when the blocks are not
  * visible (e.g. reliable checkpoints written to an external FS; AQE
  * re-plans those joins from runtime sizes anyway). Accurate small
  * stats also mean auto-broadcast decisions over checkpointed frames
  * come from REAL sizes instead of inherited estimate products.
  */
object CheckpointStats {

  /** Rebuild `df` (a just-checkpointed frame) with measured statistics
    * on every [[LogicalRDD]] leaf. Row data, partitioning, and ordering
    * are untouched — only the stats metadata changes. */
  def resetToMeasured(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val session = cdf.sparkSession.asInstanceOf[SparkSession]
    val storage = session.sparkContext.getRDDStorageInfo
    // Direct match, NOT TreeNode.transform: LogicalRDD's case-class
    // equality spans only its first parameter list (output, rdd, …) —
    // a node rebuilt with different originStats compares EQUAL, so
    // transform would judge it unchanged and keep the original. A
    // just-checkpointed frame's analyzed plan is exactly one
    // LogicalRDD leaf, so the match is total in practice.
    val replaced = cdf.queryExecution.analyzed match {
      case l: LogicalRDD =>
        // getRDDStorageInfo is backed by the ASYNC AppStatusStore: right
        // after an eager checkpoint the block-update events may not have
        // drained, so the RDD can be absent or PARTIALLY reported. A
        // zero/implausibly-small reading is therefore treated as "not
        // measured" (None → leaf default), never floored up to a tiny
        // positive size — a 1-byte stat on a multi-GB frame would flip
        // auto-broadcast on and OOM the driver, strictly worse than the
        // conservative default.
        val measured = storage.find(_.id == l.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize))
          .filter(_ > 0)
        new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          session, measured.map(s => Statistics(sizeInBytes = s)), None)
      case other => other
    }
    Dataset.ofRows(session, replaced)
  }

  /** For checkpoints whose blocks are NOT in the local block manager
    * (reliable checkpoints on an external FS): keep the INHERITED
    * estimate unless it is pathological. Dropping inherited stats
    * unconditionally would floor every reliably-checkpointed frame to
    * the leaf default, silently suppressing auto-broadcasts that the
    * estimates allowed — a perf regression in non-AQE deployments. The
    * pathology test is the estimate's bit length: an honest byte count
    * fits in well under 64 bits (a yottabyte is 2^80) and even one
    * join's size product over two 100 TB inputs stays under ~2^94;
    * the compounding estimate products this shim exists for were
    * measured at 527k → 27.8M bits per Leiden round. Reading
    * `originStats` here is free — it was materialized at checkpoint
    * time — so the check never triggers a stats computation. */
  def resetIfPathological(df: org.apache.spark.sql.DataFrame,
      maxBits: Int = 128): org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val session = cdf.sparkSession.asInstanceOf[SparkSession]
    cdf.queryExecution.analyzed match {
      case l: LogicalRDD if l.stats.sizeInBytes.bitLength > maxBits =>
        Dataset.ofRows(session,
          new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(session, None, None))
      case _ => df
    }
  }
}
