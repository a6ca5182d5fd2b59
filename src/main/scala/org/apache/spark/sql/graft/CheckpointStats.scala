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
    // Direct match, NOT TreeNode.transform: LogicalRDD's case-class
    // equality spans only its first parameter list (output, rdd, …) —
    // a node rebuilt with different originStats compares EQUAL, so
    // transform would judge it unchanged and keep the original. A
    // just-checkpointed frame's analyzed plan is exactly one
    // LogicalRDD leaf, so the match is total in practice.
    val replaced = cdf.queryExecution.analyzed match {
      case l: LogicalRDD =>
        new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          session, measuredBytes(session, l.rdd.id)
            .map(s => Statistics(sizeInBytes = s)), None)
      case other => other
    }
    Dataset.ofRows(session, replaced)
  }

  /** The RDD's stored byte size, read SYNCHRONOUSLY from the
    * BlockManagerMaster — NOT `sc.getRDDStorageInfo`, which is backed
    * by the async AppStatusStore event bus: right after an eager
    * checkpoint its events may not have drained, so the RDD could read
    * absent or PARTIALLY reported, and a partial undercount landing
    * under the auto-broadcast threshold would broadcast a multi-GB
    * frame (driver OOM). Executors report block stores to the master
    * with a synchronous `tellMaster` RPC as part of the store itself,
    * so by the time the checkpoint action has returned, the master's
    * table is authoritative. A zero reading (nothing stored — e.g. a
    * reliable checkpoint on an external FS) still maps to None: the
    * caller falls back to the conservative leaf default rather than a
    * fabricated tiny size. */
  private def measuredBytes(session: SparkSession,
      rddId: Int): Option[BigInt] = {
    val bytes =
      try org.apache.spark.SparkEnv.get.blockManager.master
        .getStorageStatus.iterator
        .flatMap(_.rddBlocks.collect {
          case (id: org.apache.spark.storage.RDDBlockId, s)
              if id.rddId == rddId => BigInt(s.memSize) + BigInt(s.diskSize)
        }).sum
      catch { case scala.util.control.NonFatal(_) => BigInt(0) }
    Some(bytes).filter(_ > 0)
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
