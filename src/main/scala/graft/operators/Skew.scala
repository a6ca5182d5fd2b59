package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in Spark 4) — it
  * needs no code. Manual salting remains necessary when the skewed side
  * feeds an aggregation (AQE does not split skewed groupBy keys) or when a
  * hot key dominates a broadcast-ineligible join. These helpers implement
  * the standard pattern: explode the hot side over `saltBuckets` synthetic
  * sub-keys, replicate the small side once per bucket, and drop the salt
  * after the shuffle.
  */
object Skew {

  private val Salt = "_graft_salt"

  /** Salted equi-join: `big` (skewed on `key`) joins `small` with each
    * small-side row replicated `saltBuckets` times so every salted
    * partition finds its match. Use when `small` is too big to broadcast
    * but far smaller than `big`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val salted = big.withColumn(Salt,
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = small.withColumn(Salt,
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, Salt), joinType).drop(Salt)
  }

  /** Two-phase salted aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. `partial` builds the per-group partial
    * aggregates; `merge` combines them. For algebraic aggregates
    * (sum/count/min/max) this bounds any single reducer's input to
    * |distinct keys|·saltBuckets rows regardless of key skew. */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val salted = df.withColumn(Salt,
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted.groupBy(col(key), col(Salt))
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(col(key)).agg(merge.head, merge.tail: _*)
  }
}
