package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the hashed-feature linear classifier
  * shape every large corpus pipeline runs (CCNet / RefinedWeb style:
  * a fastText-like model scores each doc, the pipeline keeps the high
  * scorers). The MODEL here is pluggable: callers bring trained weights
  * as a (feature_id, weight) table; [[seededWeights]] provides a
  * deterministic stand-in for tests and cross-engine audits.
  *
  * Scoring is the bag-of-tokens mean: score(doc) = Σ w[h(tok) mod dim]
  * / n_tokens. Feature hashing (the "hashing trick") needs no vocabulary
  * file — any token maps to one of `dim` buckets via the engine-portable
  * md5-48 ([[graft.functions.PortableHash]]), so scores are re-derivable
  * in any engine.
  *
  * Scale notes (100 TB): the weight table is ≤ `dim` rows — broadcast
  * always; the token stream joins it map-side (narrow) and the per-doc
  * mean is ONE partially-aggregated groupBy on doc id, so the only
  * shuffle is bounded by the DOC count, never the token count.
  */
object QualityModel {

  /** Seed-derived pseudo-random weight table (`feature_id`, `weight` ∈
    * [−1, 1]) — the audit-mode stand-in for trained weights, rebuildable
    * bit-identically in SQL (md5-48 of "w:&lt;feature&gt;" → affine map).
    */
  def seededWeights(spark: SparkSession, dim: Int,
      seed: Long = 42L): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    spark.range(dim).select(col("id").as("feature_id"),
      ((graft.functions.PortableHash.hash48(
        concat(lit("w:"), col("id").cast("string")), seed) % 2001L
        - 1000L) / 1000.0).as("weight"))
  }

  /** Per-doc linear score over hashed token features. Output: (idCol,
    * `score` — mean feature weight, 0.0 for token-less docs —,
    * `n_tokens`). `weights` must cover [0, dim) (missing features score
    * as absent, matching a sparse trained model). */
  def scoreHashedLinear(
      docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, dim: Int, seed: Long = 42L): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val base = docs.filter(col(textCol).isNotNull)
    val scored = base
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("_tk"))
      .filter(col("_tk") =!= "")
      .select(col(idCol),
        (graft.functions.PortableHash.hash48(col("_tk"), seed) % dim)
          .as("feature_id"))
      .join(broadcast(weights.select(col("feature_id"), col("weight"))),
        Seq("feature_id"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("weight"), lit(0.0))) /
          count(lit(1))).as("score"),
        count(lit(1)).as("n_tokens"))
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0.0)).as("score"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** [[scoreHashedLinear]] squashed to a keep-probability via the
    * logistic function — the thresholdable form ("keep docs with
    * p ≥ 0.5"). Spark-side convenience; cross-engine audits should
    * compare the raw score (libm `exp` is not bit-stable across
    * engines). */
  def keepProbability(scored: DataFrame): DataFrame =
    scored.withColumn("p_keep",
      lit(1.0) / (lit(1.0) + exp(-col("score"))))
}
