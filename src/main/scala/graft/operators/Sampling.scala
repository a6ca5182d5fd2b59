package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset sampling, splitting, and mixing — the curation operators a
  * training-data pipeline runs after dedup/quality scoring (choose what to
  * train on) and before export.
  *
  * Everything here is DETERMINISTIC BY CONTENT ID, not by partition layout:
  * `df.sample()` changes membership when the cluster size, partitioning, or
  * scan order changes, which makes training sets unreproducible. A seeded
  * hash of a stable id gives the same sample on 1 executor or 1000, today
  * or next year — and membership can be recomputed for any row without
  * materializing the sample ("was this doc in train?" is a filter, not a
  * lookup).
  *
  * Scale notes (100 TB): [[hashSample]] / [[trainTestSplit]] / [[mixture]]
  * are pure narrow filters — no shuffle, fully codegen (xxhash64 is a
  * native expression), pushdown-friendly (the filter composes with parquet
  * scans). [[stratifiedTopK]] is one hash shuffle on the stratum key (the
  * minimum for exact per-stratum semantics); skewed strata parallelize via
  * the same AQE machinery as any window.
  */
object Sampling {

  /** Hash-space resolution: membership granularity is 1e-6. */
  private val Buckets = 1000000L

  /** Seeded uniform bucket in [0, Buckets) from a stable id.
    * `portable = true` swaps xxhash64 for the md5-derived
    * [[graft.functions.PortableHash]] — ~3× slower per row but
    * recomputable bit-identically in any SQL engine (membership audits,
    * cross-engine reconciliation). Both are narrow codegen'd maps. */
  private def hashBucket(id: Column, seed: Long,
      portable: Boolean = false): Column =
    if (portable)
      graft.functions.PortableHash.hash48(id, seed) % Buckets
    else pmod(xxhash64(lit(seed), id), lit(Buckets))

  /** Deterministic Bernoulli sample: keeps rows whose seeded id-hash bucket
    * falls below `fraction`. Same id + seed → same verdict, always. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    df.filter(hashBucket(col(idCol), seed, portable)
      < (fraction * Buckets).toLong)
  }

  /** Deterministic, disjoint, exhaustive (train, test) split over one hash
    * space: test = bucket < cut, train = the rest. Adding data later never
    * moves an existing row across the boundary. */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double,
      seed: Long = 42L, portable: Boolean = false): (DataFrame, DataFrame) = {
    require(testFraction >= 0.0 && testFraction <= 1.0,
      "testFraction must be in [0, 1]")
    val bucket = hashBucket(col(idCol), seed, portable)
    val cut = (testFraction * Buckets).toLong
    (df.filter(bucket >= cut), df.filter(bucket < cut))
  }

  /** Leakage-safe split: the verdict hashes the CLUSTER id, not the row
    * id, so every member of a (near-)duplicate cluster lands on the same
    * side — a near-duplicate of a test document can never appear in
    * train. That's the split-leakage failure mode a row-hash split
    * ([[trainTestSplit]]) cannot prevent: two near-identical documents
    * hash independently and straddle the boundary, and the held-out set
    * silently measures memorization (SamplingSpec pins the
    * counterexample).
    *
    * `clusterCol` is any cluster assignment the dedup tier produces —
    * [[Dedup.exact]] keeper ids joined back, [[Dedup.connectedComponents]]
    * labels over minhash/simhash candidate pairs, or semantic-dedup
    * cells. Singletons are their own cluster, so with clusters small
    * relative to the corpus the test mass still concentrates around
    * `testFraction`.
    *
    * Growth contract: the verdict is a pure function of (cluster value,
    * seed) — ingesting more data never moves an existing cluster across
    * the boundary. The caller's labeling discipline owns the one
    * residual hazard: a min-id canonical label itself changes when a
    * lower-id member arrives or two clusters merge (inherent to content
    * clustering, not to the split).
    *
    * Scale (100 TB): a pure narrow map over whatever frame carries the
    * cluster column — no shuffle, no join, fully codegen'd, and the
    * predicate composes with parquet scan pushdown exactly like
    * [[hashSample]].
    *
    * @return input + `split` column (`train` | `test`) */
  def splitByCluster(df: DataFrame, clusterCol: String,
      testFraction: Double, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(testFraction >= 0.0 && testFraction <= 1.0,
      "testFraction must be in [0, 1]")
    val cut = (testFraction * Buckets).toLong
    df.withColumn("split",
      when(hashBucket(col(clusterCol), seed, portable) < cut, lit("test"))
        .otherwise(lit("train")))
  }

  /** Stratified train/val/test split with EXACT per-stratum quotas: in
    * every stratum, the `testK` rows with the smallest seeded id-hash
    * become `test`, the next `valK` become `val`, the rest `train` —
    * the "held-out set with k docs per language/source, the remainder
    * trains" convenience that [[trainTestSplit]] (fractional, global)
    * and [[stratifiedTopK]] (quota, but score-ordered and single-split)
    * each cover only half of. Selection order is the hash, so
    * membership is pseudorandom but fully deterministic: same ids +
    * seed → same split on any cluster, any partitioning, any engine
    * (with `portable = true` the hash is the md5-48
    * [[graft.functions.PortableHash]] an external warehouse can
    * recompute). Strata smaller than `testK + valK` fill test first,
    * then val, and leave no train rows — quotas are exact, never
    * proportional fallbacks, so downstream eval-set sizes are stable
    * as data grows (a new row lands in train unless its hash beats an
    * incumbent's).
    *
    * Scale notes (100 TB): ONE window (rank over the stratum by hash)
    * — the same shape and caveat as [[stratifiedTopK]]: the window
    * parallelizes across strata but serializes within one, so a
    * mega-stratum gates on a single task's sort. With quotas ≪ stratum
    * size, pre-filter cheap: rows whose hash bucket exceeds
    * ~(quota/|stratum|)·2^k margins can't win — compose with
    * [[hashSample]] upstream when strata are billions of rows.
    *
    * @return input + `split` column (`test` | `val` | `train`) */
  def stratifiedSplit(df: DataFrame, strataCol: String, idCol: String,
      valK: Int, testK: Int, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(valK >= 0 && testK >= 0 && valK + testK > 0,
      "valK and testK must be >= 0 with a positive sum")
    val rn = "_graft_srn"
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol), seed, portable), col(idCol))
    df.withColumn(rn, row_number().over(w))
      .withColumn("split",
        when(col(rn) <= testK, lit("test"))
          .when(col(rn) <= testK + valK, lit("val"))
          .otherwise(lit("train")))
      .drop(rn)
  }

  /** Deterministic epoch-order assignment — the seeded GLOBAL shuffle a
    * training run needs for its data order: every row gets a dense
    * 0-based `pos` in (seeded id-hash, id) order, reproducible across
    * runs, partitionings, and engines (`portable` mode). Hash order
    * interleaves sources/domains by construction — no long same-domain
    * runs — which is the point of shuffling training data; re-seeding
    * gives the next epoch's independent order.
    *
    * The dense global index costs NO single-partition sort (the naive
    * `row_number() OVER (ORDER BY hash)` collapses the corpus into one
    * task): the hash space splits into `buckets` ORDER-ALIGNED slices,
    * per-bucket counts (one tiny aggregate) prefix-sum into bucket
    * offsets on a broadcast-sized frame, and
    * pos = offset + rank-within-bucket − 1 — a window partitioned BY
    * BUCKET, fully distributed.
    *
    * Scale notes (100 TB): one shuffle on the bucket key for the
    * window plus one map-side-combined counts aggregate; set `buckets`
    * ≫ cluster cores (default 4096) so the windows parallelize; the
    * hash is uniform, so buckets are skewless by construction. Writers
    * consume `orderBy(pos)` shards or `repartitionByRange` on it.
    *
    * @return input + `pos` (0-based dense long, a permutation) */
  def epochOrder(df: DataFrame, idCol: String, seed: Long = 42L,
      portable: Boolean = false, buckets: Int = 4096): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val keyed = df
      .withColumn("_graft_ek", hashBucket(col(idCol), seed, portable))
      .withColumn("_graft_eb", // integer div: Column./ would go double
        expr(s"(_graft_ek * ${buckets}L) div ${Buckets}L"))
    val offsets = keyed.groupBy(col("_graft_eb"))
      .agg(count(lit(1)).as("_graft_en"))
      .withColumn("_graft_eoff",
        coalesce(sum(col("_graft_en")).over(
          Window.orderBy(col("_graft_eb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_graft_en")
    val w = Window.partitionBy(col("_graft_eb"))
      .orderBy(col("_graft_ek"), col(idCol))
    keyed
      .join(broadcast(offsets), Seq("_graft_eb"))
      .withColumn("pos",
        col("_graft_eoff") + row_number().over(w).cast("long") - 1L)
      .drop("_graft_eb", "_graft_ek", "_graft_eoff")
  }

  /** Multi-epoch [[epochOrder]] in ONE pass over the corpus: every row
    * appears once per `epoch` ∈ [0, epochs) with an independent
    * seeded order per epoch — the hash key covers (id, epoch), so
    * epoch orders are decorrelated by construction and `pos` is a
    * dense 0-based permutation WITHIN each epoch. This is the
    * training-run shape ("E epochs, each its own shuffle") produced as
    * one frame a writer can range-shard by (epoch, pos) — feed it to
    * [[packByBudget]] grouped on `epoch` and ordered by `pos` for the
    * full shuffle-then-pack data-prep story (`q_x6r_epoch_pack`).
    *
    * Same no-single-partition-sort construction as [[epochOrder]],
    * with (epoch, bucket) as the window key: the offsets frame grows
    * to epochs·buckets rows — still broadcast-sized for any sane E —
    * and the E× row multiplication happens AFTER the scan (explode),
    * so the corpus is read once, not E times.
    *
    * @return input × epochs + (`epoch` 0-based long, `pos` dense
    *         0-based long per epoch) */
  def epochOrderMulti(df: DataFrame, idCol: String, epochs: Int,
      seed: Long = 42L, portable: Boolean = false,
      buckets: Int = 4096): DataFrame = {
    require(epochs >= 1 && epochs <= 1024,
      s"epochs must be in [1, 1024] (got $epochs)")
    require(buckets >= 1, "buckets must be >= 1")
    // Key = hash48/xxhash64 over (id, epoch) under one seed — the
    // md5("<seed>:<id>:<epoch>") form the negativePairs oracle replays.
    val key =
      if (portable) graft.functions.PortableHash.hash48(
        concat_ws(":", col(idCol).cast("string"),
          col("epoch").cast("string")), seed) % Buckets
      else pmod(xxhash64(lit(seed), col(idCol), col("epoch")),
        lit(Buckets))
    val keyed = df
      .withColumn("epoch",
        explode(sequence(lit(0L), lit((epochs - 1).toLong))))
      .withColumn("_graft_ek", key)
      .withColumn("_graft_eb",
        expr(s"(_graft_ek * ${buckets}L) div ${Buckets}L"))
    val offsets = keyed.groupBy(col("epoch"), col("_graft_eb"))
      .agg(count(lit(1)).as("_graft_en"))
      .withColumn("_graft_eoff",
        coalesce(sum(col("_graft_en")).over(
          Window.partitionBy(col("epoch")).orderBy(col("_graft_eb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_graft_en")
    val w = Window.partitionBy(col("epoch"), col("_graft_eb"))
      .orderBy(col("_graft_ek"), col(idCol))
    keyed
      .join(broadcast(offsets), Seq("epoch", "_graft_eb"))
      .withColumn("pos",
        col("_graft_eoff") + row_number().over(w).cast("long") - 1L)
      .drop("_graft_eb", "_graft_ek", "_graft_eoff")
  }

  /** Curriculum ordering — the quality-scheduled composition of the
    * shuffle-and-pack story: epoch e draws from the EASIEST
    * `competence(e)` fraction of the corpus (a growing data window,
    * the Bengio/Platanios competence-based curriculum), shuffled
    * within the window by the standard decorrelated per-epoch seeded
    * hash order. Feed the result to [[packByBudget]] grouped on
    * `epoch` ordered by `pos` and you have the full easy→hard
    * training-prep pipeline with a deterministic, engine-replayable
    * order.
    *
    * Difficulty is the EXACT dense 1-based rank of `scoreCol`
    * ascending (low score = easy; negate upstream for the opposite),
    * ties broken by id. The competence window grows linearly in the
    * epoch with floor `startPermille`/1000:
    * `c(e) = sp/1000 + (1 − sp/1000)·(e+1)/E` — epoch 0 already draws
    * `sp/1000 + (1 − sp/1000)/E` (NOT the bare floor: with the
    * defaults E = 3, sp = 250 that is 50% of the corpus), and the
    * final epoch draws exactly 1. Inclusion is decided in pure
    * integer arithmetic — keep iff `rank·1000·E ≤ n·(startPermille·E
    * + (1000−startPermille)·(e+1))` (the same formula cleared of
    * denominators) — so the oracle replays every verdict with BIGINT
    * math, no float thresholds.
    *
    * The global rank costs NO single-partition sort (the same
    * discipline as [[epochOrder]]'s dense pos): score space splits
    * into `rankBuckets` ORDER-ALIGNED equal-width slices between the
    * global min/max (one 1-row aggregate, broadcast back), per-bucket
    * counts prefix-sum into offsets on a broadcast-sized frame, and
    * rank = offset + row_number within the bucket. Equal-width
    * bucketing is skew-prone on pathological score distributions
    * (all-equal scores collapse to ONE bucket and its window
    * serializes — correct, but degraded; pre-discretize such scores
    * upstream); for typical quality scores the buckets spread fine.
    *
    * Scale notes (100 TB): one corpus scan (the epoch explosion
    * happens after the scan and AFTER the inclusion filter prunes
    * early epochs to their windows), one shuffle for the rank window,
    * one for the per-epoch pos window; everything joined back is
    * broadcast-sized. Early epochs emit only their window — total
    * output rows are Σ_e n·c(e) ≈ n·E·(1+c0)/2, cheaper than
    * [[epochOrderMulti]]'s n·E.
    *
    * @return input × included epochs + (`difficulty_rank` 1-based,
    *         `epoch` 0-based long, `pos` dense 0-based long per epoch) */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
      epochs: Int, startPermille: Int = 250, seed: Long = 42L,
      portable: Boolean = false, buckets: Int = 4096,
      rankBuckets: Int = 1024): DataFrame = {
    require(epochs >= 1 && epochs <= 1024,
      s"epochs must be in [1, 1024] (got $epochs)")
    require(startPermille >= 1 && startPermille <= 1000,
      s"startPermille must be in [1, 1000] (got $startPermille)")
    // upper bound: the rank/pos offset frames are broadcast and their
    // prefix-sum windows run UNPARTITIONED — fine at 2^20 rows, a real
    // single-partition sort if a caller passes 10^8
    require(buckets >= 1 && buckets <= (1 << 20) &&
        rankBuckets >= 1 && rankBuckets <= (1 << 20),
      "buckets and rankBuckets must be in [1, 2^20]")
    val scored = df.filter(col(scoreCol).isNotNull)
    // --- exact global difficulty rank, distributed ---
    val ext = scored.agg(
      min(col(scoreCol).cast("double")).as("_lo"),
      max(col(scoreCol).cast("double")).as("_hi"),
      count(lit(1)).as("_n"))
    val bucketed = scored.crossJoin(broadcast(ext))
      .withColumn("_graft_rb",
        when(col("_hi") === col("_lo"), lit(1L))
          .otherwise(width_bucket(col(scoreCol).cast("double"),
            col("_lo"), col("_hi"), lit(rankBuckets))))
      // width_bucket sends v == hi to bucket rankBuckets+1; clamp in
      .withColumn("_graft_rb",
        least(col("_graft_rb"), lit(rankBuckets.toLong)))
    val rankOffsets = bucketed.groupBy(col("_graft_rb"))
      .agg(count(lit(1)).as("_rn"))
      .withColumn("_graft_roff",
        coalesce(sum(col("_rn")).over(
          Window.orderBy(col("_graft_rb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_rn")
    val rw = Window.partitionBy(col("_graft_rb"))
      .orderBy(col(scoreCol), col(idCol))
    val ranked = bucketed
      .join(broadcast(rankOffsets), Seq("_graft_rb"))
      .withColumn("difficulty_rank",
        col("_graft_roff") + row_number().over(rw).cast("long"))
      .drop("_graft_rb", "_graft_roff", "_lo", "_hi")
    // --- competence window per epoch (integer-exact inclusion) ---
    val e1000 = 1000L * epochs
    val included = ranked
      .withColumn("epoch",
        explode(sequence(lit(0L), lit((epochs - 1).toLong))))
      .filter(col("difficulty_rank") * e1000 <=
        col("_n") * (lit(startPermille.toLong * epochs) +
          lit((1000L - startPermille)) * (col("epoch") + 1)))
      .drop("_n")
    // --- decorrelated seeded order within each epoch's window ---
    val key =
      if (portable) graft.functions.PortableHash.hash48(
        concat_ws(":", col(idCol).cast("string"),
          col("epoch").cast("string")), seed) % Buckets
      else pmod(xxhash64(lit(seed), col(idCol), col("epoch")),
        lit(Buckets))
    val keyed = included
      .withColumn("_graft_ek", key)
      .withColumn("_graft_eb",
        expr(s"(_graft_ek * ${buckets}L) div ${Buckets}L"))
    val offsets = keyed.groupBy(col("epoch"), col("_graft_eb"))
      .agg(count(lit(1)).as("_graft_en"))
      .withColumn("_graft_eoff",
        coalesce(sum(col("_graft_en")).over(
          Window.partitionBy(col("epoch")).orderBy(col("_graft_eb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_graft_en")
    val w = Window.partitionBy(col("epoch"), col("_graft_eb"))
      .orderBy(col("_graft_ek"), col(idCol))
    keyed
      .join(broadcast(offsets), Seq("epoch", "_graft_eb"))
      .withColumn("pos",
        col("_graft_eoff") + row_number().over(w).cast("long") - 1L)
      .drop("_graft_eb", "_graft_ek", "_graft_eoff")
  }

  /** Length-grouped batch assignment — the padding-efficiency trick
    * every fixed-shape training loop wants: rows sort by
    * (`lenCol`, `idCol`) and fixed-size batches cut along that order,
    * so each batch holds near-equal lengths and the pad-to-batch-max
    * waste collapses (random batching pads every batch to its longest
    * straggler). Deterministic and partitioning-independent: the id
    * tie-break makes the order total, so the same corpus always yields
    * the same batches.
    *
    * The dense global rank costs NO single-partition sort — the
    * [[curriculumOrder]] discipline: the length space splits into
    * `rankBuckets` ORDER-ALIGNED equal-width slices between the global
    * min/max (one 1-row aggregate, broadcast back), per-bucket counts
    * prefix-sum into offsets on a broadcast-sized frame, and
    * rank = offset + row_number within the bucket. Length
    * distributions are bounded and well-spread in practice; an
    * all-equal-length corpus collapses to one bucket whose window
    * serializes (correct, just degraded).
    *
    * Scale notes (100 TB): one shuffle for the rank window plus two
    * broadcast-sized joins; `batch_id` then feeds
    * `repartitionByRange(col("batch_id"))` writers so whole batches
    * land contiguously. Null lengths are excluded (a row with no
    * length cannot take a padding slot).
    *
    * @return input + `batch_id` (0-based long; the last batch may be
    *         partial) */
  def lengthGroupedBatches(df: DataFrame, idCol: String, lenCol: String,
      batchSize: Int, rankBuckets: Int = 1024): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    // same bound as [[curriculumOrder]]: the offset frame's prefix-sum
    // window is unpartitioned — bounded only if rankBuckets is
    require(rankBuckets >= 1 && rankBuckets <= (1 << 20),
      "rankBuckets must be in [1, 2^20]")
    val rows = df.filter(col(lenCol).isNotNull)
    val ext = rows.agg(
      min(col(lenCol).cast("double")).as("_lo"),
      max(col(lenCol).cast("double")).as("_hi"))
    val bucketed = rows.crossJoin(broadcast(ext))
      .withColumn("_graft_lb",
        when(col("_hi") === col("_lo"), lit(1L))
          .otherwise(width_bucket(col(lenCol).cast("double"),
            col("_lo"), col("_hi"), lit(rankBuckets))))
      .withColumn("_graft_lb",
        least(col("_graft_lb"), lit(rankBuckets.toLong)))
    val offsets = bucketed.groupBy(col("_graft_lb"))
      .agg(count(lit(1)).as("_ln"))
      .withColumn("_graft_loff",
        coalesce(sum(col("_ln")).over(
          Window.orderBy(col("_graft_lb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_ln")
    val w = Window.partitionBy(col("_graft_lb"))
      .orderBy(col(lenCol), col(idCol))
    bucketed
      .join(broadcast(offsets), Seq("_graft_lb"))
      .withColumn("_graft_lr",
        col("_graft_loff") + row_number().over(w).cast("long"))
      .withColumn("batch_id",
        expr(s"(_graft_lr - 1L) div ${batchSize}L"))
      .drop("_graft_lb", "_graft_loff", "_graft_lr", "_lo", "_hi")
  }

  /** Per-batch padding audit over a [[lengthGroupedBatches]] result
    * (or ANY batch assignment — run it on a random assignment to see
    * what length grouping saves): `padding_waste` = the pad tokens a
    * pad-to-batch-max collator burns, `max_len`·`n_rows` − `sum_len`.
    * One map-side-combinable aggregate. */
  def paddingWaste(batched: DataFrame, lenCol: String,
      batchCol: String = "batch_id"): DataFrame =
    batched.groupBy(col(batchCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col(lenCol)).cast("long").as("max_len"),
        sum(col(lenCol).cast("long")).as("sum_len"))
      .withColumn("padding_waste",
        col("max_len") * col("n_rows") - col("sum_len"))

  /** TOKEN-BUDGET batching — the production collator contract
    * ([[lengthGroupedBatches]] cuts fixed-COUNT batches; training
    * collators cut fixed-COMPUTE ones): rows bucket by length (EXACT
    * integer bucketing, the normalizeToBits discipline — `div`, never
    * width_bucket's double path, so the oracle replays it), each
    * bucket's batch CAPACITY is `max(budget div bucket_max_len, 1)`
    * (all members are ≤ the bucket max, so every batch's
    * pad-to-batch-max footprint `n·max_len` provably fits `budget`),
    * and batches cut along the (length, id) total order within each
    * bucket. Restarting numbering at bucket boundaries costs at most
    * one underfilled batch per bucket and keeps the whole operator
    * embarrassingly parallel — no global greedy chain.
    *
    * Rows LONGER than the budget still land (in singleton batches via
    * the capacity floor) — audit them with `max_len > budget` on the
    * [[paddingWaste]] report. Rows with a NULL length are excluded,
    * the [[lengthGroupedBatches]] policy: a row with no length cannot
    * take a padding slot; reconcile counts upstream if nulls are
    * possible.
    *
    * Scale notes (100 TB): one stats aggregate, one per-bucket rank
    * window (bounded partitions), and a broadcast-sized prefix-sum
    * over ≤ rankBuckets rows for the global batch offsets.
    *
    * @return input + `batch_id` (0-based long, globally unique) */
  def tokenBudgetBatches(df: DataFrame, idCol: String, lenCol: String,
      budget: Long, rankBuckets: Int = 1024): DataFrame = {
    require(budget >= 1L, s"budget must be >= 1 (got $budget)")
    require(rankBuckets >= 1 && rankBuckets <= (1 << 20),
      "rankBuckets must be in [1, 2^20]")
    val rows = df.filter(col(lenCol).isNotNull)
    val ext = rows.agg(min(col(lenCol).cast("long")).as("_lo"),
      max(col(lenCol).cast("long")).as("_hi"))
    val bucketed = rows.crossJoin(broadcast(ext))
      .withColumn("_graft_tb",
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            expr(s"((CAST($lenCol AS BIGINT) - _lo) * " +
              s"${rankBuckets}L) div (_hi - _lo)"),
            lit(rankBuckets.toLong - 1L))))
    val caps = bucketed.groupBy(col("_graft_tb"))
      .agg(max(col(lenCol).cast("long")).as("_bmax"),
        count(lit(1)).as("_bn"))
      .withColumn("_cap",
        greatest(expr(s"${budget}L div _bmax"), lit(1L)))
      .withColumn("_graft_boff",
        coalesce(sum(expr("(_bn + _cap - 1L) div _cap")).over(
          Window.orderBy(col("_graft_tb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_tb", "_cap", "_graft_boff")
    val w = Window.partitionBy(col("_graft_tb"))
      .orderBy(col(lenCol), col(idCol))
    bucketed
      .join(broadcast(caps), Seq("_graft_tb"))
      .withColumn("_graft_tr", row_number().over(w).cast("long"))
      .withColumn("batch_id",
        col("_graft_boff") + expr("(_graft_tr - 1L) div _cap"))
      .drop("_graft_tb", "_cap", "_graft_boff", "_graft_tr",
        "_lo", "_hi")
  }

  /** AUTO-REBATCH chooser: measure [[paddingWaste]] over
    * [[tokenBudgetBatches]] for each candidate bucket granularity and
    * flag the winner — argmin by (total padding waste, then fewer
    * batches, then fewer buckets). Coarse buckets waste pad tokens
    * (wide length spread inside a batch); needlessly fine ones
    * fragment into underfilled batches — this measures instead of
    * guessing, which is the whole point of the audit column.
    * Deterministic end to end, so the report itself is
    * oracle-checkable. One assignment + one audit aggregate per
    * candidate; the report is candidates-sized.
    *
    * @return one row per candidate:
    *         (rank_buckets, n_batches, total_waste, chosen 0/1) */
  def autoRebatch(df: DataFrame, idCol: String, lenCol: String,
      budget: Long, candidates: Seq[Int]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate")
    require(candidates.distinct.size == candidates.size,
      "candidates must be distinct")
    val reports = candidates.map { rb =>
      paddingWaste(
          tokenBudgetBatches(df, idCol, lenCol, budget, rb), lenCol)
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("padding_waste")), lit(0L))
            .as("total_waste"))
        .withColumn("rank_buckets", lit(rb.toLong))
    }
    val all = reports.reduce(_.unionByName(_))
    val w = Window.orderBy(col("total_waste"), col("n_batches"),
      col("rank_buckets"))
    all
      .withColumn("chosen",
        when(row_number().over(w) === 1, lit(1L)).otherwise(lit(0L)))
      .select("rank_buckets", "n_batches", "total_waste", "chosen")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis bottom-k): each row gets key = −ln(u)/w with u a seeded
    * uniform from the id hash, and the k smallest keys win — the exact
    * distribution of sequential weighted draws without replacement, but
    * order- and partitioning-independent and reproducible across runs and
    * cluster sizes (same id + seed → same u, always).
    *
    * Rows with null, zero, or negative weight are EXCLUDED (a zero-weight
    * row must never win; letting it through with key = ∞ would still beat
    * nothing only if fewer than k positive rows exist — cleaner to drop).
    *
    * Scale notes: `orderBy(key).limit(k)` plans as TakeOrderedAndProject —
    * per-partition bottom-k then a k-row merge on the driver side of the
    * exchange; no global sort materializes. Use [[weightedSamplePerGroup]]
    * when k rows PER GROUP are wanted. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    // id tie-break: duplicate (id, weight) rows share an ES key, and
    // without a total order TakeOrderedAndProject would pick by partition
    // arrival — breaking the reproducibility contract
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_graft_wkey",
        esKey(col(idCol), col(weightCol), seed, portable))
      .orderBy(col("_graft_wkey"), col(idCol))
      .limit(k)
      .drop("_graft_wkey")
  }

  /** Per-group [[weightedSample]]: k weighted winners per group via a
    * windowed rank over the same ES keys (one shuffle on the group key). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val rn = "_graft_wrn"
    val w = Window.partitionBy(col(groupCol))
      .orderBy(esKey(col(idCol), col(weightCol), seed, portable), col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Efraimidis–Spirakis key −ln(u)/w, u ∈ (0, 1] from the seeded id hash
    * (default: xxhash64's top 53 bits → uniform double, +1 ulp so u is
    * never 0; portable: the md5-derived 48-bit hash over 2^48 — see
    * [[graft.functions.PortableHash]]). The key only ever drives an ORDER
    * (bottom-k selection), never a value compare, so sub-ulp libm `ln`
    * differences across engines cannot flip membership unless two keys
    * collide to within 1 ulp — which distinct ids make astronomically
    * unlikely. */
  private def esKey(id: Column, weight: Column, seed: Long,
      portable: Boolean = false): Column = {
    val u =
      if (portable)
        (graft.functions.PortableHash.hash48(id, seed) + 1) /
          lit(graft.functions.PortableHash.Space.toDouble)
      else (shiftrightunsigned(xxhash64(lit(seed), id), 11) + 1) *
        lit(1.1102230246251565e-16) // 2^-53
    -log(u) / weight
  }

  /** Exact-k per stratum under an explicit ordering (quality score, length,
    * recency...): the "keep the best k docs per language/source/domain"
    * quota step. Deterministic iff `ordering` is total — tie-break on the
    * id column. */
  def stratifiedTopK(df: DataFrame, strataCol: String, k: Int,
      ordering: Seq[Column]): DataFrame = {
    require(k > 0, "k must be positive")
    val rn = "_graft_rn"
    val w = Window.partitionBy(col(strataCol)).orderBy(ordering: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Sequence packing by cumulative budget: conceptually concatenate the
    * group's documents in `idCol` order and cut the stream every `budget`
    * weight units (tokens) — each doc is assigned the bin its START
    * offset falls in, exactly how an LLM training pipeline packs
    * documents into fixed-length sequences. Returns per-doc
    * (`start_offset` within the group's stream, `bin`, `spans` = how many
    * bins the doc touches — 1 means it fits its sequence without
    * crossing a boundary).
    *
    * Deterministic IFF `idCol` is unique within each group (the same
    * total-ordering precondition as [[stratifiedTopK]]) — tied ids would
    * cumsum in arrival order. Weights must be positive: a null or
    * non-positive weight raises at execution (zero-length docs should be
    * dropped or floored upstream — a zero weight on a bin boundary would
    * silently produce spans = 0). The window runs PER GROUP (`groupCol`
    * — shard, lang, source); packing a whole 100 TB corpus in one global
    * window would serialize on one task, so group first (as real
    * pipelines do per shard) and the window parallelizes per group like
    * any keyed window. */
  def packByBudget(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val wchecked = when(col(weightCol).isNotNull && col(weightCol) > 0,
        col(weightCol))
      .otherwise(raise_error(concat(
        lit(s"packByBudget: $weightCol must be positive, got "),
        col(weightCol).cast("string"), lit(s" for $idCol="),
        col(idCol).cast("string"))))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runningEnd = sum(wchecked).over(w)
    df.withColumn("start_offset", (runningEnd - col(weightCol)).cast("long"))
      .withColumn("bin", floor(col("start_offset") / budget).cast("long"))
      .withColumn("spans",
        (floor((runningEnd - 1) / budget).cast("long")
          - col("bin") + 1))
  }

  /** Weighted dataset mixture: per-source deterministic Bernoulli at the
    * source's weight, then union (missing columns null-fill). Seeds are
    * decorrelated per source so a row appearing in two sources (same id)
    * gets independent verdicts. Weights are per-source keep-fractions —
    * for "epochs"-style up-weighting > 1, pre-duplicate with distinct ids
    * upstream. */
  /** Deterministic negative-pair sampling — the contrastive-training
    * primitive ("for every anchor, k random non-matching partners")
    * without an RNG and without a corpus-wide sort: draw j = 1..k
    * candidate ids per anchor as `lo + md5-48(anchor, j) mod span` over
    * the OBSERVED id range, keep the draws that exist and aren't the
    * anchor itself. Same anchor + seed → same negatives on any cluster,
    * any partitioning, any engine (the [[graft.functions.PortableHash]]
    * discipline — the oracle replays every draw).
    *
    * Contract: ids should be reasonably DENSE in [min, max] — each draw
    * that lands on a hole or on the anchor is dropped, so sparse id
    * spaces yield fewer than `k` negatives per anchor (documented
    * honesty over silent redraw loops, which would break the closed-form
    * replay). Draws are with replacement across j (collisions possible
    * at tiny corpus sizes).
    *
    * Scale notes (100 TB): the id span is a 1-row broadcast; the
    * existence check is one equi-join of the k-exploded anchors against
    * the distinct-id table — hash-partitioned, no sort, no window;
    * everything else is narrow codegen hashing.
    *
    * @return (`idCol` — the anchor, `j` 1..k, `neg_id`). */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 1 && k <= 1024, s"k must be in [1, 1024] (got $k)")
    val ids = df.select(col(idCol).cast("long").as("_cand")).distinct()
    // Loud-refusal span guard: `_hi - _lo` wrapping negative means the
    // observed range overflows Long, and a span > 2^48 would silently
    // bias every draw into the low [lo, lo + 2^48) slice (hash48 emits
    // 48 bits). Both fail the job with a plan-level raise_error instead
    // of producing plausible-looking garbage; the check rides the same
    // 1-row broadcast the draws already consume, so it costs nothing.
    val diff = col("_hi") - col("_lo")
    val span = ids.agg(min(col("_cand")).as("_lo"),
      max(col("_cand")).as("_hi"))
      .select(col("_lo"), col("_hi"),
        when(diff < 0L || diff >= (1L << 48), raise_error(concat(
          lit("negativePairs: id span [" ), col("_lo"), lit(", "),
          col("_hi"), lit("] overflows Long or exceeds 2^48 — " +
            "re-key ids into a dense range first"))))
          .otherwise(diff + 1L).as("_span"))
    val draws = ids.select(col("_cand").as(idCol))
      .crossJoin(broadcast(span))
      .select(col(idCol), col("_lo"), col("_span"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .select(col(idCol), col("j").cast("long").as("j"),
        (col("_lo") + graft.functions.PortableHash.hash48(
          concat_ws(":", col(idCol), col("j")), seed) %
          col("_span")).as("neg_id"))
    draws
      .join(ids, draws("neg_id") === ids("_cand"))
      .filter(col("neg_id") =!= col(idCol))
      .select(col(idCol), col("j"), col("neg_id"))
  }

  def mixture(sources: Seq[(DataFrame, Double)], idCol: String,
      seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.zipWithIndex
      .map { case ((df, w), i) => hashSample(df, idCol, w, seed + 7919L * i) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Temperature-scaled per-group sampling weights — the multilingual /
    * multi-source rebalancing standard (mC4, XLM-R): group sampling
    * probability ∝ n^alpha with `alpha = 1/T ∈ (0, 1]`, which up-weights
    * small groups relative to their natural share (alpha = 1 reproduces
    * it; alpha → 0 approaches uniform-over-groups). `targetTotal` is the
    * desired output size; the per-group keep-rate is capped at 1 (a small
    * group can saturate — re-run with a lower target or accept the
    * shortfall, this function reports the cap honestly).
    *
    * One partial-agg groupBy + a 1-row broadcast crossJoin for the
    * normalizer — no window, no driver-side state. `alpha = 0.5` is
    * computed via `sqrt`, which IEEE-754 guarantees correctly rounded
    * (bit-identical on every engine), unlike the `pow` general path.
    *
    * @return (`group`, `n`, `p`, `rate`): natural count, temperature-
    *         scaled probability (sums to 1), capped keep-fraction. */
  def temperatureWeights(df: DataFrame, groupCol: String, alpha: Double,
      targetTotal: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(targetTotal > 0, "targetTotal must be > 0")
    val scale: Column => Column =
      if (alpha == 0.5) sqrt(_)
      else if (alpha == 1.0) identity
      else pow(_, alpha)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("_s", scale(col("n").cast("double")))
    counts.crossJoin(broadcast(counts.agg(sum(col("_s")).as("_tot"))))
      .select(col(groupCol), col("n"),
        (col("_s") / col("_tot")).as("p"),
        least(lit(1.0),
          lit(targetTotal.toDouble) * col("_s") / col("_tot") / col("n"))
          .as("rate"))
  }

  /** [[temperatureWeights]] applied: deterministic per-group Bernoulli
    * ([[hashSample]] semantics — seeded id-hash, so reproducible across
    * runs and cluster sizes) at each group's temperature rate. The rate
    * table is group-count-sized → broadcast; the corpus never shuffles. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetTotal: Long, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    val rates = temperatureWeights(df, groupCol, alpha, targetTotal)
      .select(col(groupCol), col("rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashBucket(col(idCol), seed, portable) <
        (col("rate") * Buckets).cast("long"))
      .drop("rate")
  }

  /** CCNet-style score bucketing (Wenzek et al. 2020): label every row
    * with its `scoreCol` ntile WITHIN `groupCol` (corpus-wide when None)
    * — the head/middle/tail split CCNet applies to per-language LM
    * perplexity, where `head` = best (LOWEST score). The window orders by
    * (score, `idCol`) — a TOTAL order, so the tiling is deterministic and
    * engine-portable even under score ties; pass an integerized score
    * (e.g. `ppl_e4`) when the buckets must agree bit-for-bit across
    * engines.
    *
    * Scale: one window sort per group — the same cost envelope as
    * [[percentileNormalize]]; for a pure keep/drop cut at extreme scale
    * prefer [[keepTopFraction]] (one percentile aggregate, no sort).
    *
    * @param labels bucket names, first = lowest scores; must have
    *               `nBuckets` entries (default head/middle/tail for 3).
    * @return input rows + (`bucket` 1-based long, `bucket_label`) */
  def scoreBuckets(df: DataFrame, scoreCol: String, idCol: String,
      nBuckets: Int = 3, groupCol: Option[String] = None,
      labels: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    require(labels.length == nBuckets,
      s"labels has ${labels.length} entries, expected $nBuckets")
    val w = (groupCol match {
      case Some(g) => org.apache.spark.sql.expressions.Window
        .partitionBy(col(g))
      case None => org.apache.spark.sql.expressions.Window.partitionBy()
    }).orderBy(col(scoreCol), col(idCol))
    val labelExpr = labels.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (name, i)) =>
        when(col("bucket") === (i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
      .withColumn("bucket_label", labelExpr)
  }

  /** Score-threshold calibration: keep rows whose `scoreCol` is at or
    * above the corpus's (1 − fraction) quantile — "keep the best 30% by
    * quality score" without knowing the score distribution in advance
    * (the quality-classifier keep-rate knob every curation recipe has).
    * Rows tied AT the cutoff are all kept, so the realized fraction can
    * exceed `fraction` under heavy ties (deterministic — never a random
    * tie-break). Null scores drop.
    *
    * Scale: the cutoff is ONE exact-percentile aggregate (1-row result,
    * broadcast back); the corpus itself never shuffles — plan is
    * scan → broadcast-join → filter. For sketchy-precision-at-scale use
    * `exact = false` (t-digest `approx_percentile`, bounded state). */
  def keepTopFraction(df: DataFrame, scoreCol: String, fraction: Double,
      exact: Boolean = true): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      "fraction must be in (0, 1]")
    val p = 1.0 - fraction
    val cutoff =
      if (exact) df.agg(expr(s"percentile($scoreCol, $p)").as("_cut"))
      else df.agg(percentile_approx(col(scoreCol), lit(p), lit(10000))
        .as("_cut"))
    df.crossJoin(broadcast(cutoff))
      .filter(col(scoreCol) >= col("_cut"))
      .drop("_cut")
  }

  /** Winsorization — clamp `valueCol` into its own [`pLo`, `pHi`]
    * exact-percentile band (the outlier treatment that KEEPS rows where
    * a filter would drop them: heavy-tail scores stop dominating
    * downstream means/mixture weights but every document survives).
    * Complements [[keepTopFraction]] (cut) and
    * [[graft.operators.Outliers]] (flag).
    *
    * Both cutoffs come from ONE percentile aggregate (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, bit-equal interpolation —
    * the [[keepTopFraction]] precedent) broadcast back; the clamp is a
    * narrow codegen projection — the corpus never shuffles.
    *
    * @return input columns + `(valueCol)_w` — the clamped value. */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double,
      pHi: Double): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1 (got [$pLo, $pHi])")
    val cuts = df.agg(
      expr(s"percentile($valueCol, $pLo)").as("_lo"),
      expr(s"percentile($valueCol, $pHi)").as("_hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("_lo")),
          col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Percentile-rank score normalization: append `pr` = percent_rank of
    * `scoreCol` within each `groupCol` partition (corpus-wide when
    * `groupCol` is None) — the "make heterogeneous quality signals
    * comparable" step before mixing sources: a perplexity in [20, 800]
    * and a classifier logit in [−4, 4] both land in [0, 1] with the same
    * meaning ("fraction of the group scored below").
    *
    * percent_rank = (rank − 1)/(n − 1) with ANSI rank ties (tied scores
    * share a rank), 0 for singleton groups — exact small-integer
    * arithmetic, identical on every engine. Ties need no tie-break
    * column: tied rows get the same pr by definition.
    *
    * Scale: one window sort per group. Fine when groups are bounded
    * (per-language, per-source); for a single corpus-wide group at
    * extreme scale prefer [[keepTopFraction]] (one percentile aggregate,
    * no sort) when the goal is just a cut. */
  def percentileNormalize(df: DataFrame, scoreCol: String,
      groupCol: Option[String] = None): DataFrame = {
    val w = groupCol match {
      case Some(g) => org.apache.spark.sql.expressions.Window
        .partitionBy(col(g)).orderBy(col(scoreCol))
      case None => org.apache.spark.sql.expressions.Window
        .partitionBy().orderBy(col(scoreCol))
    }
    df.withColumn("pr", percent_rank().over(w))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): choose raw documents
    * that LOOK LIKE a target corpus, by importance weights over hashed
    * token features.
    *
    *  1. featurize: token → md5-48 bucket in [0, `numBuckets`) — the
    *     hashed bag-of-ngrams of the paper, n = 1;
    *  2. fit two Laplace-smoothed bucket models: p̂ on `targetIds`' docs,
    *     q̂ on all of `docs`;
    *  3. per doc, log importance weight `lw = Σ_b c_b·(ln p̂(b) − ln q̂(b))`;
    *  4. Gumbel-top-`k` resample: keep the k largest
    *     `lw + Gumbel(md5-48(id))` — sampling WITHOUT replacement from
    *     the importance distribution, the paper's estimator, not a
    *     deterministic head that would pile onto one mode.
    *
    * Every stochastic choice is a seeded content hash (feature buckets:
    * `seed`; Gumbel uniforms: `seed + 1` on the doc id), so the selection
    * is rerun/partition-reproducible and SQL-auditable. Ranking happens
    * on the e4-INTEGERIZED perturbed score with doc-id tie-break — a
    * total order over exact longs, so engines agree bit-for-bit.
    *
    * Scale notes (100 TB raw corpus): tokenize+bucket is one narrow map;
    * both models are `numBuckets`-row aggregates (partial-agg, then a
    * BROADCAST of ≤ numBuckets rows — the raw corpus never reshuffles to
    * be scored); the top-k is a global sort LIMIT k, which Spark executes
    * as per-partition top-k + a k-row driver merge. Raw text never
    * shuffles: only (doc, bucket, count) rows move.
    *
    * Size `numBuckets` WELL BELOW the target corpus' token count: the
    * Laplace denominators are (total + numBuckets), so a bucket count
    * larger than the token mass washes the model toward uniform and the
    * weights toward 0 (at web scale the paper's 10⁴ buckets is
    * comfortably inside this; a 100-doc curated target is not).
    *
    * @param targetIds one-column DataFrame of doc ids belonging to the
    *                  target distribution (usually a small curated set).
    * @return the k selected rows: (`id`, `lw` — the unperturbed log
    *         importance weight, `score_e4` — integerized lw + Gumbel,
    *         the ranking key). */
  def dsirSample(docs: DataFrame, targetIds: DataFrame, idCol: String,
      textCol: String, k: Int, numBuckets: Int = 1024,
      seed: Long = 42L,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(numBuckets >= 2, "numBuckets must be >= 2")
    // materialized once: three consumers (both models + the scoring
    // join) would otherwise each re-run the tokenize scan of the corpus
    val feat = ckpt(docs
      .select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .select(col("id"),
        (graft.functions.PortableHash.hash48(col("token"), seed)
          % numBuckets).as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("c")))
    val tgt = targetIds
      .select(col(targetIds.columns.head).as("id")).distinct()
    val tCounts = feat.join(tgt, Seq("id"), "left_semi")
      .groupBy("b").agg(sum("c").as("tn"))
    val rCounts = feat.groupBy("b").agg(sum("c").as("rn"))
    val tTotal = tCounts.agg(sum("tn").as("tt"))
    val rTotal = rCounts.agg(sum("rn").as("rt"))
    // log-ratio per bucket: ≤ numBuckets rows, explicitly broadcast so
    // the (doc, bucket) table joins map-side
    val ratio = rCounts.join(tCounts, Seq("b"), "left")
      .crossJoin(broadcast(tTotal)).crossJoin(broadcast(rTotal))
      .select(col("b"),
        (log((coalesce(col("tn"), lit(0L)) + lit(1))
            .cast("double") / (col("tt") + numBuckets)) -
          log((col("rn") + lit(1)).cast("double")
            / (col("rt") + numBuckets))).as("lr"))
    val lw = feat.join(broadcast(ratio), Seq("b"))
      .groupBy("id").agg(sum(col("c") * col("lr")).as("lw"))
    // Gumbel(0,1) = −ln(−ln u), u ∈ (0,1) from the id hash — +0.5
    // keeps u strictly inside the interval
    val u = (graft.functions.PortableHash.hash48(col("id"), seed + 1)
      .cast("double") + lit(0.5)) / lit(PortableHash48Space)
    lw.select(col("id"), col("lw"),
        floor((col("lw") - log(-log(u))) * lit(1e4) + lit(0.5))
          .cast("long").as("score_e4"))
      .orderBy(col("score_e4").desc, col("id"))
      .limit(k)
  }

  private val PortableHash48Space: Double =
    graft.functions.PortableHash.Space.toDouble
}
