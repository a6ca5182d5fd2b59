package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap an
  * evaluation set, the step every serious LLM data pipeline runs between
  * dedup and export (eval answers leaking into training data inflate
  * benchmark scores).
  *
  * Overlap = number of DISTINCT whitespace-token n-gram shingles
  * ([[Dedup.shingles]], codegen'd) shared between a corpus doc and a
  * benchmark doc. Real pipelines use long shingles (n = 8..13) so any
  * match is near-verbatim leakage.
  *
  * Scale notes (100 TB corpus vs ~10^4-doc benchmark): the benchmark
  * shingle side is tiny → broadcast by default, so the corpus never
  * shuffles — the scan streams past an in-memory hash of bench shingles.
  * `array_distinct` runs BEFORE the explode, bounding each doc's join
  * input by its vocabulary. `maxBenchDocFreq` drops shingles present in
  * many benchmark docs (boilerplate instructions, common phrases) — the
  * stop-shingle guard that keeps a hot shingle from fanning out against
  * the whole corpus.
  */
object Decontaminate {

  /** (corpus doc, benchmark doc, overlap) for every pair sharing at least
    * `minOverlap` distinct shingles. Output: `doc_id`, `bench_id`,
    * `n_overlap`. */
  def contaminationPairs(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      shingleSize: Int, minOverlap: Int = 1,
      maxBenchDocFreq: Option[Int] = None,
      broadcastBench: Boolean = true): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val d = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), shingleSize)))
        .as("_sh"))
    val b0 = bench.select(col(benchIdCol).as("bench_id"),
      explode(array_distinct(Dedup.shingles(col(benchTextCol), shingleSize)))
        .as("_sh"))
    val b1 = maxBenchDocFreq match {
      case Some(maxDf) =>
        // per-shingle bench doc-frequency over the (small) bench side only
        val df = b0.groupBy("_sh").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDf).select("_sh")
        b0.join(broadcast(df), Seq("_sh"))
      case None => b0
    }
    val b = if (broadcastBench) broadcast(b1) else b1
    d.join(b, Seq("_sh"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** [[contaminationPairs]] with a hash prefilter — the 100 TB scale path
    * when the benchmark's shingle set is too large to broadcast as
    * strings. Two stages, exact end result:
    *
    *  1. PREFILTER: broadcast only the DISTINCT 64-bit `xxhash64` values
    *     of the bench shingles (8 bytes each — ~10× smaller than the
    *     strings) and hash-join the corpus shingle stream against them.
    *     Survivors are the true matches plus a vanishing fraction of
    *     64-bit collisions.
    *  2. VERIFY: shuffle-join the (tiny) survivor set against the bench
    *     shingles on the exact string. No broadcast of strings ever
    *     happens, and the shuffle moves only survivors.
    *
    * Output and semantics identical to [[contaminationPairs]] — collisions
    * cannot produce false pairs because stage 2 compares the real
    * shingles. */
  def contaminationPairsHashed(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      shingleSize: Int, minOverlap: Int = 1,
      maxBenchDocFreq: Option[Int] = None): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val d = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), shingleSize)))
        .as("_sh"))
    val b0 = bench.select(col(benchIdCol).as("bench_id"),
      explode(array_distinct(Dedup.shingles(col(benchTextCol), shingleSize)))
        .as("_sh"))
    val b1 = maxBenchDocFreq match {
      case Some(maxDf) =>
        val df = b0.groupBy("_sh").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDf).select("_sh")
        b0.join(broadcast(df), Seq("_sh"))
      case None => b0
    }
    val benchHashes = b1.select(xxhash64(col("_sh")).as("_h")).distinct()
    val survivors = d.withColumn("_h", xxhash64(col("_sh")))
      .join(broadcast(benchHashes), Seq("_h"))
      .drop("_h")
    survivors.join(b1, Seq("_sh")) // exact verify, survivors only
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** [[contaminationPairs]] behind a Bloom-filter prefilter — the THIRD
    * scale tier. Broadcast sizes per bench shingle: exact path ≈ the
    * string (~30 B), hashed path 8 B, Bloom ~10 BITS. Three stages,
    * exact end result:
    *
    *  1. BUILD: one aggregate row of `binary` — every bench doc folds its
    *     shingles into a partition-local bitset ([[graft.functions
    *     .BloomShingleAgg]]), partials OR-merge. No explode, no shuffle
    *     beyond the tiny all-to-one merge.
    *  2. PREFILTER: the corpus streams past the broadcast filter inside
    *     whole-stage codegen ([[graft.functions.BloomCountShingles]] —
    *     a narrow per-row probe, the shingle stream never materializes).
    *     Docs with zero probing shingles are provably clean and drop
    *     here; survivors are true candidates plus the Bloom
    *     false-positive fraction (~(1 − e^(−kn/m))^k).
    *  3. VERIFY: [[contaminationPairs]] on the survivors only — false
    *     positives cannot reach the output.
    *
    * The Bloom build ignores `maxBenchDocFreq` (a stop-shingle can't be
    * identified inside a bitset) — that filter applies at the verify
    * stage, so the prefilter passes a superset and the result is still
    * exact. */
  def contaminationPairsBloom(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      shingleSize: Int, minOverlap: Int = 1,
      numBits: Int = 1 << 22, numHashes: Int = 5,
      maxBenchDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val bloom = bench
      .agg(ColumnShim.column(graft.functions.BloomShingleAgg(
        ColumnShim.expression(col(benchTextCol)), shingleSize, numBits,
        numHashes).toAggregateExpression()).as("_bloom"))
    val candidates = docs.crossJoin(broadcast(bloom))
      .filter(ColumnShim.column(graft.functions.BloomCountShingles(
        ColumnShim.expression(col(textCol)),
        ColumnShim.expression(col("_bloom")), shingleSize, numHashes)) > 0)
      .drop("_bloom")
    contaminationPairs(candidates, textCol, idCol,
      bench, benchTextCol, benchIdCol, shingleSize, minOverlap,
      maxBenchDocFreq)
  }

  /** The corpus minus every doc flagged by [[contaminationPairs]] — the
    * "clean training set" projection (anti-join on flagged ids). */
  def decontaminate(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      shingleSize: Int, minOverlap: Int = 1,
      maxBenchDocFreq: Option[Int] = None): DataFrame = {
    val flagged = contaminationPairs(docs, textCol, idCol,
      bench, benchTextCol, benchIdCol, shingleSize, minOverlap,
      maxBenchDocFreq)
      .select(col("doc_id").as("_flagged_id")).distinct()
    docs.join(flagged, docs(idCol) === col("_flagged_id"), "left_anti")
  }

  /** Per-document contamination FRACTION — the graded report behind
    * [[decontaminate]]'s binary verdict, and the number threshold-based
    * policies (e.g. "drop when > 10% of a doc's n-grams appear in any
    * benchmark") are tuned on: for each corpus doc, its distinct
    * shingle count, how many of those shingles appear anywhere in the
    * benchmark, and the ratio. A doc shorter than `shingleSize` tokens
    * has no shingles and no row — it cannot overlap, and emitting a
    * 0/0 row would invent a fraction.
    *
    * Scale notes (100 TB corpus): the bench side collapses to its
    * DISTINCT shingle set and broadcasts (one string per shingle —
    * for benchmarks too large for that, hash both sides first as in
    * [[contaminationPairsHashed]]); the corpus-side aggregate is a
    * per-doc groupBy with map-side combine. The corpus text never
    * shuffles — only (doc_id, shingle) pairs.
    *
    * @return (`doc_id`, `n_shingles`, `n_contaminated`,
    *         `contaminated_frac`) */
  def contaminationReport(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String,
      shingleSize: Int, broadcastBench: Boolean = true): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), shingleSize)))
        .as("_sh"))
    val b0 = bench.select(
        explode(array_distinct(
          Dedup.shingles(col(benchTextCol), shingleSize))).as("_sh"))
      .distinct()
    val b = if (broadcastBench) broadcast(b0) else b0
    d.join(b.withColumn("_hit", lit(1)), Seq("_sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long")
          .as("n_contaminated"))
      .withColumn("contaminated_frac",
        col("n_contaminated").cast("double") /
          col("n_shingles").cast("double"))
  }

  /** Per-domain contamination attribution — the "which source leaked
    * the benchmark" report curators actually run after
    * [[contaminationReport]] flags leakage: every document maps to its
    * lowercased host ([[Curation.urlHost]] on `urlCol` — the same
    * portable extraction [[Curation.domainCap]] keys on), and the
    * per-doc report rolls up per domain: how many of the domain's docs
    * leak at all, and what fraction of its shingle mass is benchmark
    * text. A crawl source whose `doc_frac` is high gets DROPPED from
    * the mix; one with a few hot docs gets span-scrubbed — this report
    * is the decision input for that fork.
    *
    * Docs too short to form a single shingle carry 0/0 rows (they
    * cannot leak at the shingle level) — they still count in `n_docs`,
    * and a domain of only such docs reports a NULL `shingle_frac`
    * rather than a fake zero.
    *
    * Scale notes (100 TB): [[contaminationReport]]'s broadcast
    * semi-join shape unchanged (bench shingles broadcast, corpus
    * scanned once); the host map is a narrow codegen'd regex; the
    * rollup is one partial-agg groupBy on the domain key — hot
    * domains are groupBy keys, AQE splits them.
    *
    * @return (`domain`, `n_docs`, `n_contaminated_docs`,
    *         `n_shingles`, `n_contaminated_shingles`, `doc_frac`,
    *         `shingle_frac` — null when the domain has no shingles) */
  def contaminationByDomain(
      docs: DataFrame, textCol: String, idCol: String, urlCol: String,
      bench: DataFrame, benchTextCol: String,
      shingleSize: Int, broadcastBench: Boolean = true): DataFrame = {
    val rep = contaminationReport(docs, textCol, idCol, bench,
      benchTextCol, shingleSize, broadcastBench)
    docs.select(col(idCol).as("doc_id"),
        lower(Curation.urlHost(col(urlCol))).as("domain"))
      .join(rep, Seq("doc_id"), "left")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("n_contaminated"), lit(0L)) > 0L, lit(1L))
          .otherwise(lit(0L))).as("n_contaminated_docs"),
        sum(coalesce(col("n_shingles"), lit(0L))).as("n_shingles"),
        sum(coalesce(col("n_contaminated"), lit(0L)))
          .as("n_contaminated_shingles"))
      .withColumn("doc_frac",
        col("n_contaminated_docs").cast("double") /
          col("n_docs").cast("double"))
      .withColumn("shingle_frac",
        when(col("n_shingles") > 0L,
          col("n_contaminated_shingles").cast("double") /
            col("n_shingles").cast("double")))
  }

  /** SPAN-level decontamination — scrub the contaminated text instead
    * of dropping the document: every corpus token covered by a shingle
    * that also appears in the benchmark is removed and the survivors
    * reassemble in order (the [[graft.operators.Dedup
    * .removeDuplicateSpans]] kernel, with the duplicate-hash set
    * replaced by the BENCH shingle set). The middle ground between
    * [[decontaminate]]'s whole-doc drop and keeping leakage: a long
    * document that quotes one benchmark item loses the quote, not its
    * other ten thousand tokens — the standard span-scrub policy for
    * high-value documents.
    *
    * Scale notes (100 TB corpus vs ~10^5-shingle benchmark): the bench
    * shingle hashes broadcast once (32-byte hashes, never text); the
    * corpus pays one shingle explode + a broadcast semi-join + the
    * per-doc reassembly groupBy — raw text shuffles ONCE, in the
    * rebuild, and only for docs that keep at least one token. Coverage
    * expansion is a bounded explode (shingleSize rows per CONTAMINATED
    * occurrence only).
    *
    * @return one row per input doc: (`idCol`, `clean_text`,
    *         `n_tokens`, `n_removed`) — clean_text is '' when every
    *         token was covered */
  def scrubContaminatedSpans(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String,
      shingleSize: Int = 3): DataFrame = {
    require(shingleSize >= 1, "shingleSize must be >= 1")
    val benchHashes = bench.select(
        explode(array_distinct(
          Dedup.shingles(col(benchTextCol), shingleSize))).as("_sh"))
      .select(sha2(col("_sh"), 256).as("_h")).distinct()
    val occ = docs
      .select(col(idCol).as("_id"),
        posexplode(Dedup.shingles(col(textCol), shingleSize))
          .as(Seq("_pos", "_sh")))
      .select(col("_id"), col("_pos"), sha2(col("_sh"), 256).as("_h"))
    val covered = occ.join(broadcast(benchHashes), Seq("_h"), "left_semi")
      .select(col("_id"),
        explode(sequence(col("_pos"),
          col("_pos") + lit(shingleSize - 1))).as("_tp"))
    // Shared in-place rebuild (Dedup.scrubCoveredTokens): per-doc
    // covered-position sets + higher-order array deletion — document
    // text never shuffles, unlike the old token-explode + anti-join +
    // collect_list reassembly (which moved every token of every doc
    // twice). Position indexing contract unchanged (maximal non-\s
    // runs, 0-based, HOF-filtered before indexing).
    Dedup.scrubCoveredTokens(docs, textCol, idCol, covered)
  }

  /** Embedding-space decontamination: (corpus doc, benchmark doc, cosine)
    * for every pair with cosine ≥ `threshold` — the semantic sibling of
    * [[contaminationPairs]] that catches PARAPHRASED eval leakage no
    * n-gram overlap can see (translated benchmark items, reworded
    * questions, number-substituted math problems).
    *
    * Scale notes (100 TB corpus vs ~10^4-embedding benchmark): default is
    * a broadcast nested loop — the bench side ships to every executor
    * once and the corpus NEVER shuffles; per-row cost is O(|bench|·dim)
    * codegen'd flops. When the bench side is too large for that, pass
    * `bits = Some(b)`: both sides hash to random-hyperplane buckets and
    * only colliding pairs are scored (recall < 1; `probes` single-bit
    * flips on the bench side claw back borderline pairs, each probe a
    * disjoint bucket so no pair is ever produced twice).
    *
    * Output: `doc_id`, `bench_id`, `cosine`. */
  def semanticContaminationPairs(
      docs: DataFrame, vecCol: String, idCol: String,
      bench: DataFrame, benchVecCol: String, benchIdCol: String,
      threshold: Double, bits: Option[Int] = None,
      probes: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions
    val d0 = docs.select(col(idCol).as("doc_id"), col(vecCol).as("_vd"))
    val b0 = bench.select(col(benchIdCol).as("bench_id"),
      col(benchVecCol).as("_vb"))
    val joined = bits match {
      case None => d0.crossJoin(broadcast(b0))
      case Some(nb) =>
        val probeBuckets = {
          val bb = VectorFunctions.hyperplane_bucket(col("_vb"), nb)
          array((bb +: (0 until math.min(probes, nb)).map(p =>
            bb.bitwiseXOR(lit(1 << p)))): _*)
        }
        d0.withColumn("_bk",
            VectorFunctions.hyperplane_bucket(col("_vd"), nb))
          .join(broadcast(b0.select(col("bench_id"), col("_vb"),
            explode(probeBuckets).as("_bk"))), Seq("_bk"))
          .drop("_bk")
    }
    joined
      .select(col("doc_id"), col("bench_id"),
        VectorFunctions.cosine(col("_vd"), col("_vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The corpus minus every doc flagged by
    * [[semanticContaminationPairs]] — same anti-join projection as
    * [[decontaminate]], keyed on embeddings instead of shingles. */
  def decontaminateSemantic(
      docs: DataFrame, vecCol: String, idCol: String,
      bench: DataFrame, benchVecCol: String, benchIdCol: String,
      threshold: Double, bits: Option[Int] = None,
      probes: Int = 0): DataFrame = {
    val flagged = semanticContaminationPairs(docs, vecCol, idCol,
      bench, benchVecCol, benchIdCol, threshold, bits, probes)
      .select(col("doc_id").as("_flagged_id")).distinct()
    docs.join(flagged, docs(idCol) === col("_flagged_id"), "left_anti")
  }
}
