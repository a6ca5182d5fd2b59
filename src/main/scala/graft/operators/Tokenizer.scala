package graft.operators

import graft.Checkpointer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the tokenizer-vocabulary
  * primitive (Sennrich et al. 2016) a training-data pipeline runs over
  * its corpus before any token budget, packing, or perplexity work is
  * meaningful. [[bpeMerges]] LEARNS the merge table; [[bpeEncode]]
  * applies it, yielding per-document subword counts under the induced
  * vocabulary.
  *
  * The classic scaling trick is structural here: all iteration state
  * lives on the (word, count) VOCABULARY table, never the corpus — one
  * corpus scan builds the vocab, and every merge round after that is
  * vocab-sized (tens of thousands of rows at web scale, independent of
  * corpus size). Per round: one narrow adjacent-pair explode + partial
  * aggregate, a 1-row argmax (count desc, pair asc — a total order, so
  * the learned table is partitioning-invariant), broadcast back as a
  * cross join, and a codegen `aggregate` fold that re-segments each
  * word's symbol array greedily left-to-right — the exact semantics of
  * the reference BPE implementations. The fold starts from an empty
  * accumulator and always appends its first symbol, so a fold seeded
  * with the first element (DuckDB `list_reduce`) reproduces it exactly —
  * that is what makes the learned table oracle-checkable.
  *
  * Each round's vocab is checkpointed (pluggable [[Checkpointer]]), so
  * the plan does not double per merge and cluster runs survive executor
  * loss with [[Checkpointer.Reliable]].
  */
object Tokenizer {

  /** Word-final marker, appended as its own symbol so merges can learn
    * suffixes ("er&lt;/w&gt;") distinct from infixes — standard BPE. */
  val EndOfWord = "</w>"

  /** One corpus scan → (word, syms, wc): whitespace words, counted, each
    * split into single-character symbols plus the [[EndOfWord]] marker. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("wc"))
      .select(col("word"),
        concat(split(col("word"), ""), array(lit(EndOfWord))).as("syms"),
        col("wc"))

  /** Learn `numMerges` BPE merges over `docs(textCol)`.
    *
    * Returns `(merges, vocab)`: `merges` is the ordered merge table
    * (merge_rank 1..k, left, right, pair_count — the pair's corpus
    * frequency when it was chosen), `vocab` the final segmentation
    * (word, syms, wc) under all learned merges. If the vocabulary
    * exhausts its pairs early (every word a single symbol), remaining
    * rounds are no-ops and the merge table simply ends short — the
    * sentinel guard keeps the plan total rather than annihilating the
    * vocab on an empty cross join. */
  def bpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      ckpt: Checkpointer = Checkpointer.Local): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    var vocab = ckpt(wordVocab(docs, textCol))
    val bests = Seq.newBuilder[DataFrame]
    for (k <- 1 to numMerges) {
      val prs = transform(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        (s, i) => struct(s.as("l"), element_at(col("syms"), i + 2).as("r")))
      val pairs = vocab
        .select(explode(prs).as("_p"), col("wc"))
        .groupBy(col("_p.l").as("left"), col("_p.r").as("right"))
        .agg(sum("wc").as("pair_count"))
      // Sentinel (null, null, -1) survives the argmax ONLY when no pair
      // exists; the fold's null condition then never fires (no-op round)
      // and the -1 row is filtered from the merge table below.
      val sentinel = spark.range(1).select(
        lit(null).cast("string").as("left"),
        lit(null).cast("string").as("right"),
        lit(-1L).as("pair_count"))
      val best = ckpt(pairs.unionByName(sentinel)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1)
        .select(lit(k.toLong).as("merge_rank"), col("left"), col("right"),
          col("pair_count")))
      bests += best
      // Greedy left-to-right re-segmentation: merge every adjacent
      // (left, right) occurrence; a just-merged symbol is its CONCAT, so
      // it can only chain where real BPE would chain. `get` (0-based,
      // null on out-of-bounds) keeps the empty-accumulator probe
      // ANSI-safe.
      val folded = aggregate(col("syms"),
        array().cast("array<string>"),
        (acc, x) => when(
          get(acc, size(acc) - 1) === col("_ml") && x === col("_mr"),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(col("_ml"), col("_mr")))))
          .otherwise(concat(acc, array(x))))
      vocab = ckpt(vocab
        .crossJoin(broadcast(best.select(col("left").as("_ml"),
          col("right").as("_mr"))))
        .select(col("word"), folded.as("syms"), col("wc")))
    }
    val merges = bests.result().reduce(_ unionByName _)
      .filter(col("pair_count") >= 0)
    (merges, vocab)
  }

  /** Apply a learned segmentation: per-doc word and subword totals under
    * `vocab` (the second half of [[bpeMerges]]'s result). The vocab side
    * broadcasts (it is vocabulary-sized); the corpus never shuffles —
    * words explode narrowly, join against the broadcast, and partial-agg
    * back to one row per doc. Words unseen at training time fall back to
    * character count + 1 (their untrained segmentation). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+"))
        .as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(vocab.select(col("word"),
        size(col("syms")).as("_len"))), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("_len"), length(col("word")) + lit(1)))
          .as("n_subwords"))
}
