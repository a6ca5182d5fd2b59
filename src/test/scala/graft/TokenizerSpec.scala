package graft

import graft.operators.Tokenizer

/** BPE merge induction vs hand-computed merge tables. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // words: "ab" ×3, "abc" ×1
  private lazy val docs =
    Seq((1L, "ab ab"), (2L, "ab abc")).toDF("id", "text")

  test("bpeMerges: hand-computed merge order, tie-break, early exhaustion") {
    // r1 pairs: (a,b):4 (b,</w>):3 (b,c):1 (c,</w>):1 → (a,b)
    // r2: (ab,</w>):3 (ab,c):1 (c,</w>):1           → (ab,</w>)
    // r3: (ab,c):1 (c,</w>):1 — tie, left asc       → (ab,c)
    // r4: (abc,</w>):1                              → (abc,</w>)
    // r5: no pairs left → sentinel no-op, table ends at 4 rows
    val (merges, vocab) = Tokenizer.bpeMerges(docs, "text", numMerges = 5)
    val m = merges.orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (1L, "a", "b", 4L),
      (2L, "ab", "</w>", 3L),
      (3L, "ab", "c", 1L),
      (4L, "abc", "</w>", 1L)))
    val v = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(v("ab") == Seq("ab</w>"))
    assert(v("abc") == Seq("abc</w>"))
  }

  test("bpeMerges: greedy left-to-right, no chain through a fresh merge") {
    // "aaa" → [a,a,a,</w>]; merge (a,a) pairs greedily from the left:
    // [aa, a, </w>], NOT [a, aa, </w>] and NOT a re-merge into [aaa...]
    val (merges, vocab) =
      Tokenizer.bpeMerges(Seq((1L, "aaa")).toDF("id", "text"), "text",
        numMerges = 1)
    val m = merges.collect().map(r =>
      (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(("a", "a", 2L)))
    assert(vocab.collect().head.getSeq[String](1) == Seq("aa", "a", "</w>"))
  }

  test("bpeEncode: subword totals under the learned vocab, OOV fallback") {
    val (_, vocab) = Tokenizer.bpeMerges(docs, "text", numMerges = 5)
    val enc = Tokenizer.bpeEncode(
      Seq((9L, "ab abc zz")).toDF("id", "text"), "id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ab→1 sym, abc→1 sym, zz unseen → len+1 = 3
    assert(enc.toSeq == Seq((9L, 3L, 5L)))
  }

  test("bpeMerges composes from argv-sized inputs without eager corpus " +
      "jobs beyond the checkpoint rounds") {
    val (merges, _) = Tokenizer.bpeMerges(docs, "text", numMerges = 2)
    assert(merges.columns.toSeq ==
      Seq("merge_rank", "left", "right", "pair_count"))
  }
}
