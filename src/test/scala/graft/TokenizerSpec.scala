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

  test("unigramCandidates: occurrence-weighted substring counts, " +
      "single chars unconditional, top-V by (freq, piece)") {
    // "abab"×2, "ba"×1: substrings of abab (L=3): a×2,b×2,ab×2,ba×1,
    // aba×1,bab×1 per occurrence, ×2 docs-count... hand-count below
    val d = Seq((1L, "abab abab ba")).toDF("id", "text")
    val out = Tokenizer.unigramCandidates(d, "text", maxPieceLen = 3,
        minFreq = 2L, maxVocab = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab (wc 2): a@1,a@3 b@2,b@4 ab@1,ab@3 ba@2 aba@1 bab@2;
    // ba (wc 1): b@1 a@2 ba@1
    assert(out("a") == 5L && out("b") == 5L)
    // multi-char, freq ≥ 2, top-2 by (freq desc, piece): ab(4), aba(2)
    // beats ba(3)? no — ba freq 3 > aba 2 → top-2 = ab(4), ba(3)
    assert(out.get("ab").contains(4L) && out.get("ba").contains(3L))
    assert(!out.contains("aba") && !out.contains("bab"))
    // single chars always survive even below minFreq
    val tiny = Tokenizer.unigramCandidates(
        Seq((1L, "xy")).toDF("id", "text"), "text", 3, 5L, 4)
      .collect().map(_.getString(0)).toSet
    assert(tiny == Set("x", "y"))
  }

  test("viterbiSegment: cost equals exhaustive left-folded enumeration " +
      "bit-for-bit; pieces concat to the word; unseen chars price as " +
      "unk; partitioning-invariant") {
    val priced = Tokenizer.withCosts(Seq(("a", 10L), ("b", 5L),
      ("ab", 8L), ("ba", 2L), ("aba", 1L), ("bb", 7L))
      .toDF("piece", "count"))
    val costs = priced.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val unk = costs.values.max + 1.0
    // all segmentations, cost summed LEFT-TO-RIGHT (the DP's
    // association) — min over the same doubles is bit-equal
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.take(l)
        val known = if (l == 1) true else costs.contains(p)
        if (known) segs(w.drop(l)).map(p +: _) else Seq.empty
      }
    def segCost(s: Seq[String]): Double =
      s.foldLeft(0.0)((acc, p) =>
        acc + costs.getOrElse(p, if (p.length == 1) unk
          else Double.NaN))
    val words = Seq("abab", "aababa", "bbbb", "a", "xyza", "abba")
    val out = Tokenizer.viterbiSegment(
        words.map(w => (w, 1L)).toDF("word", "wc").repartition(7),
        priced, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](2), r.getDouble(3)))).toMap
    for (w <- words) {
      val (pieces, cost) = out(w)
      assert(pieces.mkString("") == w, s"concat invariant broke on $w")
      val expected = segs(w).map(segCost).min
      assert(cost == expected,
        s"$w: dp=$cost enumerated=$expected")
      assert(cost == segCost(pieces), "reported cost prices its pieces")
    }
    // unseen chars: "xyza" must still segment (unk-priced singles)
    assert(out("xyza")._1.forall(_.length == 1))
    // partition invariance: same frame, one partition
    val one = Tokenizer.viterbiSegment(
        words.map(w => (w, 1L)).toDF("word", "wc").repartition(1),
        priced, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](2), r.getDouble(3)))).toMap
    assert(one == out)
  }

  test("WordStore maintenance: maintained counts equal a rebuild over " +
      "the post-change corpus, both inducers serve off it bit-equal, " +
      "and the guards refuse corrupt maintenance") {
    import org.apache.spark.sql.functions.col
    val base = Seq((1L, "ab ab cd"), (2L, "ab ef"), (3L, "cd cd gh"),
      (4L, "ab gh")).toDF("id", "text")
    val store = Tokenizer.buildWordStore(base, "id", "text")
    // takedown doc 3 (text ships), add doc 5, REPLACE doc 2 (old row
    // ships; new text differs)
    val adds = Seq((5L, "ij ab"), (2L, "kl kl")).toDF("id", "text")
    val rems = Seq((3L, "cd cd gh"), (2L, "ab ef")).toDF("id", "text")
    val m = Tokenizer.maintainWordStore(store, adds, rems, "id", "text")
    val post = Seq((1L, "ab ab cd"), (2L, "kl kl"), (4L, "ab gh"),
      (5L, "ij ab")).toDF("id", "text")
    val fresh = Tokenizer.buildWordStore(post, "id", "text")
    def wmap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wmap(m.words) == wmap(fresh.words),
      "maintained word table ≡ rebuild")
    assert(m.docs.collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L, 5L))
    // both inducers serve identically off the maintained table
    val (mm, _) = Tokenizer.bpeMergesFromWords(m.words, numMerges = 3)
    val (fm, _) = Tokenizer.bpeMerges(post, "text", numMerges = 3)
    def mrows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    assert(mrows(mm) == mrows(fm), "maintained merges ≡ fresh build")
    val mc = Tokenizer.unigramCandidatesFromWords(m.words,
      maxPieceLen = 2, minFreq = 2L, maxVocab = 10)
    val fc = Tokenizer.unigramCandidates(post, "text",
      maxPieceLen = 2, minFreq = 2L, maxVocab = 10)
    def cmap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cmap(mc) == cmap(fc), "maintained candidates ≡ fresh build")
    // unknown-id takedown no-ops (nothing subtracts)
    val noop = Tokenizer.maintainWordStore(store,
      base.limit(0), Seq((99L, "zz zz")).toDF("id", "text"),
      "id", "text")
    assert(wmap(noop.words) == wmap(store.words))
    // live re-add WITHOUT its old row fails loudly
    val clash = intercept[Exception] {
      Tokenizer.maintainWordStore(store,
        Seq((2L, "new text")).toDF("id", "text"), base.limit(0),
        "id", "text").words.collect()
    }
    assert((Option(clash.getMessage).getOrElse("") +
      Option(clash.getCause).map(_.getMessage).getOrElse(""))
      .contains("re-add of a live id"))
    // erasure text that doesn't match the counted truth fails loudly
    val neg = intercept[Exception] {
      Tokenizer.maintainWordStore(store, base.limit(0),
        Seq((3L, "cd cd cd cd gh")).toDF("id", "text"),
        "id", "text").words.collect()
    }
    assert((Option(neg.getMessage).getOrElse("") +
      Option(neg.getCause).map(_.getMessage).getOrElse(""))
      .contains("went negative"))
    // save/load round-trip serves the same table
    val dir = java.nio.file.Files
      .createTempDirectory("graft_words").toString
    Tokenizer.saveWordStore(m, dir)
    val loaded = Tokenizer.loadWordStore(spark, dir)
    assert(wmap(loaded.words) == wmap(m.words))
    assert(loaded.docs.count() == 4L)
    // zero-count words left the table entirely; survivors decremented
    val mw = wmap(m.words)
    assert(!mw.contains("ef") && mw("cd") == 1L && mw("kl") == 2L)
  }

  test("unigramTrain + unigramEncode: planted repetition concentrates " +
      "mass on the reused piece and compresses below characters") {
    val d = Seq((1L, "abab abab abab ab"), (2L, "abab ab abab"),
      (3L, "zq")).toDF("id", "text")
    val vocab = Tokenizer.unigramTrain(d, "text", rounds = 3,
      maxPieceLen = 4, minFreq = 2L, maxVocab = 16)
    val counts = vocab.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the reused multi-char piece dominates the singles it replaces
    assert(counts.getOrElse("abab", 0L) + counts.getOrElse("ab", 0L) >
      counts("a") && counts.keySet.contains("abab"))
    val enc = Tokenizer.unigramEncode(d, "id", "text", vocab,
        maxPieceLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // doc 1: 4 words, 16 chars — multi-char pieces must compress
    assert(enc(0)._2 == 4L && enc(0)._3 < 16L)
    // unseen-alphabet doc stays total: 1 word, ≤ 2 unk-priced singles
    assert(enc(2)._2 == 1L && enc(2)._3 <= 2L)
    // determinism: retrain yields the identical vocab
    val again = Tokenizer.unigramTrain(d, "text", rounds = 3,
        maxPieceLen = 4, minFreq = 2L, maxVocab = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }
}
