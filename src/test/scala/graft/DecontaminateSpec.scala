package graft

import graft.operators.Decontaminate

/** Benchmark-decontamination semantics: verbatim leakage flags, clean docs
  * survive, thresholds and the stop-shingle guard behave. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "what is the capital of france paris is the answer"),
    (101L, "solve two plus two equals four exactly"))
    .toDF("qid", "question")

  private lazy val corpus = Seq(
    // verbatim bench sentence embedded -> contaminated
    (1L, "trivia dump what is the capital of france paris is the answer ok"),
    // clean prose, no 4-gram overlap
    (2L, "the quick brown fox jumps over the lazy dog"),
    // shares only a short phrase, below the 4-gram radar
    (3L, "the capital city grew quickly last year"))
    .toDF("doc_id", "text")

  test("scrubContaminatedSpans: quoted benchmark spans are removed in " +
      "place, clean docs untouched, fully-quoted docs empty out, " +
      "short docs pass through") {
    import org.apache.spark.sql.functions.col
    val b = Seq((100L, "x y z w")).toDF("qid", "question")
    val docs = Seq(
      (1L, "p q x y z w r"), // quotes the bench — loses the quote
      (2L, "hello world foo bar"), // clean
      (3L, "x y z w"), // nothing but the quote
      (4L, "hi yo")) // shorter than the shingle — no shingles
      .toDF("doc_id", "text")
    val out = Decontaminate.scrubContaminatedSpans(docs, "text",
        "doc_id", b, "question", shingleSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // shingles at pos 2 ("x y z") and 3 ("y z w") match → tokens 2..5
    // covered → "p q r" survives
    assert(out(1L) == (("p q r", 7L, 4L)))
    assert(out(2L) == (("hello world foo bar", 4L, 0L)))
    assert(out(3L) == (("", 4L, 4L)))
    assert(out(4L) == (("hi yo", 2L, 0L)))
  }

  test("verbatim leakage is flagged; clean docs are not") {
    val pairs = Decontaminate.contaminationPairs(
      corpus, "text", "doc_id", bench, "question", "qid",
      shingleSize = 4)
    val flagged = pairs.select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L))
    val hit = pairs.filter($"doc_id" === 1L).head()
    assert(hit.getAs[Long]("bench_id") == 100L)
    assert(hit.getAs[Long]("n_overlap") >= 5) // long verbatim run
  }

  test("contaminationReport: exact per-doc shingle fractions") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles {a b c, b c d} — one in bench
      (2L, "x y z w v"),   // {x y z, y z w, z w v} — clean
      (3L, "a b"))         // shorter than the shingle — no row
      .toDF("doc_id", "text")
    val bench = Seq((100L, "q b c d e")).toDF("qid", "q") // {q b c, b c d, c d e}
    val rep = Decontaminate.contaminationReport(docs, "text", "doc_id",
      bench, "q", shingleSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rep == Map(1L -> ((2L, 1L, 0.5)), 2L -> ((3L, 0L, 0.0))))
    // repeated shingles in a doc count once (distinct per doc)
    val rep2 = Decontaminate.contaminationReport(
      Seq((9L, "b c d b c d")).toDF("doc_id", "text"), "text", "doc_id",
      bench, "q", shingleSize = 3).head()
    // tokens b,c,d,b,c,d → distinct {b c d, c d b, d b c}; "b c d"
    // appears twice but counts once
    assert(rep2.getLong(1) == 3L && rep2.getLong(2) == 1L)
  }

  test("contaminationByDomain: leaked-doc and leaked-shingle fractions " +
      "roll up per host; zero-shingle docs count in n_docs; an " +
      "all-shingleless domain reports null shingle_frac") {
    val docs = Seq(
      (1L, "a b c d", "https://Evil.example.com/p/1"), // 2 sh, 1 hit
      (2L, "x y z w v", "https://evil.example.com/p/2"), // 3 sh, clean
      (3L, "a b", "https://evil.example.com/p/3"), // no shingle
      (4L, "p q r s", "http://clean.example.org/a"), // 2 sh, clean
      (5L, "hi", "https://tiny.example.net/")) // no shingle at all
      .toDF("doc_id", "text", "url")
    val bench = Seq((100L, "q b c d e")).toDF("qid", "q")
    val out = Decontaminate.contaminationByDomain(docs, "text",
      "doc_id", "url", bench, "q", shingleSize = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), if (r.isNullAt(6)) -1.0 else r.getDouble(6))))
      .toMap
    // host lowercased: doc 1's Evil host folds into evil.example.com
    assert(out("evil.example.com") ==
      ((3L, 1L, 5L, 1L, 1.0 / 3, 0.2)))
    assert(out("clean.example.org") == ((1L, 0L, 2L, 0L, 0.0, 0.0)))
    assert(out("tiny.example.net") == ((1L, 0L, 0L, 0L, 0.0, -1.0)),
      "shingleless domain: null shingle_frac, not a fake zero")
    assert(out.size == 3)
  }

  test("decontaminate removes flagged docs and keeps the rest intact") {
    val clean = Decontaminate.decontaminate(
      corpus, "text", "doc_id", bench, "question", "qid", shingleSize = 4)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
    assert(clean.columns.toSeq == corpus.columns.toSeq) // schema untouched
  }

  test("hashed prefilter path ≡ exact path (including thresholds)") {
    for (minOv <- Seq(1, 3)) {
      val exact = Decontaminate.contaminationPairs(
        corpus, "text", "doc_id", bench, "question", "qid",
        shingleSize = 4, minOverlap = minOv)
        .orderBy("doc_id", "bench_id").collect().toSeq
      val hashed = Decontaminate.contaminationPairsHashed(
        corpus, "text", "doc_id", bench, "question", "qid",
        shingleSize = 4, minOverlap = minOv)
        .orderBy("doc_id", "bench_id").collect().toSeq
      assert(hashed == exact, s"minOverlap=$minOv diverged")
    }
    // stop-shingle guard plumbs through too
    val g1 = Decontaminate.contaminationPairs(corpus, "text", "doc_id",
      bench, "question", "qid", shingleSize = 4, maxBenchDocFreq = Some(1))
      .orderBy("doc_id", "bench_id").collect().toSeq
    val g2 = Decontaminate.contaminationPairsHashed(corpus, "text", "doc_id",
      bench, "question", "qid", shingleSize = 4, maxBenchDocFreq = Some(1))
      .orderBy("doc_id", "bench_id").collect().toSeq
    assert(g2 == g1)
  }

  test("minOverlap raises the reporting bar") {
    val strict = Decontaminate.contaminationPairs(
      corpus, "text", "doc_id", bench, "question", "qid",
      shingleSize = 4, minOverlap = 100)
    assert(strict.count() == 0)
  }

  test("stop-shingle guard: shingles common across bench docs are ignored") {
    val boiler = Seq(
      (200L, "answer the following question carefully please one"),
      (201L, "answer the following question carefully please two"))
      .toDF("qid", "question")
    val doc = Seq((7L, "answer the following question carefully please maybe"))
      .toDF("doc_id", "text")
    val unguarded = Decontaminate.contaminationPairs(
      doc, "text", "doc_id", boiler, "question", "qid", shingleSize = 4)
    assert(unguarded.count() == 2) // hits both bench docs via boilerplate
    val guarded = Decontaminate.contaminationPairs(
      doc, "text", "doc_id", boiler, "question", "qid", shingleSize = 4,
      maxBenchDocFreq = Some(1))
    assert(guarded.count() == 0) // shared-instruction shingles dropped
  }

  test("semantic decontamination: aligned embeddings flagged, orthogonal " +
      "kept; bucketed path finds identical vectors; anti-join removes") {
    import org.apache.spark.sql.functions._
    val corpusVecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),   // parallel to bench 100 -> flagged
      (2L, Array(0f, 1f, 0f, 0f)),   // orthogonal -> clean
      (3L, Array(0.9f, 0.1f, 0f, 0f)) // near-parallel -> flagged
    ).toDF("doc_id", "embedding")
    val benchVecs = Seq((100L, Array(2f, 0f, 0f, 0f)))
      .toDF("qid", "embedding")
    val pairs = Decontaminate.semanticContaminationPairs(
      corpusVecs, "embedding", "doc_id", benchVecs, "embedding", "qid",
      threshold = 0.9)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L), (3L, 100L)))
    val clean = Decontaminate.decontaminateSemantic(
      corpusVecs, "embedding", "doc_id", benchVecs, "embedding", "qid",
      threshold = 0.9).select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
    // bucketed path: identical directions share every hyperplane bucket
    val bucketed = Decontaminate.semanticContaminationPairs(
      corpusVecs, "embedding", "doc_id", benchVecs, "embedding", "qid",
      threshold = 0.9, bits = Some(6), probes = 2)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(bucketed.contains((1L, 100L)))
    assert(bucketed.subsetOf(pairs)) // blocking never invents pairs
    // probes only ever ADD candidate pairs
    val noProbe = Decontaminate.semanticContaminationPairs(
      corpusVecs, "embedding", "doc_id", benchVecs, "embedding", "qid",
      threshold = 0.9, bits = Some(6))
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(noProbe.subsetOf(bucketed))
  }

  test("empty benchmark flags nothing") {
    val empty = Seq.empty[(Long, String)].toDF("qid", "question")
    assert(Decontaminate.contaminationPairs(
      corpus, "text", "doc_id", empty, "question", "qid", 4).count() == 0)
  }

  test("bloom prefilter path ≡ exact path, even when the filter is " +
      "saturated (64 bits → every probe positive → verify still exact)") {
    for (bits <- Seq(64, 1 << 14); minOv <- Seq(1, 3)) {
      val exact = Decontaminate.contaminationPairs(
        corpus, "text", "doc_id", bench, "question", "qid",
        shingleSize = 4, minOverlap = minOv)
        .orderBy("doc_id", "bench_id").collect().toSeq
      val bloomed = Decontaminate.contaminationPairsBloom(
        corpus, "text", "doc_id", bench, "question", "qid",
        shingleSize = 4, minOverlap = minOv, numBits = bits)
        .orderBy("doc_id", "bench_id").collect().toSeq
      assert(bloomed == exact, s"numBits=$bits minOverlap=$minOv diverged")
    }
  }

  test("bloom prefilter drops provably-clean docs before the join") {
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.functions.{broadcast, col}
    val bloom = bench.agg(ColumnShim.column(
      graft.functions.BloomShingleAgg(
        ColumnShim.expression(col("question")), 4, 1 << 14, 5)
        .toAggregateExpression()).as("_bloom"))
    val counts = corpus.crossJoin(broadcast(bloom))
      .select(col("doc_id"), ColumnShim.column(
        graft.functions.BloomCountShingles(
          ColumnShim.expression(col("text")),
          ColumnShim.expression(col("_bloom")), 4, 5)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) > 0)  // contaminated doc probes positive
    assert(counts(2L) == 0) // clean doc is pruned by the prefilter alone
  }

  test("bloom build state merges across partitions (repartitioned bench " +
      "builds the same filter)") {
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.functions.col
    def build(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(ColumnShim.column(graft.functions.BloomShingleAgg(
        ColumnShim.expression(col("question")), 4, 1 << 10, 5)
        .toAggregateExpression()).as("b"))
        .head().getAs[Array[Byte]]("b")
    assert(java.util.Arrays.equals(build(bench), build(bench.repartition(7))))
  }
}
