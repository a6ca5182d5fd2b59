package graft

import graft.operators.Relevance

/** TF-IDF / BM25 term weighting vs hand-computed values. */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs; "b" appears in all, "a" in one (twice), "c" in two
  private lazy val docs = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "c b")).toDF("id", "text")

  test("tfidf: smoothed idf, raw tf, hand-computed") {
    val out = Relevance.tfidf(docs, "id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"))
        -> (r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("tfidf"))).toMap
    assert(out.size == 6) // (1,a),(1,b),(2,b),(2,c),(3,b),(3,c)
    val idfA = math.log(4.0 / 2) + 1 // df=1, N=3
    val idfB = math.log(4.0 / 4) + 1 // df=3
    val idfC = math.log(4.0 / 3) + 1 // df=2
    assert(math.abs(out((1L, "a"))._3 - 2 * idfA) < 1e-12)
    assert(out((1L, "a"))._1 == 2L && out((1L, "a"))._2 == 1L)
    assert(math.abs(out((1L, "b"))._3 - idfB) < 1e-12)
    assert(math.abs(out((2L, "c"))._3 - idfC) < 1e-12)
  }

  test("bm25: saturation and length normalization, hand-computed") {
    val out = Relevance.bm25(docs, "id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"))
        -> (r.getAs[Long]("doc_len"), r.getAs[Double]("bm25"))).toMap
    // doc lens: 3, 2, 2 → avg 7/3
    assert(out((1L, "a"))._1 == 3L)
    assert(out((2L, "b"))._1 == 2L)
    val avgLen = 7.0 / 3
    def w(tf: Long, df: Long, len: Long): Double = {
      val idf = math.log(1 + (3 - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avgLen))
    }
    assert(math.abs(out((1L, "a"))._2 - w(2, 1, 3)) < 1e-12)
    assert(math.abs(out((3L, "c"))._2 - w(1, 2, 2)) < 1e-12)
    // common token ("b", df=3 of 3) gets near-zero idf but stays >= 0
    assert(out((1L, "b"))._2 >= 0.0 && out((1L, "b"))._2 < w(1, 2, 2))
  }

  test("searchBm25: ranks by summed term weights, rarest term dominates") {
    val corpus = Seq(
      (1L, "apple banana cherry date"), // both query terms
      (2L, "apple apple apple apple"), // common term only, saturated tf
      (3L, "banana fig grape kiwi"), // rare term only
      (4L, "lemon mango nectarine orange")) // no query terms → absent
      .toDF("id", "text")
    // "banana" df=2, "apple" df=2 — equal idf; doc 1 has both terms
    val hits = Relevance.searchBm25(corpus, "id", "text", "apple banana",
      k = 10).collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(hits.map(_._1).head == 1L) // two terms beat one
    assert(hits.map(_._1).toSet == Set(1L, 2L, 3L)) // doc 4 not returned
    assert(hits.map(_._2).toSeq == hits.map(_._2).sortBy(-_).toSeq)
    // k caps the hit list
    assert(Relevance.searchBm25(corpus, "id", "text", "apple banana",
      k = 1).count() == 1)
    // duplicate query tokens don't double-count
    val dup = Relevance.searchBm25(corpus, "id", "text",
      "apple apple banana", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(dup(1L) - hits.toMap.apply(1L)) < 1e-12)
    assertThrows[IllegalArgumentException] {
      Relevance.searchBm25(corpus, "id", "text", "   ", k = 5)
    }
  }

  test("unigramPerplexity: hand-computed on a closed vocabulary") {
    val d = Seq((1L, "a a a"), (2L, "b")).toDF("id", "text")
    val out = Relevance.unigramPerplexity(d, "id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // unigram: a→3, b→1, total 4
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    assert(math.abs(out(1L)._2 - math.log(0.75)) < 1e-12)
    assert(math.abs(out(1L)._3 - 4.0 / 3.0) < 1e-12) // exp(-ln 3/4)
    assert(math.abs(out(2L)._2 - math.log(0.25)) < 1e-12)
    assert(math.abs(out(2L)._3 - 4.0) < 1e-12)
    // uniform corpus → every doc at perplexity = vocab size
    val u = Seq((1L, "x y"), (2L, "y x")).toDF("id", "text")
    Relevance.unigramPerplexity(u, "id", "text").collect()
      .foreach(r => assert(math.abs(r.getDouble(3) - 2.0) < 1e-12))
  }

  test("bigramPerplexity: hand-computed Laplace model; single-token " +
      "docs omitted") {
    // bigrams: doc1 (a,b)×2 + (b,a); doc2 (a,b). model: c(a,b)=3,
    // c(b,a)=1; contexts a→3, b→1; V={a,b,c}=3
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("id", "text")
    val out = Relevance.bigramPerplexity(d, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L)) // "c" has no bigrams
    // P(b|a) = (3+1)/(3+3) = 2/3;  P(a|b) = (1+1)/(1+3) = 1/2
    val lp1 = (2 * math.log(2.0 / 3.0) + math.log(0.5)) / 3.0
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - lp1) < 1e-12)
    assert(math.abs(out(1L)._3 - math.exp(-lp1)) < 1e-12)
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._3 - 1.5) < 1e-12) // exp(−ln 2/3)
  }

  test("pmiBigrams: hand-computed association, minCount prune, " +
      "single-token docs safe") {
    // "x y" ×4 and "x z" ×1 (+ a single-token doc that must not crash):
    // T=10 tokens, B=5 bigrams; unigrams x→5, y→4, z→1
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x y"),
      (5L, "x z"), (6L, "solo")).toDF("id", "text")
    val out = Relevance.pmiBigrams(d, "id", "text", minCount = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // T counts "solo" too: x→5, y→4, z→1, solo→1, T=11; B=5
    val T = 11.0
    val xy = out(("x", "y"))
    assert(xy._1 == 4L && xy._2 == 5L && xy._3 == 4L)
    assert(math.abs(xy._4 - math.log(4.0 * T * T / (5.0 * 5.0 * 4.0)))
      < 1e-12)
    val xz = out(("x", "z"))
    assert(math.abs(xz._4 - math.log(1.0 * T * T / (5.0 * 5.0 * 1.0)))
      < 1e-12)
    // minCount prunes the singleton pair
    val pruned = Relevance.pmiBigrams(d, "id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("x", "y")))
  }

  test("clusterTopics: hand-computed c-TF-IDF, glue word sinks, " +
      "topK cut and tie-break") {
    // Cluster 10: docs about "cat"; cluster 20: docs about "dog";
    // "the" is glue (appears everywhere, high f → low score).
    val d = Seq(
      (1L, "cat cat the"),
      (2L, "cat the"),
      (3L, "dog dog the"),
      (4L, "dog the")).toDF("id", "text")
    val asn = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("id", "cluster_id")
    val out = Relevance.clusterTopics(asn, d, "id", "text", topK = 1)
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("rnk"), r.getAs[String]("term"),
          r.getAs[Long]("tf"), r.getAs[Long]("score_e"))))
      .toMap
    // tf(cat,10)=3, f(cat)=3; tot=10 tokens, nc=2 → A=5
    // score(cat,10) = 3·ln(1+5/3); score(the,10) = 2·ln(1+5/4)
    val catE = math.floor(3 * math.log(1 + 5.0 / 3) * 1e4 + 0.5).toLong
    assert(out(10L) == ((1L, "cat", 3L, catE)))
    val dogE = math.floor(3 * math.log(1 + 5.0 / 3) * 1e4 + 0.5).toLong
    assert(out(20L) == ((1L, "dog", 3L, dogE)))
    // topK=2 exposes the glue word below the topic term, never above
    val top2 = Relevance.clusterTopics(asn, d, "id", "text", topK = 2)
      .collect().map(r => (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("rnk")) -> r.getAs[String]("term")).toMap
    assert(top2((10L, 2L)) == "the" && top2((20L, 2L)) == "the")
    assert(top2.size == 4)
  }

  test("knBigramPerplexity: hand-computed interpolated KN, short docs " +
      "drop, continuation mass distinguishes contexts") {
    // corpus "a b a b" + "b c": model (a,b):2 (b,a):1 (b,c):1
    //   ctx a: c1=2 n1f=1; b: c1=2 n1f=2; cont all n1b=1; tt=3
    //   P(b|a) = 1.25/2 + .75·1/2·(1/3) = 0.75
    //   P(a|b) = 0.25/2 + .75·2/2·(1/3) = 0.375 = P(c|b)
    val d = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("id", "text")
    val out = Relevance.knBigramPerplexity(d, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(3L)) // < 2 tokens — no bigrams
    val lp1 = (2 * math.log(0.75) + math.log(0.375)) / 3
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - lp1) < 1e-12)
    assert(out(2L)._1 == 1L &&
      math.abs(out(2L)._2 - math.log(0.375)) < 1e-12)
    // the add-one model can't tell P(a|b) from P(c|b) apart from counts
    // alone either — but KN keeps P > 0 purely from discounted mass:
    assert(0.375 > 0.0 && out(2L)._2 < 0.0)
    intercept[IllegalArgumentException] {
      Relevance.knBigramPerplexity(d, "id", "text", discount = 1.0)
    }
  }

  test("knTrigramPerplexity: hand-computed interpolated KN at order 3, " +
      "short docs drop, lower orders are continuation types") {
    // corpus "a b a b a" + "b a c":
    //   model (a,b,a):2 (b,a,b):1 (b,a,c):1
    //   ctx (a,b): c12=2 n1f=1; (b,a): c12=2 n1f=2
    //   mid types (b,a):1 (a,b):1 (a,c):1; mcx b: m2=1 d2=1;
    //   a: m2=2 d2=2; low all 1; tt=3
    //   Pmid(a|b) = .25/1 + .75·1/1·(1/3) = 0.5
    //   P(a|ab)   = 1.25/2 + .75·1/2·0.5 = 0.8125
    //   Pmid(b|a) = .25/2 + .75·2/2·(1/3) = 0.375 = Pmid(c|a)
    //   P(b|ba)   = .25/2 + .75·2/2·0.375 = 0.40625 = P(c|ba)
    val d = Seq((1L, "a b a b a"), (2L, "b a c"), (3L, "x y"))
      .toDF("id", "text")
    val out = Relevance.knTrigramPerplexity(d, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(3L)) // < 3 tokens — no trigrams
    val lp1 = (2 * math.log(0.8125) + math.log(0.40625)) / 3
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - lp1) < 1e-12)
    assert(out(2L)._1 == 1L &&
      math.abs(out(2L)._2 - math.log(0.40625)) < 1e-12)
    intercept[IllegalArgumentException] {
      Relevance.knTrigramPerplexity(d, "id", "text", discount = 0.0)
    }
  }

  test("knTrigramPerplexityModified: hand-computed Chen-Goodman " +
      "discounts per order, class-dependent discounting and gamma, " +
      "degenerate count-of-counts refuse loudly") {
    // single-trigram docs pin the model exactly: trigram counts
    // {1,2,3,4,1,1} -> n1..n4 = 3,1,1,1 -> Y=.6, D1=.6, D2=.2, D3=.6;
    // continuation counts (b,c)=3, (q,r)=1, (q,u)=2 -> n1..n4 =
    // 1,1,1,0 -> Y=1/3, D1m=1/3, D2m=1, D3m=3
    val d = (Seq((1L, "a b c")) ++
      (2L to 3L).map(i => (i, "d b c")) ++
      (4L to 6L).map(i => (i, "e b c")) ++
      (7L to 10L).map(i => (i, "p q r")) ++
      Seq((11L, "s q u"), (12L, "v q u"), (13L, "too short")))
      .toDF("id", "text")
    val out = Relevance.knTrigramPerplexityModified(d, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(13L))
    // hand chain: pmid(c|b)=1/3 (count-3 fully discounted, gamma=1),
    // pmid(r|q)=10/27, pmid(u|q)=13/27; tops below
    val exp = Map(
      1L -> 0.6, // .4 + .6*(1/3)
      2L -> 14.0 / 15, // 1.8/2 + .1*(1/3)
      4L -> 13.0 / 15, // 2.4/3 + .2*(1/3)
      7L -> 163.0 / 180, // 3.4/4 + .15*(10/27)
      11L -> 31.0 / 45) // .4 + .6*(13/27)
    for ((id, p) <- exp)
      assert(math.abs(out(id)._2 - math.log(p)) < 1e-12,
        s"doc $id: ${out(id)._2} vs ln($p)")
    assert(out(3L) == out(2L) && out(12L) == out(11L))
    assert(out.values.forall(_._1 == 1L))
    // every count class discounts differently — the single-discount
    // model must NOT agree on a corpus with mixed classes
    val single = Relevance.knTrigramPerplexity(d, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(single(1L) != out(1L)._2)
    // all-singleton corpus: n2 = n3 = 0 -> KenLM's precondition fails
    // and the guard raises instead of serving NaNs
    val flat = Seq((1L, "a b c"), (2L, "d e f")).toDF("id", "text")
    val err = intercept[Exception] {
      Relevance.knTrigramPerplexityModified(flat, "id", "text")
        .collect()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("count-of-counts") ||
        (err.getCause != null &&
          err.getCause.getMessage.contains("count-of-counts"))))
    // skewed count classes (n3 dwarfing n2) drive d2 = 2 - 3Y n3/n2
    // negative — KenLM's "could not calculate discounts" condition;
    // the guard must refuse instead of serving negative probabilities
    val skew = ((0 until 50).flatMap(i =>
      (0 until 3).map(r => (i * 10L + r, s"p$i q$i r$i"))) ++
      Seq((9001L, "x1 y1 z1"), (9002L, "x2 y2 z2"),
        (9003L, "x2 y2 z2"), (9004L, "g1 h h"), (9005L, "g2 h h"),
        (9006L, "f1 k k"), (9007L, "f2 k k"), (9008L, "f3 k k")))
      .toDF("id", "text")
    val err2 = intercept[Exception] {
      Relevance.knTrigramPerplexityModified(skew, "id", "text")
        .collect()
    }
    val msg2 = Option(err2.getMessage).getOrElse("") +
      Option(err2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("non-positive d2 or d3"), s"got: $msg2")
  }

  test("topTerms: e6-integerized ranking, token tie-break, k cut") {
    // doc 1: tf(a)=2 > tf(b)=1; idf(a)=idf(b)? df(a)=1, df(b)=3 → a wins
    // on idf too. docs 2/3 are "b c"/"c b" — identical scores for b and
    // c (tf=1, df(b)=3, df(c)=2): c outranks b on idf; ties inside a
    // doc would fall to the token order.
    val top = Relevance.topTerms(docs, "id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rank"), r.getAs[String]("token"))).toMap
    assert(top(1L) == ((1L, "a")))
    assert(top(2L) == ((1L, "c")) && top(3L) == ((1L, "c")))
    // exact tie (same tf, same df): lexicographic token tie-break
    val tie = Seq((1L, "z y")).toDF("id", "text")
    val t2 = Relevance.topTerms(tie, "id", "text", k = 2)
      .orderBy("rank").collect().map(_.getAs[String]("token")).toSeq
    assert(t2 == Seq("y", "z"))
    assert(Relevance.topTerms(docs, "id", "text", k = 2)
      .groupBy("doc_id").count().collect().forall(_.getLong(1) <= 2L))
  }

  test("zipfAlpha: exact integerized MLE on a hand-counted corpus; " +
      "fMin filters; degenerate flat distribution yields null alpha") {
    // freqs: a:4, b:2, c:1 → fMin=2 keeps a,b; s_e9 is the exact
    // integerized ln(4/2) + ln(2/2) the engine sums in decimal
    val d = Seq((1L, "a a b"), (2L, "a a b c")).toDF("id", "text")
    val r = Relevance.zipfAlpha(d, "text", fMin = 2L).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    val sE9 = math.floor(StrictMath.log(2.0) * 1e9 + 0.5)
    val alpha = 1.0 + 2.0 / (sE9 / 1e9)
    assert(r.getDouble(2) == alpha)
    assert(r.getDouble(3) == (alpha - 1.0) / math.sqrt(2.0))
    // every kept type at exactly fMin → zero log mass → null alpha
    val flat = Seq((1L, "x y"), (2L, "x y")).toDF("id", "text")
    val rf = Relevance.zipfAlpha(flat, "text", fMin = 2L).head()
    assert(rf.getLong(0) == 2L && rf.isNullAt(2) && rf.isNullAt(3))
    intercept[IllegalArgumentException] {
      Relevance.zipfAlpha(d, "text", fMin = 0L)
    }
  }

  test("tfidf composes lazily — no eager jobs at definition time") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Relevance.tfidf(docs, "id", "text") // compose only
    Relevance.bm25(docs, "id", "text")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before)
  }

  test("hashedVectors: JVM hash replay of buckets and signs, identical " +
      "texts embed identically, empty docs keep a zero row, unit norm") {
    import graft.functions.PortableHash
    val docs = Seq(
      (0L, "alpha beta beta"),
      (1L, "alpha beta beta"), // exact dup of 0 → identical vector
      (2L, "gamma delta"),
      (3L, "")) // no tokens → all-zero vector, row still present
      .toDF("doc_id", "text")
    val dim = 16
    val raw = Relevance.hashedVectors(docs, "doc_id", "text", dim = dim,
      normalize = false)
    val got = raw.orderBy("doc_id")
      .as[(Long, Seq[Double])].collect()
    assert(got.length == 4 && got.forall(_._2.length == dim))
    assert(got(0)._2 == got(1)._2) // same text, same vector
    assert(got(3)._2.forall(_ == 0.0)) // empty text → zero vector
    // replay entry by entry from the JVM twin hash + exact idf math:
    // df(alpha)=2, df(beta)=2, df(gamma)=1, df(delta)=1, N=4
    def we6(tf: Long, df: Long): Long =
      math.floor(tf * (StrictMath.log(5.0 / (df + 1)) + 1) * 1e6 + 0.5)
        .toLong
    val expect = Array.fill(dim)(0L)
    def add(token: String, tf: Long, df: Long): Unit = {
      val h = PortableHash.hash48(token, 42L)
      val sign = if (((h >> 20) & 1L) == 1L) -1L else 1L
      expect((h % dim).toInt) += sign * we6(tf, df)
    }
    add("alpha", 1, 2); add("beta", 2, 2)
    val doc0 = got(0)._2.map(v => math.floor(v * 1e6 + 0.5).toLong)
    assert(doc0.toSeq == expect.toSeq,
      s"doc0 ${doc0.toSeq} vs replay ${expect.toSeq}")
    // normalized mode: unit norm for token-bearing docs, zero kept zero
    val nrm = Relevance.hashedVectors(docs, "doc_id", "text", dim = dim)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    nrm.take(3).foreach { case (id, v) =>
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-9, s"doc $id norm2 $n2")
    }
    assert(nrm(3)._2.forall(_ == 0.0))
    // partition invariance: exact long sums → identical vectors
    val rep = Relevance.hashedVectors(docs.repartition(7), "doc_id",
      "text", dim = dim, normalize = false)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(rep.map(_._2.toSeq).toSeq == got.map(_._2.toSeq).toSeq)
  }

  test("maintainLexIndex: takedown re-weights df and drops the doc's " +
      "postings, adds win over same-call removals, live re-add " +
      "replaces, unknown removal no-op — served BM25/TF-IDF bit-equal " +
      "to the full rebuild") {
    val base = Seq(
      (1L, "a a b"),
      (2L, "b c"),
      (3L, "c b"),
      (4L, "d d unique")).toDF("id", "text")
    val ix = Relevance.buildLexIndex(base, "id", "text")
    // one call: take down 4 (its 'unique'/'d' leave the vocabulary)
    // and 99 (unknown — no-op); add 5 (new), re-add 2 with NEW text
    // (replace), and 3 both removed AND re-added (adds win)
    val adds = Seq((5L, "e b"), (2L, "c c f"), (3L, "c b"))
      .toDF("id", "text")
    val dels = Seq(4L, 99L, 3L).toDF("id")
    val m = Relevance.maintainLexIndex(ix, adds, dels, "id", "text")
    val post = Seq(
      (1L, "a a b"),
      (2L, "c c f"),
      (3L, "c b"),
      (5L, "e b")).toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    val served = rows(Relevance.bm25FromIndex(m))
    val rebuilt = rows(Relevance.bm25(post, "id", "text"))
    assert(served == rebuilt,
      "maintained index must serve the full rebuild bit-for-bit")
    assert(!served.keySet.exists(_._1 == 4L), "taken-down doc gone")
    assert(!served.keySet.exists(_._2 == "unique"),
      "sole-doc tokens leave the vocabulary")
    assert(served.keySet.filter(_._1 == 2L).map(_._2) == Set("c", "f"),
      "re-added doc carries ONLY its new content")
    assert(served.contains((3L, "c")), "add wins over same-call removal")
    // df re-weighting: 'b' was in 3 of 4 docs, now 3 of 4 live docs
    // (1, 3, 5) — and 'c' in docs 2 and 3
    assert(served((1L, "b"))._2 == 3L)
    assert(served((2L, "c"))._2 == 2L)
    // the registry drives N: served idf must reflect 4 live docs
    val tserved = Relevance.tfidfFromIndex(m).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) ->
        r.getAs[Double]("tfidf")).toMap
    val trebuilt = Relevance.tfidf(post, "id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) ->
        r.getAs[Double]("tfidf")).toMap
    assert(tserved == trebuilt, "tf-idf serves bit-equal too")
    // search off the maintained store ≡ search over the rebuilt corpus
    val sServed = Relevance.searchBm25FromIndex(m, "c b", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sRebuilt = Relevance.searchBm25(post, "id", "text", "c b",
      k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sServed == sRebuilt, "search serves bit-equal too")
  }

  test("maintainTrigramLm: counts subtract exactly — maintained model " +
      "≡ full rebuild, zero-count trigrams leave, unknown removal " +
      "no-op, live re-add replaces, served KN perplexity bit-equal") {
    val base = Seq(
      (1L, "a b c d"), // abc, bcd
      (2L, "a b c"),   // abc
      (3L, "x y z w"), // xyz, yzw
      (4L, "a b"))     // < 3 tokens: no trigrams, but registry-live
      .toDF("id", "text")
    val lm = Relevance.buildTrigramLm(base, "id", "text")
    // one call: take down 3 (xyz/yzw reach zero and LEAVE) and 99
    // (unknown — its "q q q" must NOT subtract); re-add 2 with NEW
    // text (its old row ships — replace semantics); add 5 (new)
    val adds = Seq((2L, "b c d e"), (5L, "a b c")).toDF("id", "text")
    val rems = Seq((3L, "x y z w"), (2L, "a b c"), (99L, "q q q"))
      .toDF("id", "text")
    val m = Relevance.maintainTrigramLm(lm, adds, rems, "id", "text")
    val post = Seq(
      (1L, "a b c d"),
      (2L, "b c d e"),
      (4L, "a b"),
      (5L, "a b c")).toDF("id", "text")
    val rebuilt = Relevance.buildTrigramLm(post, "id", "text")
    def modelRows(t: Relevance.TrigramLm) = t.model.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val got = modelRows(m)
    assert(got == modelRows(rebuilt),
      "maintained counts must equal the full rebuild's")
    assert(!got.contains(("x", "y", "z")), "zero-count trigram leaves")
    assert(got(("a", "b", "c")) == 2L) // docs 1 and 5
    assert(got(("b", "c", "d")) == 2L) // docs 1 and 2's new text
    def registry(t: Relevance.TrigramLm) =
      t.docs.collect().map(_.getLong(0)).toSet
    assert(registry(m) == Set(1L, 2L, 4L, 5L))
    // served perplexity off the maintained store ≡ one-shot rebuild
    def ppl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val served = ppl(Relevance.knTrigramFromModel(m.model, post,
      "id", "text"))
    val oneShot = ppl(Relevance.knTrigramPerplexity(post, "id", "text"))
    assert(served == oneShot,
      "KN perplexity served off the maintained model must be bit-equal")
    // duplicate rows in one call fold to one (no double subtraction)
    val m2 = Relevance.maintainTrigramLm(lm,
      adds.unionAll(adds), rems.unionAll(rems), "id", "text")
    assert(modelRows(m2) == got, "same-call duplicate rows fold")
  }

  test("knTrigramFromModelModified: modified-KN served off a " +
      "maintained store equals the one-shot build (corpus hits every " +
      "count class at both orders, so discounts exist)") {
    // trigram counts: abc=3, bca=2, cab=2, xbc/pyz/qyz/ryz=1 →
    // n1..n3 = 4,2,1; continuation counts: (b,c)=2, (y,z)=3,
    // (c,a)=(a,b)=1 → n1..n3 = 2,1,1
    val post = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "x b c"),
      (3L, "p y z"),
      (4L, "q y z"),
      (5L, "r y z")).toDF("id", "text")
    val lm0 = Relevance.buildTrigramLm(
      post.filter(org.apache.spark.sql.functions.col("id") =!= 5L),
      "id", "text")
    val m = Relevance.maintainTrigramLm(lm0,
      Seq((5L, "r y z")).toDF("id", "text"), post.limit(0),
      "id", "text")
    def ppl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val servedM = ppl(Relevance.knTrigramFromModelModified(m.model,
      post, "id", "text"))
    val oneShotM = ppl(Relevance.knTrigramPerplexityModified(post,
      "id", "text"))
    assert(servedM == oneShotM,
      "modified-KN served off the maintained model must be bit-equal")
  }

  test("maintainTrigramLm fails loudly on a live re-add without its " +
      "old row and on mismatched erasure text") {
    val base = Seq((1L, "a b c d"), (2L, "x y z")).toDF("id", "text")
    val lm = Relevance.buildTrigramLm(base, "id", "text")
    val clash = intercept[Exception] {
      Relevance.maintainTrigramLm(lm,
        Seq((1L, "p q r s")).toDF("id", "text"),
        base.limit(0), "id", "text").model.collect()
    }
    assert(clash.getMessage.contains("re-add of a live id") ||
      clash.getCause != null &&
        clash.getCause.getMessage.contains("re-add of a live id"))
    val neg = intercept[Exception] {
      Relevance.maintainTrigramLm(lm,
        base.limit(0),
        Seq((1L, "not the stored text")).toDF("id", "text"),
        "id", "text").model.collect()
    }
    assert(neg.getMessage.contains("went negative") ||
      neg.getCause != null &&
        neg.getCause.getMessage.contains("went negative"))
  }
}
