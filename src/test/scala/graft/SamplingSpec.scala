package graft
// (Chunking/packing tests live at the end of this suite — corpus-shaping
// operators share the sampling fixtures.)

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling/splitting/mixture semantics — reproducibility is
  * the whole point, so every test pins it. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0 until 10000).map(i => (i.toLong, s"doc$i"))
    .toDF("id", "txt")

  test("hashSample: deterministic, a subset, and near the target fraction") {
    val s1 = Sampling.hashSample(corpus, "id", 0.2)
    val s2 = Sampling.hashSample(corpus, "id", 0.2)
    val ids1 = s1.select("id").as[Long].collect().toSet
    val ids2 = s2.select("id").as[Long].collect().toSet
    assert(ids1 == ids2) // reproducible
    assert(ids1.subsetOf((0L until 10000L).toSet))
    val n = ids1.size.toDouble
    assert(math.abs(n / 10000 - 0.2) < 0.02, s"got ${n / 10000}")
    // different seed → different (but same-sized-ish) sample
    val other = Sampling.hashSample(corpus, "id", 0.2, seed = 99L)
      .select("id").as[Long].collect().toSet
    assert(other != ids1)
  }

  test("hashSample: membership is monotone in fraction (nested samples)") {
    val small = Sampling.hashSample(corpus, "id", 0.1)
      .select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(corpus, "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big)) // growing the sample never evicts a row
  }

  test("hashSample: edge fractions") {
    assert(Sampling.hashSample(corpus, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(corpus, "id", 1.0).count() == 10000)
  }

  test("PortableHash: JVM twin is bit-identical to the column form") {
    import graft.functions.PortableHash
    val got = corpus.limit(500)
      .select(col("id"), PortableHash.hash48(col("id"), 42L).as("h"))
      .as[(Long, Long)].collect()
    got.foreach { case (id, h) =>
      assert(h == PortableHash.hash48(id.toString, 42L), s"id=$id")
      assert(h >= 0 && h < PortableHash.Space)
    }
  }

  test("portable mode: same semantics as default (fraction, nesting, " +
      "determinism), membership recomputable from the JVM hash") {
    import graft.functions.PortableHash
    val s = Sampling.hashSample(corpus, "id", 0.2, portable = true)
      .select("id").as[Long].collect().toSet
    // exact membership = hash bucket < 200000, re-derived off-Spark
    val want = (0L until 10000L)
      .filter(id => PortableHash.hash48(id.toString, 42L) % 1000000L < 200000L)
      .toSet
    assert(s == want)
    val small = Sampling.hashSample(corpus, "id", 0.1, portable = true)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(s)) // nested like the default mode
    val (train, test) =
      Sampling.trainTestSplit(corpus, "id", 0.25, portable = true)
    val tr = train.select("id").as[Long].collect().toSet
    val te = test.select("id").as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty && tr.size + te.size == 10000)
  }

  test("sample_k portable: winners are the k smallest md5-48 hashes") {
    import graft.functions.PortableHash
    val got = corpus
      .withColumn("g", col("id") % 4)
      .groupBy("g")
      .agg(graft.functions.GraftFunctions
        .sample_k(col("id"), 5, portable = true).as("ids"))
      .as[(Long, Array[Long])].collect().toMap
    (0L until 4L).foreach { g =>
      val members = (0L until 10000L).filter(_ % 4 == g)
      val want = members
        .sortBy(id => (PortableHash.hash48(id.toString, 42L), id))
        .take(5).toArray
      assert(got(g).sameElements(want), s"group $g")
    }
  }

  test("weightedSamplePerGroup portable: selection matches the ES " +
      "bottom-k recomputed from the portable hash") {
    import graft.functions.PortableHash
    val weighted = corpus.withColumn("w", (col("id") % 97 + 1).cast("long"))
    val got = Sampling.weightedSamplePerGroup(
        weighted.withColumn("g", col("id") % 3), "g", "id", "w", k = 4,
        portable = true)
      .select("g", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 3L).foreach { g =>
      val want = (0L until 10000L).filter(_ % 3 == g).map { id =>
        val u = (PortableHash.hash48(id.toString, 42L) + 1).toDouble /
          PortableHash.Space.toDouble
        (-math.log(u) / (id % 97 + 1).toDouble, id)
      }.sorted.take(4).map(_._2).toSet
      assert(got(g) == want, s"group $g")
    }
  }

  test("trainTestSplit: disjoint, exhaustive, stable under data growth") {
    val (train, test) = Sampling.trainTestSplit(corpus, "id", 0.25)
    val trainIds = train.select("id").as[Long].collect().toSet
    val testIds = test.select("id").as[Long].collect().toSet
    assert(trainIds.intersect(testIds).isEmpty)
    assert(trainIds.size + testIds.size == 10000)
    assert(math.abs(testIds.size / 10000.0 - 0.25) < 0.02)
    // growth stability: splitting a SUPERSET never reassigns an old row
    val grown = (0 until 20000).map(i => (i.toLong, s"doc$i")).toDF("id", "txt")
    val (_, testGrown) = Sampling.trainTestSplit(grown, "id", 0.25)
    val testGrownIds = testGrown.select("id").as[Long].collect().toSet
    assert(testIds.subsetOf(testGrownIds))
    assert(trainIds.intersect(testGrownIds.filter(_ < 10000L)) == Set.empty)
  }

  test("splitByCluster: duplicate clusters never straddle the boundary " +
      "(the row-hash counterexample), verdict pure in (cluster, seed)") {
    import graft.operators.Dedup
    // 1000 duplicate PAIRS: rows (2k, 2k+1) share a text.
    val dups = (0 until 2000).map(i => (i.toLong, s"dup${i / 2}"))
      .toDF("id", "txt")
    // The failure mode being prevented: a row-hash split hashes the two
    // members independently, so some pair straddles train/test and the
    // held-out half measures memorization.
    val (_, rowTest) = Sampling.trainTestSplit(dups, "id", 0.25)
    val rowTestIds = rowTest.select("id").as[Long].collect().toSet
    val straddling = (0 until 1000).count { k =>
      rowTestIds.contains(2L * k) != rowTestIds.contains(2L * k + 1)
    }
    assert(straddling > 0, "fixture should straddle under a row-hash split")
    // splitByCluster over Dedup.exact clusters (the q_x6s composition):
    // both members carry the keeper id, so the verdict is shared.
    val clusters = Dedup.exact(dups, "txt", "id")
      .select(col("content_sha256"), col("keeper_id").as("cluster"))
    val withCluster = dups
      .select(col("id"), sha2(col("txt"), 256).as("content_sha256"))
      .join(clusters, Seq("content_sha256"))
    val split = Sampling.splitByCluster(withCluster, "cluster", 0.25)
      .select("id", "cluster", "split")
      .as[(Long, Long, String)].collect()
    assert(split.length == 2000)
    val byCluster = split.groupBy(_._2)
    assert(byCluster.forall(_._2.map(_._3).distinct.length == 1),
      "every cluster must land entirely on one side")
    // test mass still lands near the target fraction (clusters are small)
    val testN = split.count(_._3 == "test").toDouble
    assert(math.abs(testN / 2000 - 0.25) < 0.05, s"got ${testN / 2000}")
    // growth: new clusters never move an existing cluster's verdict, and
    // the verdict is recomputable from the JVM portable hash
    val grown = (0 until 4000).map(i => (i.toLong, s"dup${i / 2}"))
      .toDF("id", "txt")
    val grownClusters = Dedup.exact(grown, "txt", "id")
      .select(col("content_sha256"), col("keeper_id").as("cluster"))
    val grownSplit = Sampling.splitByCluster(
        grown.select(col("id"), sha2(col("txt"), 256).as("content_sha256"))
          .join(grownClusters, Seq("content_sha256")),
        "cluster", 0.25, portable = true)
      .select("id", "cluster", "split")
      .as[(Long, Long, String)].collect()
    val old = split.map(r => r._1 -> r._2).toMap
    // same texts keep the same keeper → same cluster → same side; and in
    // portable mode the verdict replays from md5-48 of the cluster id
    import graft.functions.PortableHash
    grownSplit.filter(r => old.contains(r._1)).foreach { r =>
      assert(r._2 == old(r._1), s"cluster moved for id=${r._1}")
      val want =
        if (PortableHash.hash48(r._2.toString, 42L) % 1000000L < 250000L)
          "test" else "train"
      assert(r._3 == want, s"portable verdict mismatch for id=${r._1}")
    }
  }

  test("epochOrder: a dense 0-based permutation equal to the naive " +
      "global hash order, invariant to partitioning and bucket count, " +
      "JVM-replayable in portable mode") {
    import graft.functions.PortableHash
    val out = Sampling.epochOrder(corpus, "id", seed = 7L,
        portable = true, buckets = 64)
      .select("id", "pos").as[(Long, Long)].collect()
    // dense permutation: every position 0..n−1 exactly once
    assert(out.map(_._2).sorted.toSeq == (0L until 10000L))
    // equals the naive single-window order, replayed off-Spark
    val naive = (0L until 10000L)
      .sortBy(id => (PortableHash.hash48(id.toString, 7L) % 1000000L, id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    out.foreach { case (id, pos) =>
      assert(pos == naive(id), s"id $id: pos $pos != naive ${naive(id)}")
    }
    // bucket count is an implementation knob, never a semantics knob
    val alt = Sampling.epochOrder(corpus.repartition(13), "id",
        seed = 7L, portable = true, buckets = 3)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(out.toMap == alt)
    // a different seed is a different epoch order
    val epoch2 = Sampling.epochOrder(corpus, "id", seed = 8L,
        portable = true)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(epoch2 != out.toMap)
  }

  test("epochOrderMulti: per-epoch dense permutations in one pass, " +
      "decorrelated across epochs, JVM-replayable, partition-invariant") {
    import graft.functions.PortableHash
    val out = Sampling.epochOrderMulti(corpus, "id", epochs = 3,
        seed = 7L, portable = true, buckets = 64)
      .select("epoch", "id", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 30000)
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (ep, rows) =>
      // dense permutation per epoch
      assert(rows.map(_._3).sorted.toSeq == (0L until 10000L))
      // equals the naive per-epoch window over md5-48("7:<id>:<ep>")
      val naive = (0L until 10000L)
        .sortBy(id =>
          (PortableHash.hash48(s"$id:$ep", 7L) % 1000000L, id))
        .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
      rows.foreach { case (_, id, pos) =>
        assert(pos == naive(id), s"epoch $ep id $id: $pos != ${naive(id)}")
      }
    }
    // epochs are different orders (decorrelated keys)
    assert(byEpoch(0L).map(r => r._2 -> r._3).toMap !=
      byEpoch(1L).map(r => r._2 -> r._3).toMap)
    // bucket count / partitioning: knobs, not semantics
    val alt = Sampling.epochOrderMulti(corpus.repartition(13), "id",
        epochs = 3, seed = 7L, portable = true, buckets = 3)
      .select("epoch", "id", "pos").as[(Long, Long, Long)].collect()
    assert(alt.map(r => (r._1, r._2) -> r._3).toMap ==
      out.map(r => (r._1, r._2) -> r._3).toMap)
  }

  test("curriculumOrder: growing competence window by exact rank, " +
      "integer inclusion, dense per-epoch shuffle, partition-invariant") {
    // ids 1..10, score = id (so rank == id); E=2, start 500‰:
    // epoch0 keeps rank·2000 ≤ 10·(1000+500) → rank ≤ 7; epoch1 all 10
    val d = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "s")
    val out = Sampling.curriculumOrder(d, "id", "s", epochs = 2,
        startPermille = 500, seed = 7L)
      .select("epoch", "id", "difficulty_rank", "pos")
      .as[(Long, Long, Long, Long)].collect()
    val e0 = out.filter(_._1 == 0L)
    val e1 = out.filter(_._1 == 1L)
    assert(e0.map(_._2).sorted.toSeq == (1L to 7L))
    assert(e1.map(_._2).sorted.toSeq == (1L to 10L))
    assert(e0.map(_._4).sorted.toSeq == (0L until 7L))
    assert(e1.map(_._4).sorted.toSeq == (0L until 10L))
    assert(out.forall(r => r._3 == r._2), "rank == id by construction")
    // partition/bucket/rankBucket counts are knobs, not semantics —
    // and ties (1000 distinct scores over 10k ids) break by id
    val big = corpus.withColumn("s", (col("id") * 37 % 1000).cast("double"))
    val a = Sampling.curriculumOrder(big, "id", "s", epochs = 3,
        startPermille = 250, seed = 7L, portable = true, buckets = 64)
      .select("epoch", "id", "pos").as[(Long, Long, Long)].collect()
    val b = Sampling.curriculumOrder(big.repartition(13), "id", "s",
        epochs = 3, startPermille = 250, seed = 7L, portable = true,
        buckets = 3, rankBuckets = 17)
      .select("epoch", "id", "pos").as[(Long, Long, Long)].collect()
    assert(a.map(r => (r._1, r._2) -> r._3).toMap ==
      b.map(r => (r._1, r._2) -> r._3).toMap)
    // windows grow: strict nesting up to the full final epoch, and the
    // epoch-0 size is the exact integer competence (rank ≤ n/2)
    val byE = a.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byE(2L).size == 10000)
    assert(byE(0L).subsetOf(byE(1L)) && byE(1L).subsetOf(byE(2L)))
    assert(byE(0L).size == 5000)
    assert(byE(1L).size == 7500)
    // all-equal scores collapse to one rank bucket: id-order ranks,
    // correct (degraded) rather than wrong
    val eq = Sampling.curriculumOrder(d.withColumn("s", lit(1.0)), "id",
        "s", epochs = 2).select("difficulty_rank").as[Long].collect()
    assert(eq.length == 16 && eq.max == 10L) // 6 (rank≤6.25) + all 10
  }

  test("stratifiedTopK: exact k per stratum, short strata kept whole") {
    val docs = Seq(
      ("en", 1L, 50L), ("en", 2L, 90L), ("en", 3L, 70L), ("en", 4L, 90L),
      ("fr", 5L, 10L), ("fr", 6L, 20L),
      ("de", 7L, 5L))
      .toDF("lang", "doc_id", "quality")
    val out = Sampling.stratifiedTopK(docs, "lang", 2,
      Seq(col("quality").desc, col("doc_id")))
    val byLang = out.collect().groupBy(_.getString(0))
    // en: quality 90 (doc 2), 90 (doc 4) — deterministic tie-break on id
    assert(byLang("en").map(_.getLong(1)).toSet == Set(2L, 4L))
    assert(byLang("fr").map(_.getLong(1)).toSet == Set(5L, 6L))
    assert(byLang("de").map(_.getLong(1)).toSet == Set(7L))
    assert(!out.columns.contains("_graft_rn")) // helper column dropped
  }

  test("stratifiedSplit: exact per-stratum quotas, test-first fill on " +
      "short strata, growth-stable SIZES with displacement semantics, " +
      "portable replay") {
    import graft.functions.PortableHash
    val docs = corpus.withColumn("lang",
      concat(lit("L"), (col("id") % 5).cast("string")))
    val out = Sampling.stratifiedSplit(docs, "lang", "id",
        valK = 3, testK = 4, portable = true)
      .select("id", "lang", "split")
      .as[(Long, String, String)].collect()
    // exact quotas in every full stratum
    val byLang = out.groupBy(_._2)
    byLang.values.foreach { rows =>
      assert(rows.count(_._3 == "test") == 4)
      assert(rows.count(_._3 == "val") == 3)
      assert(rows.count(_._3 == "train") == rows.length - 7)
    }
    // membership re-derived off-Spark: per stratum, the 4 smallest
    // (md5-48 % 1e6, id) keys are test, the next 3 val
    (0L until 5L).foreach { g =>
      val members = (0L until 10000L).filter(_ % 5 == g)
        .sortBy(id => (PortableHash.hash48(id.toString, 42L) % 1000000L, id))
      val want = (members.take(4).map(_ -> "test") ++
        members.slice(4, 7).map(_ -> "val")).sortBy(_._1)
      val got = out.filter(r => r._2 == s"L$g" && r._3 != "train")
        .map(r => r._1 -> r._3).toSeq.sortBy(_._1)
      assert(got == want, s"stratum L$g")
    }
    // growth: quota SIZES are stable but membership is NOT — a new row
    // whose hash key ranks inside the test quota DISPLACES the
    // incumbent with the largest key (test→val, val→train). This is
    // the deliberate fixed-size contract; use trainTestSplit's
    // fraction threshold when growth-stable membership matters.
    val members0 = (0L until 10000L).filter(_ % 5 == 0)
      .sortBy(id => (PortableHash.hash48(id.toString, 42L) % 1000000L, id))
    val cutKey = PortableHash.hash48(members0(3).toString, 42L) % 1000000L
    val newId = (10000L until 100000L by 5L)
      .find(id => PortableHash.hash48(id.toString, 42L) % 1000000L < cutKey)
      .get // a fresh L0 row that out-ranks the current 4th test member
    val grown = docs.unionByName(
      Seq((newId, s"doc$newId")).toDF("id", "txt")
        .withColumn("lang", lit("L0")))
    val grownOut = Sampling.stratifiedSplit(grown, "lang", "id",
        valK = 3, testK = 4, portable = true)
      .filter(col("lang") === "L0").select("id", "split")
      .as[(Long, String)].collect().toMap
    val oldTest = members0.take(4).toSet
    assert(grownOut.values.count(_ == "test") == 4) // size stable
    assert(grownOut(newId) == "test") // newcomer enters by rank
    val displaced = members0(3) // largest-key incumbent falls out
    assert(oldTest.contains(displaced) && grownOut(displaced) == "val")

    // short stratum: test quota fills before val, nothing trains
    val tiny = Seq((1L, "xx"), (2L, "xx"), (3L, "xx"), (4L, "xx"),
      (5L, "xx"), (6L, "xx")).toDF("id", "lang")
    val tinyOut = Sampling.stratifiedSplit(tiny, "lang", "id", 3, 4)
      .select("split").as[String].collect()
    assert(tinyOut.count(_ == "test") == 4 &&
      tinyOut.count(_ == "val") == 2 && !tinyOut.contains("train"))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSplit(tiny, "lang", "id", 0, 0))
  }

  test("mixture: weights control per-source keep rates; schemas null-fill") {
    val a = (0 until 4000).map(i => (i.toLong, "web")).toDF("id", "src")
    val b = (10000 until 14000).map(i => (i.toLong, 1.5)).toDF("id", "score")
    val mixed = Sampling.mixture(Seq((a, 1.0), (b, 0.25)), "id")
    assert(mixed.columns.toSeq == Seq("id", "src", "score"))
    val bySrc = mixed.withColumn("from_a", col("src").isNotNull)
      .groupBy("from_a").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(bySrc(true) == 4000) // weight 1.0 keeps everything
    assert(math.abs(bySrc(false) / 4000.0 - 0.25) < 0.05)
    // deterministic end-to-end
    assert(Sampling.mixture(Seq((a, 1.0), (b, 0.25)), "id").count() ==
      mixed.count())
  }

  test("sample_k aggregate: deterministic under any partitioning") {
    val df = (0 until 5000).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")
    def run(parts: Int): Map[String, Seq[Long]] =
      df.repartition(parts)
        .groupBy("g")
        .agg(graft.functions.GraftFunctions.sample_k(col("id"), 5).as("s"))
        .collect()
        .map(r => r.getString(0) ->
          r.getAs[scala.collection.Seq[Long]]("s").toSeq).toMap
    val a = run(2)
    val b = run(13)
    assert(a == b) // row order and partitioning are irrelevant
    assert(a.values.forall(_.size == 5))
    // per-group isolation: members belong to their group's id space
    a.foreach { case (g, ids) =>
      val mod = g.drop(1).toInt
      assert(ids.forall(id => id % 4 == mod))
    }
  }

  test("sample_k: bottom-k nesting, small groups, and duplicate collapse") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L)).toDF("g", "id")
    val s2 = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.sample_k(col("id"), 2).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s").toSet
    val s3 = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.sample_k(col("id"), 3).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s").toSet
    assert(s2.subsetOf(s3)) // bottom-k sketches nest
    assert(s3 == Set(1L, 2L, 3L)) // dups collapsed, whole small group kept
    val s9 = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.sample_k(col("id"), 9).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s")
    assert(s9.size == 3) // never pads beyond distinct ids
  }

  test("sample_k rejects non-integral id columns at analysis time") {
    val df = Seq(("g", "not-an-id")).toDF("g", "id")
    val e = intercept[Exception](
      df.groupBy("g")
        .agg(graft.functions.GraftFunctions.sample_k(col("id"), 2))
        .collect())
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("sampling filters are narrow: no shuffle in the physical plan") {
    val plan = Sampling.hashSample(corpus, "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedSample: deterministic, weight-respecting, bad weights dropped") {
    val rows = ((0 until 100).map(i => (i.toLong, 100.0)) ++ // heavy
      (100 until 200).map(i => (i.toLong, 1.0)) ++ // light
      Seq((900L, 0.0), (901L, -3.0))) // never eligible
      .toDF("id", "w")
    val nullW = Seq((902L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "w")
    val src = rows.unionByName(nullW)
    val s1 = Sampling.weightedSample(src, "id", "w", 10)
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.weightedSample(src.repartition(13), "id", "w", 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 == s2) // partitioning-independent
    assert(s1.size == 10)
    assert(!s1.exists(_ >= 900L)) // zero/negative/null weights excluded
    // 100:1 weights: the sample should be (almost) all heavy ids
    assert(s1.count(_ < 100L) >= 8, s"too many light ids in $s1")
  }

  test("weightedSamplePerGroup: k winners per group, deterministic") {
    val df = (0 until 60).map(i =>
      (if (i % 2 == 0) "even" else "odd", i.toLong, 1.0 + i))
      .toDF("g", "id", "w")
    val out = Sampling.weightedSamplePerGroup(df, "g", "id", "w", 4)
    assert(out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("even" -> 4L, "odd" -> 4L))
    val again = Sampling.weightedSamplePerGroup(
      df.repartition(7), "g", "id", "w", 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
    // k larger than the group returns the whole group, no padding
    val all = Sampling.weightedSamplePerGroup(df, "g", "id", "w", 1000)
    assert(all.count() == 60)
  }

  test("weightedSample plans as TakeOrderedAndProject (no global sort)") {
    val df = (0 until 1000).map(i => (i.toLong, 1.0 + i)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("topk_freq: exact when capacity covers the domain, any partitioning") {
    import graft.functions.{GraftFunctions => GF}
    // zipfish counts over 26 items
    val rows = ('a' to 'z').zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(27 - i)(c.toString)
    }
    for (parts <- Seq(1, 13)) {
      val hh = rows.toDF("tk").repartition(parts)
        .agg(GF.topk_freq(col("tk"), 5, 64).as("hh"))
        .head().getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hh")
      assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 27L), ("b", 26L), ("c", 25L), ("d", 24L), ("e", 23L)),
        s"parts=$parts")
    }
  }

  test("topk_freq: MG error bound holds under eviction pressure") {
    import graft.functions.{GraftFunctions => GF}
    // heavy item (40%) + long tail, capacity 4 ≪ 101 distinct items
    val n = 5000
    val rows = (0 until n).map { i =>
      if (i % 5 < 2) "HEAVY" else s"tail_${i % 100}"
    }
    val hh = rows.toDF("tk").repartition(7)
      .agg(GF.topk_freq(col("tk"), 1, 4).as("hh"))
      .head().getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hh")
    val (item, cnt) = (hh.head.getString(0), hh.head.getLong(1))
    // any item at true frequency > n/(cap+1) = 1000 must be present, and
    // its reported count is a lower bound within the error budget
    assert(item == "HEAVY")
    val trueCount = 2 * n / 5
    assert(cnt <= trueCount)
    assert(cnt >= trueCount - n / (4 + 1), s"count $cnt vs $trueCount")
  }

  test("topk_freq: per-group sketches are independent") {
    import graft.functions.{GraftFunctions => GF}
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "tk")
    val out = df.groupBy("g").agg(GF.topk_freq(col("tk"), 2, 8).as("hh"))
      .orderBy("g").collect()
    val g1 = out(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
    val g2 = out(1).getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
    assert(g1.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 2L), ("y", 1L)))
    assert(g2.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("z", 1L)))
  }

  test("chunkDocs: exact overlapping windows, short/empty docs get one " +
      "chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "ab"), (3L, ""))
      .toDF("id", "text")
    val out = operators.Chunking.chunkDocs(df, "text", "id",
        size = 4, overlap = 1)
      .select("id", "chunk_id", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // stride 3 over 10 chars → ceil(9/3) = 3 chunks: 1-4, 4-7, 7-10
    assert(out == Map(
      (1L, 0L) -> "abcd", (1L, 1L) -> "defg", (1L, 2L) -> "ghij",
      (2L, 0L) -> "ab", (3L, 0L) -> ""))
    intercept[IllegalArgumentException](
      operators.Chunking.chunkDocs(df, "text", "id", 4, 4))
    // null text keeps its row (one chunk, null text) instead of vanishing
    val withNull = Seq((9L, Option.empty[String])).toDF("id", "text")
    val nr = operators.Chunking.chunkDocs(withNull, "text", "id", 4, 1)
      .select("id", "chunk_id", "chunk_text").collect()
    assert(nr.length == 1 && nr(0).getLong(1) == 0L && nr(0).isNullAt(2))
  }

  test("chunkDocs: chunks reconstruct the original text (real corpus)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val original = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val size = 37
    val overlap = 9
    val rebuilt = operators.Chunking.chunkDocs(docs, "text", "doc_id",
        size, overlap)
      .select("doc_id", "chunk_id", "chunk_text").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val ordered = rows.sortBy(_.getLong(1)).map(_.getString(2))
        id -> (ordered.head +: ordered.tail.map(_.drop(overlap))).mkString
      }
    assert(rebuilt == original) // overlap dedup + concat is lossless
  }

  test("temperatureWeights: sqrt rebalancing closed form, probs sum to 1, " +
      "cap saturates, alpha=1 reproduces natural shares") {
    // group sizes 1, 4, 16 -> sqrt scores 1, 2, 4 (tot 7)
    val rows = (1 to 1).map(i => ("a", i)) ++ (1 to 4).map(i => ("b", i)) ++
      (1 to 16).map(i => ("c", i))
    val df = rows.toDF("src", "k")
      .select(col("src"), (col("k") + when(col("src") === "b", 100)
        .when(col("src") === "c", 200).otherwise(0)).as("id"))
    val w = Sampling.temperatureWeights(df, "src", 0.5, 7L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(w("a")._1 == 1L && w("b")._1 == 4L && w("c")._1 == 16L)
    assert(math.abs(w("a")._2 - 1.0 / 7) < 1e-12)
    assert(math.abs(w("b")._2 - 2.0 / 7) < 1e-12)
    assert(math.abs(w("c")._2 - 4.0 / 7) < 1e-12)
    // rate = target * p / n: small groups get the highest keep-rate
    assert(math.abs(w("a")._3 - 1.0) < 1e-12)       // 7·(1/7)/1
    assert(math.abs(w("b")._3 - 0.5) < 1e-12)       // 7·(2/7)/4
    assert(math.abs(w("c")._3 - 0.25) < 1e-12)      // 7·(4/7)/16
    // enormous target saturates every cap at exactly 1.0
    val cap = Sampling.temperatureWeights(df, "src", 0.5, 1000000L)
      .collect().map(_.getDouble(3))
    assert(cap.forall(_ == 1.0))
    // alpha = 1 keeps natural proportions: p == n / N
    val nat = Sampling.temperatureWeights(df, "src", 1.0, 7L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(nat("c") - 16.0 / 21) < 1e-12)
    // application: rate-1 groups pass through; sampling is deterministic
    val s1 = Sampling.temperatureSample(df, "src", "id", 0.5, 1000000L)
    assert(s1.count() == df.count())
    val s2 = Sampling.temperatureSample(df, "src", "id", 0.5, 7L)
      .select("id").as[Long].collect().toSet
    val s3 = Sampling.temperatureSample(df.repartition(5), "src", "id",
      0.5, 7L).select("id").as[Long].collect().toSet
    assert(s2 == s3)
  }

  test("packByBudget: offset bins and boundary spans, per group") {
    val df = Seq(
      ("en", 1L, 3000L), ("en", 2L, 2000L), ("en", 3L, 100L),
      ("fr", 9L, 5000L))
      .toDF("lang", "id", "w")
    val out = Sampling.packByBudget(df, "lang", "id", "w", budget = 4096)
      .select("id", "start_offset", "bin", "spans").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (0L, 0L, 1L))      // 0..2999 inside bin 0
    assert(out(2L) == (3000L, 0L, 2L))   // 3000..4999 crosses into bin 1
    assert(out(3L) == (5000L, 1L, 1L))
    assert(out(9L) == (0L, 0L, 2L))      // fr stream restarts at 0
    // zero/negative/null weights fail fast instead of corrupting bins
    val bad = Seq(("en", 1L, 0L)).toDF("lang", "id", "w")
    val e = intercept[Exception] {
      Sampling.packByBudget(bad, "lang", "id", "w", 100).collect()
    }
    assert(e.getMessage.contains("must be positive"))
  }

  test("winsorize: exact percentile clamp keeps every row, interior " +
      "values untouched, bad bounds fail fast") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Sampling.winsorize(df, "v", 0.1, 0.9)
      .orderBy("id").collect()
    assert(out.length == 10) // clamp, never drop
    // percentile interpolation over 1..10: p10 = 1.9, p90 = 9.1
    assert(out.head.getDouble(2) == 1.9)
    assert(out.last.getDouble(2) == 9.1)
    assert(out(4).getDouble(2) == 5.0) // interior untouched
    intercept[IllegalArgumentException] {
      Sampling.winsorize(df, "v", 0.9, 0.1)
    }
  }

  test("keepTopFraction: exact quantile cutoff, ties kept, " +
      "partition invariance") {
    // scores 1..10: top 30% cutoff = percentile(0.7) = 7.3 → keep 8,9,10
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val kept = Sampling.keepTopFraction(df, "score", 0.3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(8L, 9L, 10L))
    // fraction 1.0 keeps everything
    assert(Sampling.keepTopFraction(df, "score", 1.0).count() == 10)
    // ties AT the cutoff all survive (deterministic over-keep)
    val tied = Seq.fill(8)(1.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, v) } ++ Seq((100L, 2.0), (101L, 2.0))
    val tkept = Sampling.keepTopFraction(tied.toDF("id", "score"),
      "score", 0.2).select("id").as[Long].collect().toSet
    assert(tkept == Set(100L, 101L))
    val p1 = Sampling.keepTopFraction(df.repartition(1), "score", 0.3)
      .select("id").as[Long].collect().toSet
    val p7 = Sampling.keepTopFraction(df.repartition(7), "score", 0.3)
      .select("id").as[Long].collect().toSet
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      Sampling.keepTopFraction(df, "score", 0.0)
    }
  }

  test("percentileNormalize: [0,1] range, tied scores share a rank, " +
      "singleton group -> 0, per-group independence") {
    val df = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 20.0), ("en", 4L, 40.0),
      ("fr", 5L, 999.0))
      .toDF("lang", "id", "score")
    val out = Sampling.percentileNormalize(df, "score", Some("lang"))
      .select("id", "pr").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == out(3L))           // ties share percent_rank
    assert(out(2L) == 1.0 / 3.0)         // rank 2 of 4 → (2-1)/(4-1)
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)               // singleton group
    // corpus-wide mode: one global ordering
    val g = Sampling.percentileNormalize(df, "score", None)
      .select("id", "pr").as[(Long, Double)].collect().toMap
    assert(g(5L) == 1.0)
  }

  test("scoreBuckets: per-group tertiles with deterministic tie-break, " +
      "head = lowest score, sizes differ by at most one") {
    // en: 7 docs (buckets 3/2/2), fr: 3 docs (1/1/1); two tied scores in
    // en must land deterministically by id
    val rows = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 20L), (4L, "en", 30L),
      (5L, "en", 40L), (6L, "en", 50L), (7L, "en", 60L),
      (11L, "fr", 5L), (12L, "fr", 6L), (13L, "fr", 7L))
      .toDF("id", "lang", "score")
    val out = Sampling.scoreBuckets(rows, "score", "id",
        nBuckets = 3, groupCol = Some("lang"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("bucket"), r.getAs[String]("bucket_label")))).toMap
    // en ordered (score, id): 1,2,3 | 4,5 | 6,7
    assert(out(1L) == ((1L, "head")) && out(2L) == ((1L, "head")) &&
      out(3L) == ((1L, "head")))
    assert(out(4L) == ((2L, "middle")) && out(5L) == ((2L, "middle")))
    assert(out(6L) == ((3L, "tail")) && out(7L) == ((3L, "tail")))
    assert(out(11L) == ((1L, "head")) && out(12L) == ((2L, "middle")) &&
      out(13L) == ((3L, "tail")))
  }

  test("scoreBuckets: label arity fails fast; custom bucket count works") {
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("id", "score")
    intercept[IllegalArgumentException] {
      Sampling.scoreBuckets(rows, "score", "id", nBuckets = 4)
    }
    val quartiles = Sampling.scoreBuckets(rows, "score", "id",
        nBuckets = 4, labels = Seq("q1", "q2", "q3", "q4"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket_label"))
      .toMap
    assert(quartiles == Map(1L -> "q1", 2L -> "q2", 3L -> "q3", 4L -> "q4"))
  }

  test("dsirSample: target-like docs outrank dissimilar ones; exactly " +
      "k rows; rerun/partition invariant") {
    // targets (1, 2) and their echoes (3, 4) speak one vocabulary; the
    // raw corpus is dominated by six alien docs with disjoint token
    // soup, so target tokens are rare in raw (big positive log-ratio)
    // and alien tokens score hard negative. numBuckets must sit below
    // the corpus token mass or Laplace smoothing washes the tiny target
    // model out. Separation is O(±300) — dwarfs any Gumbel draw — so
    // the top 4 must be exactly the target-vocabulary docs 1-4.
    val like = "the cat sat on the mat " * 50
    val docs = (Seq(1L -> like, 2L -> like, 3L -> like, 4L -> like)
      ++ (5L to 10L).map(d =>
        d -> ((1 to 12).map(i => s"zzq${d}x$i ").mkString * 25)))
      .toDF("doc_id", "text")
    val tgt = Seq(1L, 2L).toDF("doc_id")
    val out = Sampling.dsirSample(docs, tgt, "doc_id", "text", k = 4,
        numBuckets = 64)
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.forall(_.getDouble(1) > 0)) // target-like ⇒ lw > 0
    val rerun = Sampling.dsirSample(docs.repartition(7), tgt, "doc_id",
        "text", k = 4, numBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(rerun.toSeq ==
      out.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.dsirSample(docs, tgt, "doc_id", "text", k = 0)
    }
  }

  test("negativePairs: JVM-twin draw replay, never self, holes drop, " +
      "deterministic and partition-invariant") {
    val dense = (0L to 9L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Sampling.negativePairs(dense, "doc_id", k = 2, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // exact replay: each surviving draw is lo + md5-48(id:j) mod span
    out.foreach { case ((id, j), neg) =>
      val expect = 0L +
        graft.functions.PortableHash.hash48(s"$id:$j", 42L) % 10L
      assert(neg == expect && neg != id && (0L to 9L).contains(neg))
    }
    // every (anchor, j) either replays to a self-hit (dropped) or is kept
    val kept = (for { id <- 0L to 9L; j <- 1L to 2L } yield {
      val d = graft.functions.PortableHash.hash48(s"$id:$j", 42L) % 10L
      ((id, j), d)
    }).filter { case ((id, _), d) => d != id }.toMap
    assert(out == kept)
    // sparse ids: draws landing in holes vanish, survivors stay valid
    val sparse = Seq((0L, "a"), (100L, "b")).toDF("doc_id", "text")
    val sp = Sampling.negativePairs(sparse, "doc_id", k = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(sp.forall { case (a, n) => a != n && Set(0L, 100L)(n) })
    val re = Sampling.negativePairs(dense.repartition(7), "doc_id",
        k = 2, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(re == out)
    intercept[IllegalArgumentException] {
      Sampling.negativePairs(dense, "doc_id", k = 0)
    }
  }

  test("lengthGroupedBatches: batches cut along the (len, id) order; " +
      "paddingWaste audits pad-to-max cost; nulls and ties behave") {
    val d = Seq((1L, 10L), (2L, 5L), (3L, 12L), (4L, 7L), (5L, 9L),
      (6L, 5L)).toDF("id", "len")
    val b = Sampling.lengthGroupedBatches(d, "id", "len", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("batch_id"))
      .toMap
    // order by (len, id): 5@2, 5@6, 7@4, 9@5, 10@1, 12@3
    assert(b == Map(2L -> 0L, 6L -> 0L, 4L -> 1L, 5L -> 1L,
      1L -> 2L, 3L -> 2L))
    val w = Sampling.paddingWaste(
        Sampling.lengthGroupedBatches(d, "id", "len", 2), "len")
      .collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("max_len"),
          r.getAs[Long]("sum_len"), r.getAs[Long]("padding_waste"))))
      .toMap
    assert(w == Map(0L -> ((2L, 5L, 10L, 0L)), 1L -> ((2L, 9L, 16L, 2L)),
      2L -> ((2L, 12L, 22L, 2L))))
    // partial last batch; null lengths drop; all-equal lengths hit the
    // degenerate single-bucket path and still number densely
    val odd = Seq((1L, Some(4L)), (2L, None), (3L, Some(4L)),
      (4L, Some(4L))).toDF("id", "len")
    val ob = Sampling.lengthGroupedBatches(odd, "id", "len", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("batch_id"))
      .toMap
    assert(ob == Map(1L -> 0L, 3L -> 0L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      Sampling.lengthGroupedBatches(d, "id", "len", 0)
    }
    // rankBuckets is the only bound on the unpartitioned offset-frame
    // windows: a pathological 10^8 would degrade to a real
    // single-partition sort, so it fails fast instead
    intercept[IllegalArgumentException] {
      Sampling.lengthGroupedBatches(d, "id", "len", 2,
        rankBuckets = (1 << 20) + 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(d.withColumnRenamed("len", "s"), "id",
        "s", epochs = 2, rankBuckets = (1 << 20) + 1)
    }
  }

  test("tokenBudgetBatches: every multi-row batch's pad-to-max " +
      "footprint fits the budget, overweight rows land as singletons, " +
      "assignment is partition-invariant; autoRebatch flags the " +
      "measured argmin") {
    val rows = (0L until 200L).map(i => (i, 1L + (i * 37L) % 97L)) ++
      Seq((900L, 500L), (901L, 480L)) // overweight vs budget 256
    val df = rows.toDF("id", "len")
    val batched = Sampling.tokenBudgetBatches(df, "id", "len",
      budget = 256L, rankBuckets = 16)
    assert(batched.count() == rows.size.toLong, "every row lands")
    val audit = Sampling.paddingWaste(batched, "len").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("max_len"))))
      .toMap
    audit.values.foreach { case (n, mx) =>
      assert(n * mx <= 256L || n == 1L,
        s"batch footprint $n x $mx must fit the budget or be a " +
          "singleton (capacity floor)")
    }
    // the two overweight rows are singletons in their own batches
    val ow = batched.filter(col("id") >= 900L)
      .select("id", "batch_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ow.size == 2 && ow.values.toSet.size == 2)
    ow.values.foreach(b => assert(audit(b)._1 == 1L,
      s"overweight batch $b must be a singleton"))
    // deterministic under any partitioning
    val again = Sampling.tokenBudgetBatches(df.repartition(7), "id",
        "len", budget = 256L, rankBuckets = 16)
      .select("id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == batched.select("id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // autoRebatch: one row per candidate, exactly one chosen, and the
    // flag sits on the measured argmin
    val rep = Sampling.autoRebatch(df, "id", "len", 256L,
        Seq(2, 16, 64)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rep.length == 3 && rep.count(_._4 == 1L) == 1)
    val best = rep.minBy(r => (r._3, r._2, r._1))
    assert(best._4 == 1L,
      s"chosen must be the (waste, batches, buckets) argmin: $rep")
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetBatches(df, "id", "len", budget = 0L))
    intercept[IllegalArgumentException](
      Sampling.autoRebatch(df, "id", "len", 256L, Seq(4, 4)))
    intercept[IllegalArgumentException](
      Sampling.autoRebatch(df, "id", "len", 256L, Nil))
  }
}
