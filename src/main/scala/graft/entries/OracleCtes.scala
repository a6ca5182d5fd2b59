package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** Shared DuckDB-oracle CTE builders for [[SparkEntry.oracleSql]] —
  * the independent SQL rebuilds (dedup clustering, unrolled graph
  * rounds, IVF/PQ replays, BPE/MMR/ACF) the per-tier oracle maps
  * interpolate. Split out of SparkEntry.scala mechanically — no
  * behavior change. */
private[graft] object OracleCtes {

  /** Shared CTE prefix for the portable-MinHash oracles: positional
    * trigram rebuild → md5-48 base hash mod 2^31−1 → the SAME seed-derived
    * Carter–Wegman coefficients the Spark path uses (interpolated below,
    * so the two can never drift) → 4-hash band signatures. `lead` CTEs
    * (if any) are injected before `tok`; `docsRel` is the relation the
    * token rebuild reads (must expose doc_id, text). */
  /** Shared dedup-pipeline oracle prefix (q_x1c, q_x1d): exact keepers
    * (window min per text), portable LSH + exact-Jaccard ≥ 0.8 pairs
    * among the exact representatives, connected components as a
    * 6-round min-label unroll (MATERIALIZED — each round reads the
    * previous twice). Ends at `fc(doc_id, exact_keeper, cluster)` —
    * every document mapped to its near-dup cluster label. */
  def dedupClusterCtes: String = {
    val lead =
      """ek AS (
        |  SELECT doc_id,
        |    min(doc_id) OVER (PARTITION BY text) AS exact_keeper
        |  FROM documents
        |), reps AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN ek ON ek.doc_id = d.doc_id AND ek.exact_keeper = d.doc_id
        |), """.stripMargin
    val ccRounds = (1 to 6).map { i =>
      s""",
         |l$i AS MATERIALIZED (
         |  SELECT l.id, least(l.comp, COALESCE(m.mc, l.comp)) AS comp
         |  FROM l${i - 1} l LEFT JOIN (
         |    SELECT eadj.src AS id, min(l2.comp) AS mc
         |    FROM eadj JOIN l${i - 1} l2 ON l2.id = eadj.dst
         |    GROUP BY eadj.src) m USING (id))""".stripMargin
    }.mkString
    s"""${minhashPortableCtes(lead, "reps")},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM band x JOIN band y
       |    ON y.band = x.band AND y.sig = x.sig AND x.doc_id < y.doc_id
       |), dsh AS (
       |  SELECT DISTINCT doc_id, sh FROM sh
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id
       |), inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN dsh a ON a.doc_id = c.id_a
       |  JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
       |  GROUP BY c.id_a, c.id_b
       |), pairs AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |    / (sa.n + sb.n - i.n_inter) >= 0.8
       |), eadj AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), l0 AS MATERIALIZED (
       |  SELECT doc_id AS id, doc_id AS comp FROM reps
       |)$ccRounds,
       |fc AS (
       |  SELECT ek.doc_id, ek.exact_keeper, n.comp AS cluster
       |  FROM ek JOIN l6 n ON n.id = ek.exact_keeper)""".stripMargin
  }

  def minhashPortableCtes(lead: String = "",
      docsRel: String = "documents", perBand: Int = 4): String = {
    val values = graft.operators.Dedup.portableCoeffs(16, 42L).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH ${lead}tok AS (
       |  SELECT doc_id, u.tk, u.pos
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(trim(text), '\\s+') AS arr
       |        FROM $docsRel),
       |       LATERAL (SELECT unnest(arr) AS tk,
       |                generate_subscripts(arr, 1) AS pos) u
       |), sh AS (
       |  SELECT a.doc_id, a.tk || ' ' || b.tk || ' ' || c.tk AS sh
       |  FROM tok a
       |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
       |), hs AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(concat(42, ':', sh)), 1, 12))
       |      AS BIGINT) % 2147483647 AS h
       |  FROM sh
       |), coef(i, a, b) AS (VALUES $values),
       |mh AS (
       |  SELECT hs.doc_id, coef.i,
       |    min((hs.h * coef.a + coef.b) % 2147483647) AS mh
       |  FROM hs CROSS JOIN coef GROUP BY hs.doc_id, coef.i
       |), band AS (
       |  SELECT doc_id, (i // $perBand) AS band,
       |    string_agg(mh, ',' ORDER BY i) AS sig
       |  FROM mh GROUP BY doc_id, (i // $perBand)
       |)""".stripMargin
  }

  /** Shared CTE chain of the curation-pipeline oracles (q_x10*): quality
    * gate (Gopher rules) → exact keepers → portable LSH + Jaccard pairs →
    * 6-round CC unroll → decontamination → per-lang survivor counts
    * (`counts`). Each q_x10 variant appends its own quota-stage tail. */
  lazy val curationOracleCtes: String = {
    val lead =
      """corpus AS (
        |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 97 <> 0
        |), benchd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
        |), gs AS (
        |  SELECT doc_id, text, lang,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS n_toks,
        |    length(regexp_replace(text, '\s', '', 'g')) AS n_nonws,
        |    length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
        |      AS n_punct,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> lower(x) IN ('the','a','an','and','or','of','to','in',
        |        'is','are','was','it','that','this','for','on','with','as',
        |        'be','by','at'))) AS n_stop
        |  FROM corpus
        |), g AS (
        |  SELECT doc_id, text, lang FROM gs
        |  WHERE n_toks BETWEEN 20 AND 100000 AND n_toks > 0
        |    AND (n_nonws * 1.0 / n_toks) BETWEEN 3.0 AND 10.0
        |    AND n_stop >= 2 AND n_punct * 1.0 / n_toks < 0.5
        |), ek AS (
        |  SELECT doc_id, text, lang,
        |    min(doc_id) OVER (PARTITION BY text) AS exact_keeper
        |  FROM g
        |), reps AS (
        |  SELECT doc_id, text, lang FROM ek WHERE doc_id = exact_keeper
        |), """.stripMargin
    val ccRounds = (1 to 6).map { i =>
      s""",
         |l$i AS MATERIALIZED (
         |  SELECT l.id, least(l.comp, COALESCE(m.mc, l.comp)) AS comp
         |  FROM l${i - 1} l LEFT JOIN (
         |    SELECT eadj.src AS id, min(l2.comp) AS mc
         |    FROM eadj JOIN l${i - 1} l2 ON l2.id = eadj.dst
         |    GROUP BY eadj.src) m USING (id))""".stripMargin
    }.mkString
    s"""${minhashPortableCtes(lead, "reps")},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM band x JOIN band y
       |    ON y.band = x.band AND y.sig = x.sig AND x.doc_id < y.doc_id
       |), dsh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, sh FROM sh
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id
       |), inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN dsh a ON a.doc_id = c.id_a
       |  JOIN dsh b ON b.doc_id = c.id_b AND b.sh = a.sh
       |  GROUP BY c.id_a, c.id_b
       |), pairs AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |    / (sa.n + sb.n - i.n_inter) >= 0.8
       |), eadj AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), l0 AS MATERIALIZED (
       |  SELECT doc_id AS id, doc_id AS comp FROM reps
       |)$ccRounds,
       |ded AS MATERIALIZED (
       |  SELECT ek.doc_id, ek.lang FROM ek
       |  JOIN l6 n ON n.id = ek.exact_keeper
       |  WHERE ek.doc_id = n.comp
       |), btok AS (
       |  SELECT doc_id, u.tk, u.pos
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(trim(text), '\\s+') AS arr
       |        FROM benchd),
       |       LATERAL (SELECT unnest(arr) AS tk,
       |                generate_subscripts(arr, 1) AS pos) u
       |), bsh AS (
       |  SELECT DISTINCT a.tk || ' ' || b.tk || ' ' || c.tk AS sh
       |  FROM btok a
       |  JOIN btok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  JOIN btok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
       |), flag AS (
       |  SELECT DISTINCT s.doc_id
       |  FROM dsh s JOIN ded ON ded.doc_id = s.doc_id
       |  JOIN bsh ON bsh.sh = s.sh
       |), dec AS MATERIALIZED (
       |  SELECT d.doc_id, d.lang FROM ded d
       |  LEFT JOIN flag f ON f.doc_id = d.doc_id
       |  WHERE f.doc_id IS NULL
       |), counts AS (
       |  SELECT lang, count(*) AS n FROM dec GROUP BY lang
       |)""".stripMargin
  }

  /** Shared lang-ID CTE chain (p → s → lg): per-doc marker-presence
    * scores and the argmax-with-max-lang-tie-break as greatest() over
    * 'digit:lang' strings. Used by q_x4o (standalone) and q_x4b (the
    * composite report). */
  lazy val langGuessCtes: String =
    """p AS (
      |  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    (CASE WHEN position(' the ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' and ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' of ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('ing ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' to ' IN t) > 0 THEN 1 ELSE 0 END)
      |      AS s_en,
      |    (CASE WHEN position(' der ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' und ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' die ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('sch' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' ist ' IN t) > 0 THEN 1 ELSE 0 END)
      |      AS s_de,
      |    (CASE WHEN position(' le ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' la ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' et ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' les ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' des ' IN t) > 0 THEN 1 ELSE 0 END)
      |      AS s_fr,
      |    (CASE WHEN position(' el ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' de ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' que ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' los ' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position(' y ' IN t) > 0 THEN 1 ELSE 0 END)
      |      AS s_es,
      |    (CASE WHEN position('的' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('是' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('了' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('在' IN t) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN position('我' IN t) > 0 THEN 1 ELSE 0 END)
      |      AS s_zh
      |  FROM p),
      |lg AS (
      |  SELECT doc_id,
      |    CASE WHEN g LIKE '0%' THEN 'und' ELSE substr(g, 3) END
      |      AS lang_guess
      |  FROM (
      |    SELECT doc_id, greatest(
      |      CAST(s_en AS VARCHAR) || ':en',
      |      CAST(s_de AS VARCHAR) || ':de',
      |      CAST(s_fr AS VARCHAR) || ':fr',
      |      CAST(s_es AS VARCHAR) || ':es',
      |      CAST(s_zh AS VARCHAR) || ':zh') AS g
      |    FROM s))""".stripMargin

  /** Unrolled 6-hop seed BFS (G15): reached (seed, id, d) triples per
    * round; eccentricity = max layer per seed, n_reached the d > 0
    * count. Same MATERIALIZED discipline as the other unrolls. */
  lazy val eccentricityUnrolledOracle: String = {
    val hops = 6
    val base =
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT least(a.pk, b.pk) AS a, greatest(a.pk, b.pk) AS b
        |  FROM li a JOIN li b ON b.ok = a.ok AND a.pk < b.pk),
        |adj AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM e WHERE a <> b
        |  UNION ALL SELECT b, a FROM e WHERE a <> b),
        |f0 AS MATERIALIZED (
        |  SELECT id AS seed, id, 0 AS d FROM (
        |    SELECT DISTINCT id FROM (
        |      SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |    ORDER BY id LIMIT 3)),
        |r0 AS MATERIALIZED (SELECT seed, id, d FROM f0)""".stripMargin
    val rounds = (1 to hops).map { k =>
      s""",
         |f$k AS MATERIALIZED (
         |  SELECT DISTINCT p.seed, adj.dst AS id, $k AS d
         |  FROM f${k - 1} p JOIN adj ON adj.src = p.id
         |  LEFT JOIN r${k - 1} r ON r.seed = p.seed AND r.id = adj.dst
         |  WHERE r.id IS NULL),
         |r$k AS MATERIALIZED (
         |  SELECT seed, id, d FROM r${k - 1}
         |  UNION ALL SELECT seed, id, d FROM f$k)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT seed, CAST(max(d) AS BIGINT) AS eccentricity,
         |  count(CASE WHEN d > 0 THEN 1 END) AS n_reached
         |FROM r$hops GROUP BY seed ORDER BY seed""".stripMargin
  }

  /** Unrolled truncated-Brandes betweenness (G14, maxHops = 4): forward
    * layers carry exact-integer σ; the backward sweep accumulates
    * δ = Σ σ_v/σ_w (1 + δ_w) layer by layer. MATERIALIZED throughout —
    * every layer feeds both its successor and the backward sweep. */
  lazy val betweennessUnrolledOracle: String = {
    val hops = 4
    val base =
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT least(a.pk, b.pk) AS a, greatest(a.pk, b.pk) AS b
        |  FROM li a JOIN li b ON b.ok = a.ok AND a.pk < b.pk),
        |adj AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM e WHERE a <> b
        |  UNION ALL SELECT b, a FROM e WHERE a <> b),
        |l0 AS MATERIALIZED (
        |  SELECT id AS seed, id, CAST(1 AS BIGINT) AS sigma FROM (
        |    SELECT DISTINCT id FROM (
        |      SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |    ORDER BY id LIMIT 3)),
        |r0 AS MATERIALIZED (SELECT seed, id FROM l0)""".stripMargin
    val fwd = (1 to hops).map { k =>
      s""",
         |l$k AS MATERIALIZED (
         |  SELECT p.seed, adj.dst AS id, sum(p.sigma) AS sigma
         |  FROM l${k - 1} p JOIN adj ON adj.src = p.id
         |  LEFT JOIN r${k - 1} r ON r.seed = p.seed AND r.id = adj.dst
         |  WHERE r.id IS NULL
         |  GROUP BY p.seed, adj.dst),
         |r$k AS MATERIALIZED (
         |  SELECT seed, id FROM r${k - 1}
         |  UNION ALL SELECT seed, id FROM l$k)""".stripMargin
    }.mkString
    val back = (1 until hops).reverse.map { d =>
      val wDelta =
        if (d == hops - 1) "CAST(0 AS DOUBLE)"
        else s"COALESCE(bd${d + 1}.delta, 0)"
      val bJoin =
        if (d == hops - 1) ""
        else
          s"""
             |  LEFT JOIN bd${d + 1} ON bd${d + 1}.seed = w.seed
             |    AND bd${d + 1}.id = w.id""".stripMargin
      s""",
         |bd$d AS MATERIALIZED (
         |  SELECT v.seed, v.id,
         |    sum(CAST(v.sigma AS DOUBLE) / w.sigma * (1 + $wDelta))
         |      AS delta
         |  FROM l$d v JOIN adj ON adj.src = v.id
         |  JOIN l${d + 1} w ON w.seed = v.seed AND w.id = adj.dst$bJoin
         |  GROUP BY v.seed, v.id)""".stripMargin
    }.mkString
    val contribs = (1 until hops)
      .map(d => s"SELECT seed, id, delta FROM bd$d").mkString(
        "", "\n  UNION ALL ", "")
    base + fwd + back +
      s""",
         |basez AS (
         |  SELECT r.seed, r.id, CAST(0 AS DOUBLE) AS delta
         |  FROM r$hops r LEFT JOIN l0 ON l0.seed = r.seed AND l0.id = r.id
         |  WHERE l0.id IS NULL),
         |allc AS (
         |  SELECT seed, id, delta FROM basez
         |  UNION ALL $contribs
         |)
         |SELECT id,
         |  CAST(floor(sum(delta) * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |    AS bc_e4,
         |  count(DISTINCT seed) AS n_seeds
         |FROM allc GROUP BY id ORDER BY id""".stripMargin
  }

  /** Unrolled k-core peeling (G9): each round re-derives degrees on the
    * surviving edge set and drops nodes below k. Peeling past the
    * fixpoint is the identity, so a fixed unroll ≥ the fixpoint depth is
    * exact — 12 rounds against the measured 8 at sf0.01. Generated
    * programmatically so round count is a one-line change. */
  lazy val kcoreUnrolledOracle: String = {
    val rounds = 12
    // MATERIALIZED is load-bearing: every round references the previous
    // round TWICE, so DuckDB's default CTE inlining would expand e12 into
    // 2^12 copies of the base scan (observed as an fd-exhaustion blowup).
    val base =
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e0 AS MATERIALIZED (SELECT DISTINCT least(a.pk, b.pk) AS a,
        |              greatest(a.pk, b.pk) AS b
        |       FROM li a JOIN li b ON b.ok = a.ok AND a.pk < b.pk)""".stripMargin
    val chain = (1 to rounds).map { i =>
      s""",
         |k$i AS MATERIALIZED (SELECT id FROM (
         |    SELECT id, count(*) AS c FROM (
         |      SELECT a AS id FROM e${i - 1}
         |      UNION ALL SELECT b FROM e${i - 1}) GROUP BY id)
         |  WHERE c >= 4),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN k$i x ON x.id = e.a JOIN k$i y ON y.id = e.b)""".stripMargin
    }.mkString
    base + chain +
      s"""
         |SELECT DISTINCT id FROM (
         |  SELECT a AS id FROM e$rounds UNION ALL SELECT b FROM e$rounds)
         |ORDER BY id""".stripMargin
  }

  /** k-truss peeling unrolled like [[kcoreUnrolledOracle]] — each round
    * enumerates triangles in canonical a<b<c orientation, credits the
    * three edges, and keeps support ≥ k−2 = 2. Peeling past the fixpoint
    * is the identity; this graph reaches it in 2 rounds at sf0.01
    * (measured), so the 6-round unroll is EXACT with margin. */
  lazy val ktrussUnrolledOracle: String = {
    val rounds = 6
    val base =
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e0 AS MATERIALIZED (SELECT DISTINCT least(a.pk, b.pk) AS a,
        |              greatest(a.pk, b.pk) AS b
        |       FROM li a JOIN li b ON b.ok = a.ok AND a.pk < b.pk)""".stripMargin
    val chain = (1 to rounds).map { i =>
      s""",
         |t$i AS MATERIALIZED (
         |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |  FROM e${i - 1} e1 JOIN e${i - 1} e2
         |    ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e${i - 1} e3 ON e3.a = e1.b AND e3.b = e2.b),
         |s$i AS MATERIALIZED (
         |  SELECT a, b, count(*) AS sup FROM (
         |    SELECT a, b FROM t$i
         |    UNION ALL SELECT a, c FROM t$i
         |    UNION ALL SELECT b, c FROM t$i) GROUP BY a, b),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e JOIN s$i s
         |    ON s.a = e.a AND s.b = e.b WHERE s.sup >= 2)""".stripMargin
    }.mkString
    base + chain +
      s"""
         |SELECT a, b FROM e$rounds ORDER BY a, b""".stripMargin
  }

  /** Unrolled BPE rounds shared by the x13 oracles: round k counts
    * adjacent pairs on vocab v(k-1), picks the (cnt DESC, l, r) argmax
    * bK, and re-segments into vK with a seeded list_reduce fold — the
    * seed-with-first-element semantics coincide with the engine's
    * empty-accumulator fold because its first step always appends. */
  def bpeOracleCtes(rounds: Int,
      corpus: String = "documents"): String = {
    val head =
      s"""WITH w AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        |  FROM $corpus),
        |v0 AS MATERIALIZED (
        |  SELECT word, regexp_extract_all(word, '.') || ['</w>'] AS syms, wc
        |  FROM (SELECT word, count(*) AS wc FROM w
        |        WHERE len(word) > 0 GROUP BY word)),""".stripMargin
    val rs = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM v${k - 1}, unnest(range(1, len(syms))) t(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT word,
         |    list_reduce(list_transform(syms, s -> [s]),
         |      (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
         |        THEN acc[:len(acc)-1] || [b.l || b.r]
         |        ELSE acc || x END) AS syms,
         |    wc
         |  FROM v${k - 1} CROSS JOIN b$k b),""".stripMargin
    }.mkString("\n")
    s"$head\n$rs"
  }

  /** Unrolled MMR greedy (see q_x3d): candidate top-20 per query, then
    * `k` selection rounds — per round a raw-double argmax with vec_id
    * tie-break (both engines' cosine chains are bit-identical) and an
    * incremental greatest(pen, cos(cand, selected)) penalty update that
    * mirrors mmrRerank's maxSel array. λ constants are spelled exactly
    * as the scala doubles: 0.7 and (1.0 − 0.7) = 0.30000000000000004. */
  def mmrOracle(k: Int): String = {
    def cos(a: String, b: String) =
      s"""((SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
         |       FROM (SELECT unnest($a.cv) x, unnest($b.cv) y)) /
         |     (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
         |       FROM (SELECT unnest($a.cv) x))) *
         |      sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE))
         |       FROM (SELECT unnest($b.cv) y)))))""".stripMargin
    val score = "CAST(0.7 AS DOUBLE)*sim - " +
      "(CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))*pen"
    val head =
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |c0 AS (SELECT vec_id, embedding AS cv FROM embeddings),
        |prod AS (
        |  SELECT query_id, vec_id,
        |    sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |    sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS qq,
        |    sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS cc
        |  FROM (SELECT query_id, vec_id, unnest(qv) AS x, unnest(cv) AS y
        |        FROM q JOIN c0 ON query_id <> vec_id)
        |  GROUP BY query_id, vec_id),
        |c1 AS MATERIALIZED (
        |  SELECT r.query_id, r.vec_id, r.cosine AS sim, e.embedding AS cv,
        |    CAST(0 AS DOUBLE) AS pen
        |  FROM (SELECT query_id, vec_id,
        |          dot / (sqrt(qq) * sqrt(cc)) AS cosine,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, vec_id)
        |            AS rank
        |        FROM prod) r
        |  JOIN embeddings e ON e.vec_id = r.vec_id
        |  WHERE r.rank <= 20)""".stripMargin
    val rounds = (1 to k).flatMap { r =>
      val sel =
        s"""s$r AS MATERIALIZED (
           |  SELECT query_id, vec_id, cv, $score AS score FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY $score DESC, vec_id) AS rn FROM c$r)
           |  WHERE rn = 1)""".stripMargin
      val next = if (r == k) Nil else Seq(
        s"""c${r + 1} AS MATERIALIZED (
           |  SELECT a.query_id, a.vec_id, a.sim, a.cv,
           |    greatest(a.pen, ${cos("a", "s")}) AS pen
           |  FROM c$r a JOIN s$r s USING (query_id)
           |  WHERE a.vec_id <> s.vec_id)""".stripMargin)
      sel +: next
    }.mkString(",\n")
    val unioned = (1 to k).map(r =>
        s"SELECT query_id, vec_id, CAST($r AS BIGINT) AS mmr_rank,\n" +
          s"  ROUND(score, 6) AS mmr_score FROM s$r")
      .mkString("\nUNION ALL ")
    s"$head,\n$rounds\n$unioned\nORDER BY query_id, mmr_rank"
  }

  /** Shared moment CTEs for the ACF-family oracles (q_st14, q_st18):
    * milli-integerized values, all lag pairs from one window
    * partitioning, HUGEINT-exact sums cast to double. */
  val acfMomentCtes: String =
    """ev AS (
      |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
      |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
      |      AS x
      |  FROM events),
      |l AS (
      |  SELECT user_id, x,
      |    lag(x, 1) OVER w AS y1, lag(x, 2) OVER w AS y2,
      |    lag(x, 3) OVER w AS y3
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |p AS (
      |  SELECT user_id, 1 AS lag, x, y1 AS y FROM l WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 2, x, y2 FROM l WHERE y2 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 3, x, y3 FROM l WHERE y3 IS NOT NULL),
      |m AS (
      |  SELECT user_id, lag, count(*) AS np,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      |  FROM p GROUP BY user_id, lag)""".stripMargin

  /** One unrolled Louvain move round (see q_g23): k_{i→c} from
    * adjacency ⋈ labels, Σ_c from labels ⋈ degrees, the exact integer
    * score 2m·k_{i→c} − k_i·(Σ_c − [c=cur]·k_i) in HUGEINT, argmax by
    * (s DESC, c), then the md5-48 parity gate byte-identical to the
    * engine's PortableHash.hash48("42:<id>") — ungated rounds
    * ('u' in the schedule) skip the gate and move every node. `pfx`
    * namespaces the fine ("") vs coarse ("c") level; weighted rounds
    * sum `w` where unweighted ones count. */
  /** One unrolled PageRank power round — the q_g3 oracle shape,
    * parameterized so the warm-start (incremental) oracles replay the
    * IDENTICAL per-round arithmetic over a different edge table and
    * initial vector: dangling fold `<out>d` (rank mass on nodes with no
    * out-edges) then the damped round `<out>` reading ranks from
    * `prev`. Emitted WITHOUT a leading comma; callers join rounds with
    * ",\n" inside their WITH list. */
  def pageRankRoundSql(prev: String, out: String, e: String,
      deg: String, n: String, c: String): String =
    s"""${out}d AS (SELECT COALESCE(sum(r), 0) AS s FROM $prev
       |       WHERE id NOT IN (SELECT src FROM $e)),
       |$out AS (SELECT $n.id, (1 - 0.85)/(SELECT nn FROM $c) + 0.85*(COALESCE(f.s, 0)
       |         + (SELECT s FROM ${out}d)/(SELECT nn FROM $c)) AS r
       |       FROM $n LEFT JOIN (
       |         SELECT $e.dst AS id, sum($prev.r/$deg.d) AS s FROM $e
       |         JOIN $prev ON $prev.id = $e.src JOIN $deg ON $deg.src = $e.src
       |         GROUP BY $e.dst) f USING (id))""".stripMargin

  def louvainRoundSql(r: Int, pfx: String, adj: String,
      deg: String, weighted: Boolean, gated: Boolean,
      mTable: String = "m"): String = {
    val kic =
      if (weighted) s"sum($adj.w)" else "CAST(count(*) AS HUGEINT)"
    val pick =
      if (gated)
        s"""CASE WHEN (CAST(concat('0x', substr(md5(concat(42, ':',
           |        id)), 1, 12)) AS BIGINT) + $r) % 2 = 0
           |      THEN c ELSE cur END""".stripMargin
      else "c"
    s""",
       |${pfx}kin$r AS (SELECT $adj.dst AS id, l.lbl AS c, $kic AS kic
       |  FROM $adj JOIN ${pfx}l$r l ON l.id = $adj.src GROUP BY 1, 2),
       |${pfx}cand$r AS (SELECT id, c, max(kic) AS kic FROM (
       |    SELECT id, c, kic FROM ${pfx}kin$r
       |    UNION ALL SELECT id, lbl, CAST(0 AS HUGEINT) FROM ${pfx}l$r)
       |  GROUP BY 1, 2),
       |${pfx}tot$r AS (SELECT l.lbl AS c, sum($deg.k) AS tot
       |  FROM ${pfx}l$r l JOIN $deg ON $deg.id = l.id GROUP BY 1),
       |${pfx}sc$r AS (SELECT cand.id, cand.c, cur.lbl AS cur,
       |    2 * $mTable.m * cand.kic - $deg.k *
       |      (tot.tot - CASE WHEN cand.c = cur.lbl THEN $deg.k
       |                 ELSE CAST(0 AS HUGEINT) END) AS s
       |  FROM ${pfx}cand$r cand
       |  JOIN ${pfx}l$r cur ON cur.id = cand.id
       |  JOIN $deg ON $deg.id = cand.id
       |  JOIN ${pfx}tot$r tot ON tot.c = cand.c, $mTable),
       |${pfx}b$r AS (SELECT id, c, cur FROM (
       |    SELECT id, c, cur,
       |      row_number() OVER (PARTITION BY id ORDER BY s DESC, c)
       |        AS rn
       |    FROM ${pfx}sc$r) WHERE rn = 1),
       |${pfx}l${r + 1} AS MATERIALIZED (SELECT id,
       |    $pick AS lbl
       |  FROM ${pfx}b$r)""".stripMargin
  }

  /** The full q_g23 two-level Louvain unroll up to `fin(id, lbl)`:
    * co-occurrence graph, 4 fine rounds on the "ugug" alternating
    * schedule, coarsen into the weighted community supergraph
    * (self-loops count TWICE in coarse degree — the convention under
    * which coarsening preserves Q), 4 weighted coarse rounds (same
    * schedule), then projection back down. */
  def louvainOracleCtes: String = {
    val fine =
      (0 until 4).map(r =>
        louvainRoundSql(r, "", "adj", "deg", false, gated = r % 2 == 1))
        .mkString
    val coarse =
      (0 until 4).map(r =>
        louvainRoundSql(r, "c", "cadj", "cdeg", true, gated = r % 2 == 1))
        .mkString
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |  WHERE l_orderkey % 20 = 0),
       |e AS MATERIALIZED (SELECT DISTINCT a.pk AS a, b.pk AS b
       |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |adj AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b, a FROM e),
       |deg AS MATERIALIZED (SELECT src AS id,
       |    CAST(count(*) AS HUGEINT) AS k FROM adj GROUP BY 1),
       |m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
       |l0 AS (SELECT id, id AS lbl FROM deg)$fine,
       |ce AS MATERIALIZED (SELECT least(la.lbl, lb.lbl) AS a,
       |    greatest(la.lbl, lb.lbl) AS b, CAST(count(*) AS HUGEINT) AS w
       |  FROM e JOIN l4 la ON la.id = e.a JOIN l4 lb ON lb.id = e.b
       |  GROUP BY 1, 2),
       |cadj AS MATERIALIZED (
       |  SELECT a AS src, b AS dst, w FROM ce WHERE a <> b
       |  UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       |cdeg AS MATERIALIZED (SELECT id, sum(w) AS k FROM (
       |  SELECT src AS id, w FROM cadj
       |  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b) GROUP BY 1),
       |cl0 AS (SELECT id, id AS lbl FROM cdeg)$coarse,
       |fin AS MATERIALIZED (
       |  SELECT f.id, c.lbl FROM l4 f JOIN cl4 c ON c.id = f.lbl)"""
      .stripMargin
  }

  /** The WEIGHTED two-level Louvain unroll (q_g24b) over the q_j7
    * co-occurrence graph: edge weight = shared-order count, BOTH levels
    * run weighted rounds (kic sums w, degrees sum incident w, m = Σw —
    * the same total at both levels since coarsening preserves weight
    * mass), same "ugug" schedule and md5-48 gate as the unweighted
    * unroll. Ends at `fin(id, lbl)` with `e(a, b, w)` still in scope
    * for the refinement replay. */
  def louvainWeightedOracleCtes: String = {
    val fine =
      (0 until 4).map(r =>
        louvainRoundSql(r, "", "adj", "deg", true, gated = r % 2 == 1))
        .mkString
    val coarse =
      (0 until 4).map(r =>
        louvainRoundSql(r, "c", "cadj", "cdeg", true, gated = r % 2 == 1))
        .mkString
    s"""WITH mem AS (
       |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
       |sz AS (SELECT g, count(*) AS n FROM mem GROUP BY g),
       |kept AS (SELECT mem.g, mem.i FROM mem JOIN sz USING (g)
       |  WHERE sz.n <= 10),
       |e AS MATERIALIZED (
       |  SELECT a.i AS a, b.i AS b, CAST(count(*) AS HUGEINT) AS w
       |  FROM kept a JOIN kept b ON a.g = b.g AND a.i < b.i
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |adj AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM e
       |        UNION ALL SELECT b, a, w FROM e),
       |deg AS MATERIALIZED (SELECT src AS id, sum(w) AS k
       |  FROM adj GROUP BY 1),
       |m AS (SELECT sum(w) AS m FROM e),
       |l0 AS (SELECT id, id AS lbl FROM deg)$fine,
       |ce AS MATERIALIZED (SELECT least(la.lbl, lb.lbl) AS a,
       |    greatest(la.lbl, lb.lbl) AS b, sum(e.w) AS w
       |  FROM e JOIN l4 la ON la.id = e.a JOIN l4 lb ON lb.id = e.b
       |  GROUP BY 1, 2),
       |cadj AS MATERIALIZED (
       |  SELECT a AS src, b AS dst, w FROM ce WHERE a <> b
       |  UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       |cdeg AS MATERIALIZED (SELECT id, sum(w) AS k FROM (
       |  SELECT src AS id, w FROM cadj
       |  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b) GROUP BY 1),
       |cl0 AS (SELECT id, id AS lbl FROM cdeg)$coarse,
       |fin AS MATERIALIZED (
       |  SELECT f.id, c.lbl FROM l4 f JOIN cl4 c ON c.id = f.lbl)"""
      .stripMargin
  }

  /** IVF-PQ rebuilt step-for-step in DuckDB — shared by q_x3i (build
    * in memory, query), q_x3j (save to parquet, load, query), and
    * q_x3k (build on a base slice, incrementally absorb the rest):
    * the persisted/updated index must return the exact same rows.
    * `trainWhere` restricts the rows the QUANTIZERS (centroids +
    * codebooks) are sampled from — assignment and encoding always run
    * over the whole corpus, which is exactly what updateIndex's
    * frozen-quantizer append converges to. The CTE prefix (through
    * `sc(query_id, vec_id, adist)`) is also the ivfpq leg of the
    * q_x3l recall audit. */
  def ivfCoarseCtesFrom(trainWhere: String,
      corpus: String = "embeddings", prelude: String = ""): String =
    s"""WITH $prelude cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS cv FROM (
        |    SELECT vec_id, embedding FROM $corpus $trainWhere
        |    ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
        |    LIMIT 32)),
        |casn0 AS (
        |  SELECT c.vec_id, ct.centroid_id,
        |    (SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
        |       FROM (SELECT unnest(c.embedding) x, unnest(ct.cv) y)) /
        |    (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
        |       FROM (SELECT unnest(c.embedding) x))) *
        |     sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE))
        |       FROM (SELECT unnest(ct.cv) y)))) AS csim
        |  FROM $corpus c CROSS JOIN cent ct),
        |cell AS MATERIALIZED (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, centroid_id) rn FROM casn0)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, embedding FROM $corpus
        |      WHERE vec_id < 8),
        |probe0 AS (
        |  SELECT q.query_id, ct.centroid_id,
        |    (SELECT sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
        |       FROM (SELECT unnest(q.embedding) x, unnest(ct.cv) y)) /
        |    (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))
        |       FROM (SELECT unnest(q.embedding) x))) *
        |     sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE))
        |       FROM (SELECT unnest(ct.cv) y)))) AS csim
        |  FROM q CROSS JOIN cent ct),
        |probed AS (
        |  SELECT query_id, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY csim DESC, centroid_id) rn FROM probe0)
        |  WHERE rn <= 8),
        |cb0 AS (
        |  SELECT vec_id, embedding,
        |    row_number() OVER (
        |      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1
        |      AS code
        |  FROM (SELECT vec_id, embedding FROM $corpus $trainWhere
        |        ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
        |        LIMIT 16)),
        |subs AS (SELECT unnest(generate_series(0, 7)) AS sub)"""
      .stripMargin

  def ivfPqOracleCtesFrom(trainWhere: String,
      corpus: String = "embeddings", prelude: String = ""): String =
    ivfCoarseCtesFrom(trainWhere, corpus, prelude) +
    s""",
        |cb AS MATERIALIZED (
        |  SELECT subs.sub, cb0.code,
        |    list_slice(cb0.embedding, subs.sub * 8 + 1, subs.sub * 8 + 8)
        |      AS cw
        |  FROM cb0 CROSS JOIN subs),
        |encd0 AS (
        |  SELECT e.vec_id, cb.sub, cb.code,
        |    (SELECT sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
        |     FROM (SELECT
        |         unnest(list_slice(e.embedding,
        |           cb.sub * 8 + 1, cb.sub * 8 + 8)) x,
        |         unnest(cb.cw) y)) AS d
        |  FROM $corpus e CROSS JOIN cb),
        |enc AS MATERIALIZED (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d, code) rn FROM encd0)
        |  WHERE rn = 1),
        |dt0 AS MATERIALIZED (
        |  SELECT q.query_id, cb.sub, cb.code,
        |    (SELECT sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
        |     FROM (SELECT
        |         unnest(list_slice(q.embedding,
        |           cb.sub * 8 + 1, cb.sub * 8 + 8)) x,
        |         unnest(cb.cw) y)) AS d
        |  FROM q CROSS JOIN cb),
        |terms AS (
        |  SELECT d0.query_id, en.vec_id, list(d0.d ORDER BY en.sub) AS ds
        |  FROM enc en
        |  JOIN cell ce ON ce.vec_id = en.vec_id
        |  JOIN probed p ON p.centroid_id = ce.centroid_id
        |  JOIN dt0 d0 ON d0.query_id = p.query_id
        |    AND d0.sub = en.sub AND d0.code = en.code
        |  WHERE d0.query_id <> en.vec_id
        |  GROUP BY d0.query_id, en.vec_id),
        |sc AS (
        |  SELECT query_id, vec_id,
        |    ds[1] + ds[2] + ds[3] + ds[4]
        |      + ds[5] + ds[6] + ds[7] + ds[8] AS adist
        |  FROM terms)""".stripMargin

  def ivfPqOracleSqlFrom(trainWhere: String,
      corpus: String = "embeddings", prelude: String = ""): String =
    ivfPqOracleCtesFrom(trainWhere, corpus, prelude) +
      """
        |SELECT query_id, vec_id,
        |  CAST(floor(adist * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS adist_e4,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |  ORDER BY adist, vec_id) AS rank FROM sc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def ivfPqOracleSql: String = ivfPqOracleSqlFrom("")

  /** Residual IVF-PQ CTE suffix (q_x3m, and the residual leg of
    * q_x3l): assumes [[ivfCoarseCtesFrom]]'s cent/cell/q/probed/cb0/
    * subs in scope. Codebooks carry BOTH the sampled row's sub-slice
    * and its own centroid's, so every distance is Σ ((x−a) − (y−b))²
    * with the exact association the engine's fused kernel uses
    * ((x−c) − w, w = y−b prebuilt in double); the query-side table is
    * keyed by (query_id, centroid_id) — residual ADC's cell
    * dependence — and terms join on the cell. Ends at
    * `rsc(query_id, vec_id, adist)`. `corpus` names the relation the
    * ENCODING pass runs over — `rotc` for the OPQ (rotated) index
    * replays, whose quantizers and codes all live in the rotated
    * basis. */
  def ivfPqResidualSuffixCtes: String = ivfPqResidualSuffixCtesFrom()

  def ivfPqResidualSuffixCtesFrom(
      corpus: String = "embeddings"): String =
    s""",
        |cbr AS MATERIALIZED (
        |  SELECT subs.sub, cb0.code,
        |    list_slice(cb0.embedding, subs.sub * 8 + 1, subs.sub * 8 + 8)
        |      AS sv,
        |    list_slice(sct.cv, subs.sub * 8 + 1, subs.sub * 8 + 8)
        |      AS scv
        |  FROM cb0
        |  JOIN cell sce ON sce.vec_id = cb0.vec_id
        |  JOIN cent sct ON sct.centroid_id = sce.centroid_id
        |  CROSS JOIN subs),
        |rencd0 AS (
        |  SELECT e.vec_id, cbr.sub, cbr.code,
        |    (SELECT sum(((CAST(x AS DOUBLE) - CAST(a AS DOUBLE))
        |              - (CAST(y AS DOUBLE) - CAST(b AS DOUBLE)))
        |            * ((CAST(x AS DOUBLE) - CAST(a AS DOUBLE))
        |              - (CAST(y AS DOUBLE) - CAST(b AS DOUBLE))))
        |     FROM (SELECT
        |         unnest(list_slice(e.embedding,
        |           cbr.sub * 8 + 1, cbr.sub * 8 + 8)) x,
        |         unnest(list_slice(ecv.cv,
        |           cbr.sub * 8 + 1, cbr.sub * 8 + 8)) a,
        |         unnest(cbr.sv) y,
        |         unnest(cbr.scv) b)) AS d
        |  FROM $corpus e
        |  JOIN cell ece ON ece.vec_id = e.vec_id
        |  JOIN cent ecv ON ecv.centroid_id = ece.centroid_id
        |  CROSS JOIN cbr),
        |renc AS MATERIALIZED (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |      ORDER BY d, code) rn FROM rencd0)
        |  WHERE rn = 1),
        |rdt0 AS MATERIALIZED (
        |  SELECT q.query_id, p.centroid_id, cbr.sub, cbr.code,
        |    (SELECT sum(((CAST(x AS DOUBLE) - CAST(a AS DOUBLE))
        |              - (CAST(y AS DOUBLE) - CAST(b AS DOUBLE)))
        |            * ((CAST(x AS DOUBLE) - CAST(a AS DOUBLE))
        |              - (CAST(y AS DOUBLE) - CAST(b AS DOUBLE))))
        |     FROM (SELECT
        |         unnest(list_slice(q.embedding,
        |           cbr.sub * 8 + 1, cbr.sub * 8 + 8)) x,
        |         unnest(list_slice(pcv.cv,
        |           cbr.sub * 8 + 1, cbr.sub * 8 + 8)) a,
        |         unnest(cbr.sv) y,
        |         unnest(cbr.scv) b)) AS d
        |  FROM q
        |  JOIN probed p ON p.query_id = q.query_id
        |  JOIN cent pcv ON pcv.centroid_id = p.centroid_id
        |  CROSS JOIN cbr),
        |rterms AS (
        |  SELECT d0.query_id, en.vec_id, list(d0.d ORDER BY en.sub) AS ds
        |  FROM renc en
        |  JOIN cell ce ON ce.vec_id = en.vec_id
        |  JOIN rdt0 d0 ON d0.centroid_id = ce.centroid_id
        |    AND d0.sub = en.sub AND d0.code = en.code
        |  WHERE d0.query_id <> en.vec_id
        |  GROUP BY d0.query_id, en.vec_id),
        |rsc AS (
        |  SELECT query_id, vec_id,
        |    ds[1] + ds[2] + ds[3] + ds[4]
        |      + ds[5] + ds[6] + ds[7] + ds[8] AS adist
        |  FROM rterms)""".stripMargin

  def ivfPqResidualOracleSql: String =
    ivfCoarseCtesFrom("") + ivfPqResidualSuffixCtes +
      """
        |SELECT query_id, vec_id,
        |  CAST(floor(adist * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS adist_e4,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |  ORDER BY adist, vec_id) AS rank FROM rsc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
}
