#!/usr/bin/env python3
"""One-shot mechanical split of SparkEntry.scala into per-tier objects.

Pure text move: every query/oracle chunk is copied verbatim (with a
normalized trailing comma — Scala 2.13 allows trailing commas) into a
tier file; SparkEntry keeps the public contract (entry / queries /
oracleSql / fixtureYaml) and assembles the maps with ++.
"""
import re, os, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")  # keep no trailing newline handling

# --- boundaries (verified by hand against the current file) ---
def find(pred, lo=0):
    for i in range(lo, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit("boundary not found")

hdr_end = find(lambda l: l.startswith("/**"))  # object doc, exclusive
obj_start = find(lambda l: l.startswith("object SparkEntry {"))
q_open = find(lambda l: l.startswith("  def queries: "))
q_close = find(lambda l: l == "  )", q_open)
o_open = find(lambda l: l.startswith("  def oracleSql: "))
o_close = find(lambda l: l == "  )", o_open)

header = "\n".join(lines[:hdr_end])            # package + imports
helpers = lines[obj_start + 1:q_open]          # object body before queries
ctes = lines[q_close + 1:o_open]               # oracle CTE helper defs

ENTRY_RE = re.compile(r'^    "(q_[a-z0-9_]+)" ->')

def chunks(body):
    """Split a Map body into (name, text) chunks. Comment/blank lines
    immediately preceding an entry-start line belong to that entry."""
    starts = [i for i, l in enumerate(body) if ENTRY_RE.match(l)]
    out = []
    bounds = []
    for k, st in enumerate(starts):
        lo = st
        while lo > 0 and (body[lo - 1].strip() == "" or
                          body[lo - 1].lstrip().startswith("//") or
                          body[lo - 1].lstrip().startswith("*") or
                          body[lo - 1].lstrip().startswith("/*")):
            lo -= 1
        bounds.append(lo)
    bounds.append(len(body))
    for k, st in enumerate(starts):
        name = ENTRY_RE.match(body[st]).group(1)
        seg = body[bounds[k]:bounds[k + 1]]
        # strip leading/trailing blank lines
        while seg and seg[0].strip() == "":
            seg = seg[1:]
        while seg and seg[-1].strip() == "":
            seg = seg[:-1]
        # normalize trailing comma
        if not seg[-1].rstrip().endswith(","):
            seg[-1] = seg[-1] + ","
        out.append((name, "\n".join(seg)))
    return out

def tier(name):
    m = re.match(r"q_x(\d+)", name)
    if m:
        n = int(m.group(1))
        if n in (1, 2, 7):
            return "Dedup"
        if n == 3:
            return "Similarity"
        if n == 5:
            return "Multimodal"
        if n == 6:
            return "Sampling"
        return "Text"  # 4, 9..15
    if name.startswith("q_st"):
        return "TimeSeries"
    if name.startswith("q_g"):
        if name == "q_graph_build":
            return "Etl"
        return "Graph"
    if name.startswith("q_v") or name.startswith("q_o"):
        return "Validate"
    if name == "q_text_fingerprint":
        return "Text"
    return "Etl"

TIERS = ["Etl", "Graph", "TimeSeries", "Validate", "Dedup",
         "Similarity", "Text", "Multimodal", "Sampling"]
TIER_DOC = {
    "Etl": "sources, projection, joins (incl. as-of/range), merge/union, aggregates, windows, set ops, CDC, graph build",
    "Graph": "graph analytics G1-G27 (degrees ... incremental SCC, condensation, landmark reachability)",
    "TimeSeries": "time-series / event tier ST2-ST30 (windows, sessionization, forecasting, funnels, intervals)",
    "Validate": "validation + outlier tiers V1-V17, O1-O5 (rules, drift, distribution stats, HBOS, skyline)",
    "Dedup": "dedup X1/X2 (exact, MinHash/SimHash/semantic near-dup) + decontamination X7",
    "Similarity": "ANN serving lifecycle X3 (brute/IVF/PQ topK, rerank, index build/update/compact/delete)",
    "Text": "text analysis X4 + relevance/tokenizer tiers X9-X15 (quality, lang-id, TF-IDF/BM25, BPE, perplexity)",
    "Multimodal": "multimodal X5 (media metadata, decode, resize/resample, perceptual near-dups)",
    "Sampling": "sampling/splits/packing X6 (hash sample, splits, mixtures, curriculum, length batching)",
}

q_chunks = chunks(lines[q_open + 1:q_close])
o_chunks = chunks(lines[o_open + 1:o_close])
assert len(q_chunks) == 228, len(q_chunks)
assert len(o_chunks) == 225, len(o_chunks)

by_tier_q = {t: [] for t in TIERS}
by_tier_o = {t: [] for t in TIERS}
for n, txt in q_chunks:
    by_tier_q[tier(n)].append((n, txt))
for n, txt in o_chunks:
    by_tier_o[tier(n)].append((n, txt))

# --- EntryData: helpers minus entry() (stays in SparkEntry) ---
htxt = "\n".join(helpers)
entry_re = re.compile(
    r"  /\*\* Flagship:.*?\*/\n  def entry\(spark: SparkSession\): DataFrame =\n"
    r"    graphBuild\(spark, \"/root/testdata/sf0\.001\"\)\n",
    re.S)
m = entry_re.search(htxt)
assert m, "entry() block not found"
entry_block = m.group(0)
htxt = htxt.replace(entry_block, "")
# de-privatize top-level members (the object itself is private[graft])
htxt = re.sub(r"^  private (def|val|lazy val) ", r"  \1 ", htxt, flags=re.M)

os.makedirs("src/main/scala/graft/entries", exist_ok=True)

def write(path, text):
    with open(path, "w") as f:
        f.write(text if text.endswith("\n") else text + "\n")

write("src/main/scala/graft/entries/EntryData.scala", f"""{header}
/** Shared fixtures and memoized scratch state behind the
  * [[SparkEntry]] driver contract: table readers (the events
  * timestamp normalizer lives here), the hetero-graph edge builders,
  * the config fixture, and the per-process ANN index directories the
  * X3 serving queries reuse across bench iterations. Split out of
  * SparkEntry.scala mechanically — no behavior change. */
private[graft] object EntryData {{
{htxt.rstrip()}
}}
""")

ctes_text = re.sub(r"^  private (def|val|lazy val) ", r"  \1 ",
                   "\n".join(ctes), flags=re.M).rstrip()
write("src/main/scala/graft/entries/OracleCtes.scala", f"""{header}
/** Shared DuckDB-oracle CTE builders for [[SparkEntry.oracleSql]] —
  * the independent SQL rebuilds (dedup clustering, unrolled graph
  * rounds, IVF/PQ replays, BPE/MMR/ACF) the per-tier oracle maps
  * interpolate. Split out of SparkEntry.scala mechanically — no
  * behavior change. */
private[graft] object OracleCtes {{
{ctes_text}
}}
""")

for t in TIERS:
    qs = "\n\n".join(txt for _, txt in by_tier_q[t])
    ost = "\n\n".join(txt for _, txt in by_tier_o[t])
    names = [n for n, _ in by_tier_q[t]]
    write(f"src/main/scala/graft/entries/Queries{t}.scala", f"""{header}
/** {TIER_DOC[t]} — one slice of the [[SparkEntry]] driver contract
  * ({len(names)} queries). Chunks moved verbatim from SparkEntry.scala;
  * the assembled `queries`/`oracleSql` maps are unchanged. */
private[graft] object Queries{t} {{
  import EntryData._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{qs}
  )

  def oracles: Map[String, String] = Map(
{ost}
  )
}}
""")

qcat = " ++\n    ".join(f"Queries{t}.queries" for t in TIERS)
ocat = " ++\n    ".join(f"Queries{t}.oracles" for t in TIERS)
write(SRC, f"""package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the EXT LLM-pipeline operators), each with matching
  * DuckDB oracle SQL where the semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (SURVEY.md §5/§7): every query ends in an explicit
  * orderBy over a key; float aggregates are rounded; timestamps are
  * emitted as epoch seconds to dodge µs-vs-ns parquet physical types.
  *
  * The query/oracle definitions live in per-tier objects under
  * `entries/` (QueriesEtl, QueriesGraph, ...); this object assembles
  * them into the two driver-facing maps. Tier maps are disjoint by
  * construction (names are prefixed per tier) — asserted in
  * SparkEntrySpec.
  */
object SparkEntry {{

{entry_block.rstrip().replace("graphBuild(", "EntryData.graphBuild(")}

  /** The graph-spec fixture (FIXTURES.md §2) over the TPC-H-ish tables,
    * in the reference's config grammar. */
  def fixtureYaml(dir: String): String = EntryData.fixtureYaml(dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    {qcat}

  def oracleSql: Map[String, String] =
    {ocat}
}}
""")

print("tiers:", {t: (len(by_tier_q[t]), len(by_tier_o[t])) for t in TIERS})
print("total q:", sum(len(v) for v in by_tier_q.values()),
      "o:", sum(len(v) for v in by_tier_o.values()))
