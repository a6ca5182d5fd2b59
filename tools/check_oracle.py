#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against DuckDB executing SparkEntry.oracleSql on the same source tables.
Dev tooling only (driver-side python env) — not part of the Spark library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


# Output column types safe for the driver's hash compare. DuckDB HUGEINT
# (sum of BIGINT) coerces to float64/object on the driver while Spark's
# parquet column is int64 — equal values, different hashed representation
# (r5's only red rows). Anything outside this set is at least suspect.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "FLOAT", "VARCHAR", "DATE", "BOOLEAN"}


def oracle_types(con, sql):
    """Column name→type of the oracle's output, without running it."""
    rows = con.execute(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()
    return {r[0]: r[1] for r in rows}


def main(sf_dir: str, out_dir: str) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Manifest log (one line per Verify run): a dump is fresh iff its most
    # recent manifest entry shares the NEWEST entry's git sha. Leftovers
    # from an older build read as phantom regressions — flag, don't FAIL.
    last_dump = {}
    head_sha, head_dirty = None, False
    mpath = f"{out_dir}/manifest.jsonl"
    if os.path.exists(mpath):
        for raw in open(mpath):
            if not raw.strip():
                continue
            m = json.loads(raw)
            head_sha, head_dirty = m.get("git_sha"), m.get("dirty", False)
            for qn in m.get("queries", []):
                last_dump[qn] = m.get("git_sha")
    if head_dirty:
        print("NOTE: last Verify ran on a dirty working tree — same-sha "
              "freshness is approximate")
    fails = stale = typewarn = skipped = 0
    for name, sql in sorted(oracle.items()):
        try:
            types = oracle_types(con, sql)
            bad = {c: t for c, t in types.items()
                   if t.split("(")[0] not in SAFE_TYPES}
            if any(t.startswith("HUGEINT") for t in bad.values()):
                print(f"FAIL {name}: HUGEINT output column(s) "
                      f"{ {c: t for c, t in bad.items()} } — driver will "
                      f"hash-mismatch; CAST ... AS BIGINT")
                fails += 1
                continue
            if bad:
                print(f"TYPEWARN {name}: non-standard output types {bad}")
                typewarn += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: describe failed: {e}")
            fails += 1
            continue
        dump = os.path.join(out_dir, name)
        if not os.path.isdir(dump):
            if head_sha is not None and name not in last_dump:
                skipped += 1  # filtered run never dumped it — not a failure
                continue
            print(f"ERROR {name}: no dump (listed in manifest but missing)")
            fails += 1
            continue
        if head_sha is not None and last_dump.get(name) not in (None, head_sha):
            print(f"STALE {name}: dumped at {str(last_dump[name])[:12]}, "
                  f"newest run is {str(head_sha)[:12]} — re-run Verify")
            stale += 1
            continue
        try:
            want = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            w, g = norm(want), norm(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                fails += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                fails += 1
                continue
            # value compare with float tolerance-free equality (both rounded)
            eq = True
            for c in w.columns:
                a, b = g[c], w[c]
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        eq = False
                        bad = (a.astype(float) != b.astype(float)) & ~(
                            a.isna() & b.isna())
                        print(f"  col {c}: first diffs\n",
                              pd.DataFrame({"got": a[bad], "want": b[bad]}).head())
                elif not a.astype(str).equals(b.astype(str)):
                    eq = False
                    bad = a.astype(str) != b.astype(str)
                    print(f"  col {c}: first diffs\n",
                          pd.DataFrame({"got": a[bad], "want": b[bad]}).head())
            if eq:
                print(f"PASS {name} ({len(w)} rows)")
            else:
                print(f"FAIL {name}: value mismatch")
                fails += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            fails += 1
    # rows-only queries (no oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = len(pd.read_parquet(p))
            print(f"ROWS {d}: {n} rows{' (EMPTY!)' if n == 0 else ''}")
    if head_sha:
        print(f"manifest head: sha={str(head_sha)[:12]} "
              f"dumped_ever={len(last_dump)}")
    print(f"\n{fails} failures, {stale} stale, {skipped} not-dumped-skipped,"
          f" {typewarn} type warnings")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
