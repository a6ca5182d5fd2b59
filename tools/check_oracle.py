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


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
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
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = len(pd.read_parquet(p))
            print(f"ROWS {d}: {n} rows{' (EMPTY!)' if n == 0 else ''}")
    print(f"\n{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
