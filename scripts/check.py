#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables and diff results.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
(Driver-side python/duckdb only — not part of the Scala library.)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # emulate: sort columns by name, then sort rows, compare values
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_bad += 1
                continue
            eq = g.equals(w)
            if not eq:
                # locate first differing cell for debugging
                diff = (g != w) & ~(g.isna() & w.isna())
                cells = diff.to_numpy().nonzero()
                i, j = cells[0][0], cells[1][0]
                print(f"FAIL {name}: first diff row {i} col {g.columns[j]}: "
                      f"got={g.iloc[i, j]!r} want={w.iloc[i, j]!r}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:300]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
