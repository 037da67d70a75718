#!/usr/bin/env python3
"""sf1 variant with a SURVIVOR-BEARING near-dup profile (round-13
directive 3: qc09's terminal budget stage needs an sf1 line).

gen_sf1.py replicates every document 10-fold with a per-copy suffix
token — realistic near-dup FAMILIES for the dedup gates, but lethal to
the curate funnel's span filter: with 10 near-identical copies, every
gram of every family member is duplicated across >= 10 docs, dup_frac
~= 1 corpus-wide, and qc09's funnel empties before the token-budget
stage (both engines agree at 0 rows — signal, but no scale line for
the budget arithmetic).

This variant keeps 20% of families as SINGLETONS (doc_id % 5 == 0
emits only the k=0 original): those docs carry sf0.1-like gram
profiles, survive the span filter exactly as they do at sf0.1, and the
budget stage provisions real per-source quotas over them at ~8.2x
sf0.1 corpus size. embeddings/events/TPC-H tables replicate/copy as in
gen_sf1.py so the full Verify harness runs unchanged.

Usage: python3 scripts/gen_sf1_survivors.py [outdir]  (default /tmp/sf1s)
(Driver-side python/duckdb only — not part of the Scala library.)
"""
import shutil
import sys
import os

import duckdb

SRC = "/root/testdata/sf0.1"
FACTOR = 10


def main(out):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
      COPY (
        SELECT d.doc_id + k.k * (SELECT max(doc_id) + 1
                                 FROM '{SRC}/documents.parquet') AS doc_id,
               CASE WHEN k.k = 0 THEN d.text
                    ELSE d.text || ' v' || k.k END AS text,
               d.lang, d.source,
               length(CASE WHEN k.k = 0 THEN d.text
                    ELSE d.text || ' v' || k.k END)::BIGINT AS n_chars
        FROM '{SRC}/documents.parquet' d
        CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS k) k
        WHERE d.doc_id % 5 <> 0 OR k.k = 0   -- 20% singleton families
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (
        SELECT e.vec_id + k.k * (SELECT max(vec_id) + 1
                                 FROM '{SRC}/embeddings.parquet') AS vec_id,
               CASE WHEN k.k = 0 THEN e.embedding
                    ELSE list_prepend(e.embedding[1] + k.k * 0.001,
                                      e.embedding[2:])::FLOAT[]
               END AS embedding,
               e.label
        FROM '{SRC}/embeddings.parquet' e
        CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS k) k
        ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (
        SELECT e.event_id + k.k * (SELECT max(event_id) + 1
                                   FROM '{SRC}/events.parquet') AS event_id,
               e.ts,
               e.user_id + k.k * (SELECT max(user_id) + 1
                                  FROM '{SRC}/events.parquet') AS user_id,
               e.event_type, e.value, e.props
        FROM '{SRC}/events.parquet' e
        CROSS JOIN (SELECT unnest(generate_series(0, {FACTOR - 1})) AS k) k
        ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET)""")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ["documents"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        s = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet' "
                    "WHERE doc_id % 5 = 0 AND doc_id < "
                    f"(SELECT max(doc_id) + 1 FROM '{SRC}/{t}.parquet')"
                    ).fetchone()[0]
        print(t, n, "singleton-family originals:", s)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1s")
