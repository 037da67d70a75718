#!/usr/bin/env python3
"""Generate sf1 fixtures (10x sf0.1) for the shuffle-heavy verify sweep.

Replicates documents/embeddings/events 10-fold with shifted ids;
replica texts get a per-copy suffix token (so copies form realistic
near-dup families instead of exact-duplicate megaclusters), replica
embeddings get a deterministic first-component nudge (so cosine top-k
has no cross-copy ties), events shift both event_id and user_id (state
per user grows with event count, not user count). The remaining tables
are copied unchanged from sf0.1 (overwritten on every run, so a
regenerated sf0.1 never leaves stale copies behind). Oracles need no
changes: the DuckDB replay reads the same parquet.

Usage: python3 scripts/gen_sf1.py [outdir] [factor]
(default /tmp/sf1, factor 10; factor 100 -> an sf10 decade fixture)
(Driver-side python/duckdb only — not part of the Scala library.)
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
FACTOR = 10


def main(out, factor=FACTOR):
    global FACTOR
    FACTOR = factor
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
    for t in ["documents", "embeddings", "events"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
