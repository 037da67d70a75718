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
    # relational fact/dim tables scale too (round-15 verdict #4: the
    # qa/qe/relational decade rings were not real while these were
    # copied unchanged). Copy k shifts every surrogate key by
    # k * (max+1) of ITS table, and foreign keys shift by the parent's
    # stride — replica orders point at replica customers, replica
    # lineitems at replica orders/parts/suppliers, so join fan-outs and
    # group cardinalities scale like the data (keys per group grow 1:1
    # with factor only where the base data has cross-copy keys — here
    # none do, matching a real SF scale-up where groups multiply).
    # region/nation stay fixed (they are fixed-size in TPC-H proper).
    strides = {}
    for t, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey")]:
        strides[t] = con.sql(
            f"SELECT max({key}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
    kjoin = (f"CROSS JOIN (SELECT unnest(generate_series(0, "
             f"{FACTOR - 1})) AS k) k")
    con.sql(f"""
      COPY (SELECT c_custkey + k.k * {strides['customer']} AS c_custkey,
              c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet' {kjoin}
            ORDER BY c_custkey)
      TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT s_suppkey + k.k * {strides['supplier']} AS s_suppkey,
              s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet' {kjoin}
            ORDER BY s_suppkey)
      TO '{out}/supplier.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT p_partkey + k.k * {strides['part']} AS p_partkey,
              p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet' {kjoin}
            ORDER BY p_partkey)
      TO '{out}/part.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT o_orderkey + k.k * {strides['orders']} AS o_orderkey,
              o_custkey + k.k * {strides['customer']} AS o_custkey,
              o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet' {kjoin}
            ORDER BY o_orderkey)
      TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT l_orderkey + k.k * {strides['orders']} AS l_orderkey,
              l_partkey + k.k * {strides['part']} AS l_partkey,
              l_suppkey + k.k * {strides['supplier']} AS l_suppkey,
              l_linenumber, l_quantity, l_extendedprice, l_discount,
              l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet' {kjoin}
            ORDER BY l_orderkey)
      TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in ["region", "nation"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ["documents", "embeddings", "events", "customer",
              "supplier", "part", "orders", "lineitem"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
