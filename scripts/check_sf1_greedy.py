"""Linear-time python replay of the four doc-level recursive-CTE oracles
(50k-deep recursion is impractical in DuckDB at sf1; the fold itself is
trivially linear). Semantics copied from the dumped oracle SQL."""
import os, sys
import duckdb, pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v8sf1"

con = duckdb.connect()
docs = con.sql(
    "SELECT row_number() OVER (ORDER BY doc_id) AS rn, "
    "len(string_split(text, ' ')) AS words "
    "FROM '/tmp/sf1/documents.parquet' ORDER BY 1").fetchall()

def greedy(toks, cap=8000):
    """(rn, toks) -> list of bins [(members:[(rn,toks)], sum_toks)];
    flush when acc+t > cap; INCLUDES the final partial bin last."""
    bins, cur, acc = [], [], 0
    for rn, t in toks:
        if cur and acc + t > cap:
            bins.append((cur, acc)); cur, acc = [], 0
        cur.append((rn, t)); acc += t
    if cur: bins.append((cur, acc))
    return bins

def norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def cmp(name, want):
    if not os.path.isdir(f"{OUT}/{name}"):
        print(f"skip   {name} (no dump in {OUT})", flush=True)
        return
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    g, w = norm(got), norm(want)
    ok = list(g.columns) == list(w.columns) and len(g) == len(w) and \
        g.astype(str).equals(w.astype(str))
    print(("ok    " if ok else "FAIL  ") + f" {name} (python replay)",
          flush=True)
    if not ok:
        print("got", g.head(), "\nwant", w.head())

# wds03 / wds18: single group, toks = 1034 + words; full bins only;
# key = '<tarIdx>-<fileIdx>' of the flush-triggering doc under the
# group's 100-doc aligned tars (reference cached_key semantics, the
# round-13 key fix); n_images = 4 * n_docs
toks = [(rn, 1034 + w) for rn, w in docs]
bins = greedy(toks)
rows = []
for i in range(len(bins) - 1):  # drop the final partial bin
    members, s = bins[i]
    k = bins[i + 1][0][0][0] - 1  # 0-based global file idx
    rows.append((f"{k // 100}-{k % 100}", s - (len(members) - 1),
                 4 * len(members)))
want = pd.DataFrame(rows, columns=["key", "n_tokens", "n_images"])
want["n_tokens"] = want["n_tokens"].astype("int32")
want["n_images"] = want["n_images"].astype("int32")
cmp("wds03_tokenize_pack", want)
cmp("wds18_stream_tokenize", want)

# wds04: toks = 518 + words, single group; nsamples = #full bins
toks4 = [(rn, 518 + w) for rn, w in docs]
bins4 = greedy(toks4)
want4 = pd.DataFrame([("shard_0-000000", len(bins4) - 1)],
                     columns=["shard", "nsamples"])
cmp("wds04_index_check", want4)

# wds11: 125-doc aligned chunks = merge groups; per group full bins:
# n_bins, n_docs, n_tokens = sum(sum_toks - (n_docs_in_bin - 1))
rows11 = []
for g in range(0, (len(docs) + 124) // 125):
    chunk = toks[g * 125:(g + 1) * 125]
    b = greedy(chunk)
    full = b[:-1]  # drop final partial bin
    if full:
        rows11.append((g, len(full), sum(len(m) for m, _ in full),
                       sum(s - (len(m) - 1) for m, s in full)))
want11 = pd.DataFrame(rows11,
    columns=["group", "n_bins", "n_docs", "n_tokens"])
cmp("wds11_tokenize_multi", want11)

# wds30: two-source mix — corpus A = even doc_ids in 3 aligned tars,
# B = odd in 2; url order is the seed-17 global shuffle [A0,A2,B1,B0,A1]
# (pinned in OpsExtraSpec); merge groups = shard-size-3 runs; per group
# the wds11 greedy fold (toks = 1034 + words, drop final partial bin).
par = con.sql(
    "SELECT doc_id, len(string_split(text, ' ')) AS words "
    "FROM '/tmp/sf1/documents.parquet' ORDER BY doc_id").fetchall()
ev = [(d, w) for d, w in par if d % 2 == 0]
od = [(d, w) for d, w in par if d % 2 == 1]
ca, cb = -(-len(ev) // 3), -(-len(od) // 2)
urls = {0: ev[0:ca], 1: ev[ca:2 * ca], 2: ev[2 * ca:],
        3: od[0:cb], 4: od[cb:]}
order = [0, 2, 4, 3, 1]
rows30 = []
for g in range(2):
    chunk = []
    for u in order[g * 3:(g + 1) * 3]:
        chunk.extend((d, 1034 + w) for d, w in urls[u])
    full = greedy(chunk)[:-1]
    if full:
        rows30.append((g, len(full), sum(len(m) for m, _ in full),
                       sum(s - (len(m) - 1) for m, s in full)))
want30 = pd.DataFrame(rows30,
    columns=["group", "n_bins", "n_docs", "n_tokens"])
cmp("wds30_mixed_tokenize", want30)

# wds31: curate (quality + exact-dedup; span disabled) -> per-25-doc
# aligned tars -> per-tar greedy fold with toks = 518 + words;
# nsamples = #full bins; tars with zero full bins write no shard
cur = con.sql("""
  WITH q AS (
    SELECT doc_id, text, len(string_split(text, ' ')) AS nw,
      (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
        / len(string_split(text, ' ')) AS ml
    FROM '/tmp/sf1/documents.parquet'),
  qk AS (
    SELECT doc_id, text FROM q
    WHERE nw >= 30 AND ml >= 3.0 AND ml <= 10.0
      AND NOT contains(lower(text), 'lorem ipsum')
      AND NOT contains(text, '{')
      AND NOT contains(lower(text), 'javascript'))
  SELECT doc_id, len(string_split(text, ' '))
  FROM qk
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
  ORDER BY doc_id""").fetchall()
rows31 = []
for t in range(0, (len(cur) + 24) // 25):
    chunk = [(d, 518 + w) for d, w in cur[t * 25:(t + 1) * 25]]
    full = greedy(chunk)[:-1]
    if full:
        rows31.append((t, len(full)))
want31 = pd.DataFrame(rows31, columns=["tar_seq", "nsamples"])
cmp("wds31_fleet_chain", want31)
