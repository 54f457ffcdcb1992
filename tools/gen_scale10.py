#!/usr/bin/env python3
"""Synthesize a one-off 10x documents+embeddings fixture for the scale
probe (tools/scale10/, NOT /root/testdata -- the driver contract stays
untouched).

Design: 10 DISJOINT copies of the sf0.1 workload, so linear scaling is
the correct expectation for every bucketed family:

- documents: shard j offsets doc_id by j*1_000_000 and suffixes every
  whitespace token with "_j". Intra-shard duplicate/near-dup structure
  is EXACTLY the original (consistent token renaming preserves shingle
  equality within a shard); cross-shard shingle overlap is zero, so the
  duplicate density per row -- the thing that drives LSH/PPJoin/SimHash
  candidate counts -- stays constant at 10x rows.
- embeddings: shard j applies a seeded SIGNED PERMUTATION of the 64
  dims (an orthogonal transform): intra-shard dot products and norms
  are bit-preserved, cross-shard cosines are scrambled noise. vec_id
  offsets as above, label copied.

Deterministic (seed derived per shard). Run once:
    python3 tools/gen_scale10.py
"""
import random
import sys
import duckdb

# gen_scale10.py [shards] [outdir] — defaults reproduce the classic
# 10x fixture; `python3 tools/gen_scale10.py 30 tools/scale30` builds
# the second measured decade (same disjoint-shard construction, so
# linear scaling stays the correct null hypothesis at any multiple)
SRC = "/root/testdata/sf0.1"
SHARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "tools/scale10"
# optional comma-separated table filter (argv[3]) — the 100x decade
# needs only documents+embeddings (the FLAT stored-serve families),
# so `python3 tools/gen_scale10.py 100 tools/scale100
# documents,embeddings` skips the 60M-row lineitem multiplier
TABLES = (set(sys.argv[3].split(","))
          if len(sys.argv) > 3
          else {"documents", "embeddings", "orders", "lineitem",
                "events"})
OFF = 1_000_000

con = duckdb.connect()

import os
os.makedirs(OUT, exist_ok=True)

# documents: token-suffix remap per shard (pure SQL: suffix every token)
doc_parts = []
for j in range(SHARDS):
    doc_parts.append(f"""
      SELECT doc_id + {j * OFF} AS doc_id,
        array_to_string(list_transform(string_split(text, ' '),
          t -> t || '_{j}'), ' ') AS text,
        lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet')""")
if "documents" in TABLES:
    con.execute(f"""
      COPY ({' UNION ALL '.join(doc_parts)})
      TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

# embeddings: signed dim-permutation per shard
emb_parts = []
for j in range(SHARDS):
    rng = random.Random(42 + j)
    perm = list(range(1, 65))
    if j > 0:  # shard 0 keeps the identity (the 1x corpus embeds as-is)
        rng.shuffle(perm)
    signs = [1.0 if j == 0 or rng.random() < 0.5 else -1.0
             for _ in range(64)]
    elems = ", ".join(
        f"embedding[{perm[i]}] * {signs[i]}" for i in range(64))
    emb_parts.append(f"""
      SELECT vec_id + {j * OFF} AS vec_id,
        [{elems}]::FLOAT[] AS embedding, label
      FROM read_parquet('{SRC}/embeddings.parquet')""")
if "embeddings" in TABLES:
    con.execute(f"""
      COPY ({' UNION ALL '.join(emb_parts)})
      TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")

# orders: disjoint key-space copies (custkey offset per shard keeps
# per-priority distinct-customer density constant -- the KMV families'
# linear-null-hypothesis analogue of the token-suffix remap)
ord_parts = []
for j in range(SHARDS):
    ord_parts.append(f"""
      SELECT o_orderkey + {j * OFF} AS o_orderkey,
        o_custkey + {j * OFF} AS o_custkey,
        * EXCLUDE (o_orderkey, o_custkey)
      FROM read_parquet('{SRC}/orders.parquet')""")
if "orders" in TABLES:
    con.execute(f"""
      COPY ({' UNION ALL '.join(ord_parts)})
      TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")

# lineitem: disjoint key-space copies (the ANALYZE/equi-depth family's
# value distribution is copied verbatim -- rank math sees 10x rows of
# the same histogram)
li_parts = []
for j in range(SHARDS):
    li_parts.append(f"""
      SELECT l_orderkey + {j * OFF} AS l_orderkey,
        l_partkey + {j * OFF} AS l_partkey,
        l_suppkey + {j * OFF} AS l_suppkey,
        * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
      FROM read_parquet('{SRC}/lineitem.parquet')""")
if "lineitem" in TABLES:
    con.execute(f"""
      COPY ({' UNION ALL '.join(li_parts)})
      TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")

# events: disjoint user populations, timestamps untouched (per-user
# interval structure bit-preserved for the SCD2/session families)
ev_parts = []
for j in range(SHARDS):
    ev_parts.append(f"""
      SELECT event_id + {j * OFF} AS event_id,
        user_id + {j * OFF} AS user_id,
        * EXCLUDE (event_id, user_id)
      FROM read_parquet('{SRC}/events.parquet')""")
if "events" in TABLES:
    con.execute(f"""
      COPY ({' UNION ALL '.join(ev_parts)})
      TO '{OUT}/events.parquet' (FORMAT PARQUET)""")

for t in sorted(TABLES):
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")

# clustered embeddings: PLANTED-Gaussian fixture with KNOWN neighbor
# structure (the recall-curve caveat's fix): C well-separated centers
# (components N(0,1), near-orthogonal in 64-dim), points = center +
# N(0, 0.3) noise, so within-cluster cosine ~0.92 vs cross-cluster
# ~0 +/- 0.12 -- a query's true top-10 lies in its own 100-point
# cluster, and an IVF probe that finds the cluster serves high recall.
# This is the fixture where "recall@10 >= 0.9 at nProbe 8/64" is a
# property of the OPERATOR, not of noise (embeddings.parquet's
# near-random vectors bound recall to ~probe fraction by construction).
import pyarrow as pa
import pyarrow.parquet as pq

crng = random.Random(1234)
C, PTS, D, SIGMA = 200, 100, 64, 0.3
ids, embs, labels = [], [], []
vid = 0
for c in range(C):
    center = [crng.gauss(0.0, 1.0) for _ in range(D)]
    for _ in range(PTS):
        ids.append(vid)
        embs.append([center[i] + crng.gauss(0.0, SIGMA) for i in range(D)])
        labels.append(c)
        vid += 1
pq.write_table(pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{OUT}/embeddings_clustered.parquet")
print(f"embeddings_clustered: {len(ids)} rows ({C} clusters x {PTS})")
