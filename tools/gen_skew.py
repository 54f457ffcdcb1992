#!/usr/bin/env python3
"""Skew-stress fixture for the band-join dedup family (round-11 verdict
Next #3): the scale10-style disjoint-shard documents corpus PLUS one
PLANTED heavy near-dup family holding ~20% of all rows — every planted
doc shares ~97% of its tokens with one template, so MinHash/SimHash
band keys concentrate on ONE hot family and the band equi-join's
biggest bucket is ~hotN wide (the "curse of the last reducer" shape the
q260 pre-flight predicts and the q297 profile alarms on).

Construction:
- base: SHARDS disjoint copies of sf0.1 documents (token suffix _j per
  shard, exactly gen_scale10.py — intra-shard dup structure preserved,
  zero cross-shard shingle overlap);
- hot family: hotN = SHARDS * 1250 docs (1/5 of the final corpus) from
  one 120-token template; doc i replaces 4 rotating positions with
  tokens unique to i, so pairwise Jaccard ~0.93 (near-dup, NOT exact-
  dup — exact-hash pre-collapse cannot defuse it) and most band keys
  collide across the whole family.

Usage: python3 tools/gen_skew.py [shards] [outdir]
       python3 tools/gen_skew.py 10 tools/skew10
       python3 tools/gen_skew.py 30 tools/skew30
Deterministic; output is documents.parquet only (the band-join families
read nothing else).
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
SHARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "tools/skew10"
OFF = 1_000_000
HOT_PER_SHARD = 1250  # 5000 base docs/shard -> hot = 20% of the corpus
HOT_N = SHARDS * HOT_PER_SHARD
HOT_BASE = 900_000_000  # hot doc_ids live far above every shard range

import os
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()

doc_parts = []
for j in range(SHARDS):
    doc_parts.append(f"""
      SELECT doc_id + {j * OFF} AS doc_id,
        array_to_string(list_transform(string_split(text, ' '),
          t -> t || '_{j}'), ' ') AS text,
        lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet')""")

# the hot family, generated in SQL off a range() so 37.5k rows at 30x
# never round-trip through python: template token p is 'hot_tok_p';
# doc i swaps positions (i, i+31, i+62, i+93) mod 120 for unique tokens
tmpl_len = 120
doc_parts.append(f"""
  SELECT {HOT_BASE} + i AS doc_id,
    array_to_string(list_transform(range({tmpl_len}),
      p -> CASE WHEN p IN (i % {tmpl_len},
                  (i + 31) % {tmpl_len}, (i + 62) % {tmpl_len},
                  (i + 93) % {tmpl_len})
             THEN 'u' || i || '_' || p
             ELSE 'hot_tok_' || p END), ' ') AS text,
    'en' AS lang, 'planted_hot' AS source,
    {tmpl_len} * 10 AS n_chars
  FROM range({HOT_N}) t(i)""")

con.execute(f"""
  COPY ({' UNION ALL '.join(doc_parts)})
  TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

n, hot = con.execute(f"""
  SELECT count(*),
         sum(CASE WHEN source = 'planted_hot' THEN 1 ELSE 0 END)
  FROM read_parquet('{OUT}/documents.parquet')""").fetchone()
print(f"documents: {n} rows, hot family {hot} ({100.0 * hot / n:.1f}%)")
