#!/bin/bash
# Round-12 second-session scale probes: the placement family (q378-q382),
# the CBO statistics family (q383-q388), and the stored-ANALYZE lifecycle
# (q389-q392) measured at 1x (sf0.1) and the 10x decade (tools/scale10,
# gen_scale10.py). Sequential n=1 probes, 900 s cap each.
# Usage: tools/scale_probe_r12b.sh <outdir>
set -u
OUT=${1:-/tmp/scale_r12b}
mkdir -p "$OUT"
probe() {
  local sf="$1" q="$2"
  local tag
  tag="$(basename "$sf")_$q"
  if [ -s "$OUT/$tag.json" ]; then echo "skip $tag"; return; fi
  echo "== $tag $(date +%T)"
  timeout 900 env SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_N=1 SPARK_GRAFT_ONLY="$q" \
    sbt -batch "runMain graft.Bench" > "$OUT/$tag.log" 2>&1
  grep '"metric"' "$OUT/$tag.log" > "$OUT/$tag.json"
  [ -s "$OUT/$tag.json" ] || echo "DNF $tag" >> "$OUT/DNF.txt"
}
QS="q378_hrw_shard_balance q379_reshard_certificate \
q380_colocated_shards q381_weighted_shard_balance \
q382_reweight_certificate q383_selectivity_audit \
q384_join_card_audit q385_independence_audit q386_stale_stats_audit \
q387_ndv_sample_audit q388_cms_join_size q389_stats_index_serve \
q390_stats_index_merge q391_stats_index_forget q392_stats_rtbf"
for q in $QS; do probe /root/testdata/sf0.1 "$q"; done
for q in $QS; do probe tools/scale10 "$q"; done
echo done
