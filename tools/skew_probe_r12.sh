#!/bin/bash
# Round-12 skew campaign: one 900 s-capped n=1 bench probe per (fixture,
# query), sequential (probes must not compete for the 32 cores).
# Usage: tools/skew_probe_r12.sh <outdir>
# Reads fixture dirs tools/skew10 / tools/skew100 (gen_skew.py).
set -u
OUT=${1:-/tmp/skew_r12}
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
# the two swapped production consumers: cliff-gone check at 10x,
# then the 100x decade for every star arm + the new instruments
for q in q116_keep_best q145_cc_incremental; do
  probe tools/skew10 "$q"
done
for q in q370_lsh_skew_star q371_dedup_components_star \
    q297_cluster_profile q373_fuzzy_over_survivors \
    q116_keep_best q145_cc_incremental \
    q374_split_leakage_volume q375_source_dup_volume \
    q376_split_leakage_components q377_star_threshold_advisor; do
  probe tools/skew100 "$q"
done
# stored tier at 100x skew: the skew100 corpusTag has no index yet, so
# the first run builds the archive index then gates; the second hits
# buildIfAbsent's fast path = pure probe cost. (Never rm /tmp/graft_*
# selectively — q350's cross-dir fingerprint guard spans six dirs.)
probe tools/skew100 q112_dedup_index_gate
mv "$OUT/skew100_q112_dedup_index_gate.json" \
   "$OUT/skew100_q112_build_plus_gate.json"
mv "$OUT/skew100_q112_dedup_index_gate.log" \
   "$OUT/skew100_q112_build_plus_gate.log"
probe tools/skew100 q112_dedup_index_gate
echo "campaign done $(date +%T)"
