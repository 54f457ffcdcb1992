#!/usr/bin/env python3
"""Compare two full-registry bench archive files (A -> B).

Usage: bench_cmp.py A.json B.json [threshold_pct]
Prints totals, base50, counts of regressed/improved beyond the
threshold (default 10%), and the biggest absolute movers each way.
"""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    return d

def base50(q):
    def qid(name):
        try:
            return int(name.split("_")[0][1:])
        except ValueError:
            return 1 << 30
    return sum(v for k, v in q.items() if qid(k) <= 50)

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.10
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    d = {k: qb[k] - qa[k] for k in common}
    reg = [k for k in common if qb[k] > qa[k] * (1 + thr) and abs(d[k]) > 0.05]
    imp = [k for k in common if qb[k] < qa[k] * (1 - thr) and abs(d[k]) > 0.05]
    print(f"A total={a['value']:.2f} base50={base50(qa):.2f}  "
          f"B total={b['value']:.2f} base50={base50(qb):.2f}")
    print(f"common={len(common)} regressed>thr={len(reg)} "
          f"(sum {sum(d[k] for k in reg):+.1f}s)  improved>thr={len(imp)} "
          f"(sum {sum(d[k] for k in imp):+.1f}s)")
    movers = sorted(common, key=lambda k: d[k])
    print("-- top improvements (B-A sec) --")
    for k in movers[:15]:
        print(f"  {k:35s} {qa[k]:7.2f} -> {qb[k]:7.2f}  {d[k]:+.2f}")
    print("-- top regressions (B-A sec) --")
    for k in movers[-15:]:
        print(f"  {k:35s} {qa[k]:7.2f} -> {qb[k]:7.2f}  {d[k]:+.2f}")

if __name__ == "__main__":
    main()
