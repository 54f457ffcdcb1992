#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run graft.Verify, then compare
every query's parquet dump against its DuckDB oracle (dev tool only — the
engine itself has no Python dependency).

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, math, subprocess, sys

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
SFDIR = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # wrap so rows with NULLs sort (None first) and compare exactly
    if v is None:
        return (0, "")
    if isinstance(v, float) and math.isnan(v):
        return (1, "NaN")
    return (1, v)


def main():
    import duckdb, os
    # Completion-sentinel gate (round 11: the driver artifact was `{}`
    # with no trail). A dump without `_done`, with zero dumped queries,
    # or with a missing/empty oracle_sql.json is a FAILED VERIFY RUN,
    # never an empty registry — refuse to score it.
    sent_path = f"{OUT}/_done"
    if not os.path.exists(sent_path):
        print(f"ABORT: no completion sentinel at {sent_path} — "
              "graft.Verify did not finish; dump is untrustworthy")
        sys.exit(3)
    sentinel = json.load(open(sent_path))
    if sentinel.get("dumped", 0) == 0:
        print(f"ABORT: sentinel records zero dumped queries: {sentinel}")
        sys.exit(3)
    if not os.path.exists(f"{OUT}/oracle_sql.json") or \
            os.path.getsize(f"{OUT}/oracle_sql.json") < 3:
        print(f"ABORT: oracle_sql.json missing/empty in {OUT}")
        sys.exit(3)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    if not oracle:
        print(f"ABORT: oracle_sql.json parsed to an empty object in {OUT}")
        sys.exit(3)
    print(f"sentinel: dumped={sentinel['dumped']} "
          f"failed={sentinel.get('failed')} oracle_n={sentinel.get('oracle_n')}")
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
            got = con.execute(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            fail += 1
            continue
        if sorted(ecols) != sorted(gcols):
            print(f"FAIL {name}: cols oracle={sorted(ecols)} spark={sorted(gcols)}")
            fail += 1
            continue
        eidx = [ecols.index(c) for c in sorted(ecols)]
        gidx = [gcols.index(c) for c in sorted(gcols)]
        e = sorted(tuple(norm(r[i]) for i in eidx) for r in erows)
        g = sorted(tuple(norm(r[i]) for i in gidx) for r in grows)
        if len(e) != len(g):
            print(f"FAIL {name}: rows oracle={len(e)} spark={len(g)}")
            fail += 1
            continue
        # arrow-type diff: the driver's hash is type-sensitive (DuckDB
        # HUGEINT sums vs Spark BIGINT was round-1's only failure class)
        tdiff = []
        try:
            import pyarrow.parquet as pq
            import glob as _glob
            easch = con.execute(sql).arrow().schema
            gasch = pq.read_schema(
                _glob.glob(f"{OUT}/{name}/*.parquet")[0])
            for c in sorted(ecols):
                et, gt = easch.field(c).type, gasch.field(c).type
                if str(et) != str(gt):
                    # timestamp UNIT (us vs ns, tz-naive both sides) is
                    # the one diff the driver's hasher normalizes;
                    # everything else (HUGEINT vs BIGINT, tz-aware vs
                    # naive) breaks the type-sensitive hash
                    import re as _re
                    unit_only = bool(
                        _re.fullmatch(r"timestamp\[(s|ms|us|ns)\]", str(et))
                        and _re.fullmatch(r"timestamp\[(s|ms|us|ns)\]", str(gt)))
                    tdiff.append((f"{c}: oracle={et} spark={gt}", unit_only))
        except Exception as e2:
            tdiff.append((f"(type check error: {e2})", False))
        bad = [(a, b) for a, b in zip(e, g) if a != b]
        hard_tdiff = [t for t, tolerated in tdiff if not tolerated]
        if tdiff:
            print(f"TYPE {name}: " + "; ".join(t for t, _ in tdiff))
        if bad or hard_tdiff:
            why = (f"{len(bad)}/{len(e)} rows differ; first: "
                   f"oracle={bad[0][0]} spark={bad[0][1]}" if bad
                   else "hash-breaking type diff: " + "; ".join(hard_tdiff))
            print(f"FAIL {name}: {why}")
            fail += 1
        else:
            print(f"ok   {name} ({len(e)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail, {len(oracle)} total")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    if "--no-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", f"runMain graft.Verify {SFDIR} {OUT}"],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        if r.returncode != 0:
            print(tail)
            sys.exit(2)
        for line in (r.stdout + r.stderr).splitlines():
            if "[verify]" in line:
                print(line)
        if "VERIFY_DONE:" not in r.stdout:
            print("ABORT: graft.Verify exited 0 but never printed its "
                  "VERIFY_DONE marker — dump is untrustworthy")
            print(tail)
            sys.exit(3)
    main()
