#!/usr/bin/env python3
"""Round-close checklist gate (VERDICT r5 "what's wrong" #2/#3: a round
shipped with 7 failed bench keys recorded in its own artifact and stale
README counts).

Usage: python3 tools/roundclose.py [<verify_out_dir> <sf_dir>]

Checks, in order:
  1. bench_per_query.json has NO failed (-1.0 / negative) keys.
  2. Every SparkEntry.queries key has an oracle entry (oracle_sql.json in
     the verify dir covers every result dir) — when a verify dir is given.
  3. selfcheck passes 100% — when verify+sf dirs are given.
  4. README declared/oracled counts match the artifact counts.

Exit 1 on any failure so it can gate a close script.
"""
import json, os, re, subprocess, sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
fails = []

# 1. bench failures
bench_path = os.path.join(repo, "bench_per_query.json")
n_keys = None
if os.path.exists(bench_path):
    bench = json.load(open(bench_path))
    qs = bench.get("queries", {})
    n_keys = len(qs)
    bad = sorted(k for k, v in qs.items() if isinstance(v, (int, float)) and v < 0)
    if bad:
        fails.append(f"bench_per_query.json has {len(bad)} FAILED keys: {bad}")
    else:
        print(f"OK bench_per_query.json: {n_keys} keys, 0 failed")
else:
    fails.append("bench_per_query.json missing")

# 2+3. verify-dir based checks
if len(sys.argv) >= 3:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        fails.append(f"{oracle_path} missing — run graft.Verify first")
    else:
        oracle = json.load(open(oracle_path))
        result_dirs = sorted(d for d in os.listdir(out_dir)
                             if os.path.isdir(os.path.join(out_dir, d)))
        no_oracle = sorted(set(result_dirs) - set(oracle))
        if no_oracle:
            fails.append(f"{len(no_oracle)} keys lack oracle SQL: {no_oracle}")
        else:
            print(f"OK oracle coverage: {len(result_dirs)} result dirs, all oracled")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "selfcheck.py"),
             sf_dir, out_dir], capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        if r.returncode != 0:
            failing = [l for l in r.stdout.splitlines() if l.startswith("FAIL")]
            fails.append(f"selfcheck: {tail}; first: {failing[:3]}")
        else:
            print(f"OK selfcheck: {tail}")

# 4. README counts
readme = open(os.path.join(repo, "README.md")).read()
m = re.search(r"(\d+) declared operator queries,\s*\n?\s*(\d+) hash-checked", readme)
if m and n_keys is not None:
    declared, checked = int(m.group(1)), int(m.group(2))
    if declared != n_keys:
        fails.append(f"README declares {declared} keys; bench artifact has {n_keys}")
    else:
        print(f"OK README counts: {declared} declared")
else:
    print("NOTE: README count pattern not found or no bench artifact; skipping check 4")

if fails:
    print("\nROUND-CLOSE GATE FAILED:")
    for f in fails:
        print(f"  - {f}")
    sys.exit(1)
print("\nround-close gate: all green")
