#!/usr/bin/env python3
"""Large-fixture oracle sweep: local_verify semantics with a PER-QUERY
wall-clock budget, so oracles that are intrinsically super-linear in
DuckDB (brute-force kNN is O(|Q|*n*dim) with no index; fixed-k=8 IVF
replays put n/8 vectors in every probed cell) time out with a recorded
TIMEOUT verdict instead of stalling the sweep. A TIMEOUT is a statement
about the ORACLE's cost, not the engine's correctness — the engine-side
dump already completed; the query stays verified at the scales where
the oracle is tractable (sf0.01 per-round, sf1 full sweep, r10/r11).

Each query runs in a fresh subprocess (DuckDB has no reliable in-process
interrupt) executing local_verify.py for that single query.

Usage: scale_verify.py <sfDir> <outDir> [--timeout SECS] [query ...]
"""
import json, os, subprocess, sys

def main():
    args = [a for a in sys.argv[1:]]
    timeout = 600.0
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = args[2:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = only if only else sorted(oracle)
    here = os.path.dirname(os.path.abspath(__file__))
    n_pass = n_fail = n_timeout = 0
    for name in names:
        cmd = [sys.executable, os.path.join(here, "local_verify.py"),
               sf_dir, out_dir, name]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith(("PASS", "FAIL", "ERR"))), "ERR (no output)")
            print(line, flush=True)
            if line.startswith("PASS"):
                n_pass += 1
            else:
                n_fail += 1
        except subprocess.TimeoutExpired:
            n_timeout += 1
            print(f"TIMEOUT {name} (oracle exceeded {timeout:.0f}s)", flush=True)
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout ==")
    sys.exit(1 if n_fail else 0)

main()
