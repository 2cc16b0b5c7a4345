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
interrupt) executing local_verify.py for that single query. --jobs N
runs N such subprocesses concurrently (each is its own DuckDB; results
print in submission order so the log stays diffable).

--serial n1,n2,... runs the named queries as a SEQUENTIAL TAIL after
the parallel fleet, each solo with its own (bigger) DuckDB budget
(--serial-mem/--serial-threads, defaulting to 80GB/8). This exists for
the PQ-family replay oracles at sf>=1: their list/lambda heap evades
DuckDB's memory_limit (pq_encode peaked 82 GB RSS under a 20 GB cap,
family twins 25-45 GB — r14/r15 sweeps), so they cannot share the box
with the fleet; before r16 the sweeps SIGTERM'd them mid-fleet and
re-ran them by hand (the "solo-rerun dance" r15 verdict item 5). One
invocation now produces the whole record with zero deliberate kills.

Exit codes: 0 all pass (timeouts allowed alongside passes), 1 any fail,
3 nothing passed and at least one timed out (a fully-timed-out sweep
must not look like success to an exit-status-only caller).

Usage: scale_verify.py <sfDir> <outDir> [--timeout SECS] [--jobs N]
       [--serial n1,n2,...] [--serial-mem MEM] [--serial-threads T]
       [query ...]
"""
import json, os, subprocess, sys
from concurrent.futures import ThreadPoolExecutor


def opt(args, flag, default, conv):
    if flag not in args:
        return default
    i = args.index(flag)
    if i + 1 >= len(args):
        sys.exit(f"error: {flag} requires a value")
    try:
        v = conv(args[i + 1])
    except ValueError:
        sys.exit(f"error: {flag} expects a number, got '{args[i + 1]}'")
    del args[i:i + 2]
    return v


def main():
    args = list(sys.argv[1:])
    timeout = opt(args, "--timeout", 600.0, float)
    jobs = opt(args, "--jobs", 1, int)
    serial = opt(args, "--serial", "", str)
    serial_mem = opt(args, "--serial-mem", "80GB", str)
    serial_threads = opt(args, "--serial-threads", 8, int)
    if len(args) < 2:
        sys.exit(__doc__)
    sf_dir, out_dir = args[0], args[1]
    only = args[2:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = only if only else sorted(oracle)
    serial_names = [n for n in serial.split(",") if n]
    unknown = set(serial_names) - set(oracle)
    if unknown:
        sys.exit(f"error: --serial names not in oracle_sql.json: {sorted(unknown)}")
    fleet_names = [n for n in names if n not in set(serial_names)]
    tail_names = [n for n in serial_names if n in set(names)]
    here = os.path.dirname(os.path.abspath(__file__))

    def run_one(name, env_extra=None):
        cmd = [sys.executable, os.path.join(here, "local_verify.py"),
               sf_dir, out_dir, name]
        env = None
        if env_extra:
            env = dict(os.environ); env.update(env_extra)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout, env=env)
        except subprocess.TimeoutExpired:
            return "TIMEOUT", f"TIMEOUT {name} (oracle exceeded {timeout:.0f}s)"
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith(("PASS", "FAIL", "ERR"))), None)
        if line is None:
            # local_verify crashed before printing (import error, missing
            # parquet, OOM): name the query and record WHY, not a bare
            # 'ERR (no output)' (the silent-failure mode r11 fixed in
            # Bench.timeOnce)
            tail = "; ".join(r.stderr.strip().splitlines()[-3:]) or "empty stderr"
            return "ERR", f"ERR  {name} (no output, exit {r.returncode}): {tail}"
        if not line.startswith("PASS"):
            tail = "; ".join(r.stderr.strip().splitlines()[-2:])
            if tail:
                line += f"  [stderr: {tail}]"
        return line.split()[0], line

    n_pass = n_fail = n_timeout = 0

    def tally(verdict, line):
        nonlocal n_pass, n_fail, n_timeout
        print(line, flush=True)
        if verdict == "PASS":
            n_pass += 1
        elif verdict == "TIMEOUT":
            n_timeout += 1
        else:
            n_fail += 1

    with ThreadPoolExecutor(max_workers=max(1, jobs)) as ex:
        for verdict, line in ex.map(run_one, fleet_names):
            tally(verdict, line)
    if tail_names:
        print(f"== serial tail ({len(tail_names)} queries, "
              f"{serial_mem}/{serial_threads}t, jobs 1) ==", flush=True)
        tail_env = {"DUCKDB_MEMORY": serial_mem,
                    "DUCKDB_THREADS": str(serial_threads)}
        for name in tail_names:
            verdict, line = run_one(name, tail_env)
            tally(verdict, line)
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout ==")
    if n_fail:
        sys.exit(1)
    if n_timeout and not n_pass:
        sys.exit(3)


main()
