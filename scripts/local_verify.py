#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
parquet dumps against the DuckDB oracle SQL, column-sorted like the
driver does. Values are materialized through PANDAS (`.df()`), exactly
like the driver — NOT fetchall() Python natives. The difference is the
whole point: an un-cast DuckDB HUGEINT (e.g. `SUM(CASE ...)`) comes
back as a Python int via fetchall (== Spark's int64, silent pass) but
as float64 via pandas ("5.0" != "5", driver FAIL) — exactly how the r9
span_dup_rate oracle shipped red despite passing this gate.
The gate also REJECTS non-scalar (list/ndarray) result cells outright:
the driver sorts rows via pandas `sort_values`, which cannot factorize
array cells (TypeError: unhashable type) — r14's `bpe_token_ids` passed
this gate's Python-native sorted()-tuples compare and then died red at
the driver. Registered outputs must be pandas-sortable SCALARS; join
arrays to strings on both sides (array_join / array_to_string).
Usage: local_verify.py <sfDir> <outDir> [query ...]"""
import atexit, datetime, json, os, shutil, sys, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # the driver's pandas compare sees date and midnight-timestamp as
    # equal (r3 hash-matched revenue_by_month with exactly this shape)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):  # covers numpy float64 (a float subclass)
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def rows_key(rel):
    # pandas materialization = the driver's dtype semantics: HUGEINT ->
    # float64, BIGINT -> int64, TIMESTAMP -> datetime64. itertuples
    # yields numpy scalars whose repr/str matches what the driver hashes.
    df = rel.df()
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
            if bad:
                raise TypeError(
                    f"column '{c}' holds array cells — the driver's pandas "
                    f"sort_values cannot factorize these (r14 bpe_token_ids); "
                    f"emit a joined string instead")
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # DuckDB defaults to ALL cores per process; a parallel sweep
    # (scale_verify --jobs N) would otherwise run N full-width engines
    # and starve anything else on the box (observed: a concurrent
    # local[32] Verify dump lost its executor heartbeats and died).
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
    # An explicit memory_limit (e.g. "24GB") also enables DuckDB's
    # larger-than-memory spill path via a temp directory — without it,
    # a heavy oracle on a busy box dies with a hard allocation failure
    # instead of spilling.
    mem = os.environ.get("DUCKDB_MEMORY")
    if mem:
        con.sql(f"SET memory_limit = '{mem}'")
        spill = f"/tmp/duckdb_spill_{os.getpid()}"
        con.sql(f"SET temp_directory = '{spill}'")
        # pid-suffixed dirs accumulate across sweeps without this
        atexit.register(shutil.rmtree, spill, ignore_errors=True)
    for t in TABLES:
        # driver fixtures are single files; GenScale output is a
        # directory of part files under <table>.parquet/
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ora_df = con.sql(sql)
            sc, sr = rows_key(spark_df)
            oc, orows = rows_key(ora_df)
            schema_ok = sc == oc
            # driver compares without a total order guarantee? queries are
            # ordered; compare as multisets to be safe, and ordered too
            ok = schema_ok and sorted(sr) == sorted(orows)
            if ok:
                n_pass += 1
                print(f"PASS {name} ({len(sr)} rows)")
            else:
                n_fail += 1
                print(f"FAIL {name}: schema_match={schema_ok} spark_cols={sc} oracle_cols={oc} "
                      f"spark_rows={len(sr)} oracle_rows={len(orows)}")
                for a, b in list(zip(sorted(sr), sorted(orows)))[:40]:
                    if a != b:
                        print(f"  spark={a}\n  oracle={b}")
                        break
        except Exception as e:
            n_fail += 1
            print(f"ERR  {name}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
