#!/usr/bin/env python3
"""Seeded-sample oracle verification for queries whose FULL DuckDB
oracle is super-linear at sf10 (the scale_verify TIMEOUT list). The
engine-side dump is complete — what times out is the oracle's own
O(n^2)-ish recompute — so this gate compares a DETERMINISTIC SLICE of
the dumped result against the same slice of the oracle:

    engine side:  SELECT * FROM dump WHERE <pred>
    oracle side:  SELECT * FROM (<registered oracle SQL>) g WHERE <pred>

The predicate is on OUTPUT columns, so the sliced comparison is by
construction a sub-multiset equality check of the full comparison —
no decomposability argument is needed for CORRECTNESS, only for COST:
each slice predicate filters on a column the oracle partitions or
joins by (user_id for per-user windows/joins, query_id for per-query
rankings, a doc_id window for the pairwise join), which DuckDB pushes
through the window/join so the oracle computes ~the slice instead of
the full quadratic. Value semantics (pandas materialization,
column-sorted) match scripts/local_verify.py == the driver's gate.

Usage: sample_verify.py <sfDir> <outDir> [name ...]
"""
import atexit, datetime, json, math, os, shutil, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# query -> (slice predicate over OUTPUT columns, rationale)
SLICES = {
    "events_sessions": (
        "user_id % 97 = 0",
        "per-user sessionization; pushes through PARTITION BY user_id"),
    "events_session_native": (
        "user_id % 97 = 0",
        "same window shape as events_sessions"),
    "events_range_join": (
        "user_id % 97 = 0",
        "per-user interval join; pushes into both join sides"),
    "dedup_simhash_pairs": (
        "doc_a BETWEEN 0 AND 4999 AND doc_b BETWEEN 0 AND 4999",
        "pairwise hamming is per-pair; a contiguous id window keeps "
        "replica-local near-dup density so the slice is non-vacuous"),
    "knn_label": (
        "query_id % 2500 = 0",
        "per-query ranking; pushes into the query-vector CTE"),
    "sql_knn_label": (
        "query_id % 2500 = 0",
        "same oracle as knn_label"),
    "knn_label_ivf": (
        "query_id % 2500 = 0",
        "per-query ranking over probed cells"),
    "pq_encode": (
        "vec_id % 97 = 0",
        "per-vector code assignment; the slice pushes through the "
        "GROUP BY vec_id assignment aggregates into the subspace "
        "scans, and since r14 the training replay runs on the pinned "
        "25.6k-vector sample, so the sliced oracle is "
        "sample-training + a 1/97 assignment"),
    "pq_build": (
        "vec_id % 97 = 0",
        "same oracle SQL as pq_encode (the build registration emits "
        "the encode rows)"),
}


def norm(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_key(rel):
    df = rel.df()
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or set(SLICES)
    unknown = only - set(SLICES)
    if unknown:
        print(f"no slice registered for: {sorted(unknown)}")
        sys.exit(2)
    con = duckdb.connect()
    # same resource caps as local_verify.py: DuckDB defaults to every
    # core and 80% of RAM per process — an uncapped slice running next
    # to a 64g bench JVM got the JVM OOM-killed.
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads TO {int(threads)}")
    mem = os.environ.get("DUCKDB_MEMORY")
    if mem:
        con.sql(f"SET memory_limit = '{mem}'")
        spill = f"/tmp/duckdb_spill_{os.getpid()}"
        con.sql(f"SET temp_directory = '{spill}'")
        atexit.register(shutil.rmtree, spill, ignore_errors=True)
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(only):
        pred, why = SLICES[name]
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' WHERE {pred}")
            ora_df = con.sql(f"SELECT * FROM ({oracle[name]}\n) g WHERE {pred}")
            sc, sr = rows_key(spark_df)
            oc, orows = rows_key(ora_df)
            schema_ok = sc == oc
            ok = schema_ok and sorted(sr) == sorted(orows)
            if ok and not sr:
                n_fail += 1
                print(f"VACUOUS {name}: slice [{pred}] selected 0 rows")
            elif ok:
                n_pass += 1
                print(f"PASS {name} ({len(sr)} rows in slice [{pred}])")
            else:
                n_fail += 1
                print(f"FAIL {name}: schema_match={schema_ok} "
                      f"spark_cols={sc} oracle_cols={oc} "
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
