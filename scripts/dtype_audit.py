#!/usr/bin/env python3
"""Schema audit companion to local_verify.py: compare the DTYPES of each
Spark result dump against its DuckDB oracle. local_verify's value
compare is string-normalized, so a type-FAMILY drift (e.g. a DuckDB
HUGEINT from an uncast SUM surfacing as float/object) passes it while
failing the driver gate — those are FATAL here. Width-only drift
(int32 vs int64: Spark size()/row_number() are INT while DuckDB
len()/ROW_NUMBER() are BIGINT) demonstrably passes the driver's
correctness gate (r4 shipped 8 such columns, all schema_match=true),
so it is reported as a warning, not a failure.
Usage: dtype_audit.py <sfDir> <outDir> [query ...]
"""
import json, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def no_unit(t):
    # the bracketed timestamp unit (ns/us) is writer-dependent, not schema
    return re.sub(r"\[[^]]*\]$", "", t)


def family(t):
    return no_unit(t).rstrip("0123456789")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; GenScale output is a
        # directory of part files under <table>.parquet/
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    bad = warned = 0
    for name, sql in sorted(oracle.items()):
        try:
            d = con.execute(sql).fetchdf()
            s = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:120]}")
            bad += 1
            continue
        dd = {c: str(t) for c, t in d.dtypes.items()}
        ss = {c: str(t) for c, t in s.dtypes.items()}
        fatal = {c: (ss.get(c), dd.get(c)) for c in set(dd) | set(ss)
                 if family(ss.get(c, "")) != family(dd.get(c, ""))}
        width = {c: (ss.get(c), dd.get(c)) for c in set(dd) & set(ss)
                 if c not in fatal and no_unit(ss[c]) != no_unit(dd[c])}
        if fatal:
            print(f"DIFF {name}: {fatal}")
            bad += 1
        elif width:
            print(f"warn {name}: {width}")
            warned += 1
    print(f"== {len(oracle) - bad} clean ({warned} width warnings), {bad} flagged ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
