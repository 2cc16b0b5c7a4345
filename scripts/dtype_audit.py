#!/usr/bin/env python3
"""Schema audit companion to local_verify.py: compare the DTYPES of each
Spark result dump against its DuckDB oracle. local_verify's value
compare is string-normalized, so a DuckDB HUGEINT (from an uncast SUM)
or INTEGER-vs-BIGINT mismatch passes it while failing the driver's
schema gate — this catches those. Usage: dtype_audit.py <sfDir> <outDir>
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def base(t):
    # timestamp units (ns/us) differ by parquet writer version, not schema
    return t.rstrip("0123456789[]nsu ")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
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
        diff = {c: (ss.get(c), dd.get(c)) for c in set(dd) | set(ss)
                if base(ss.get(c, "")) != base(dd.get(c, ""))}
        if diff:
            print(f"DIFF {name}: {diff}")
            bad += 1
    print(f"== {len(oracle) - bad} clean, {bad} flagged ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
