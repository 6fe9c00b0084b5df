#!/usr/bin/env python3
"""Dev-only pre-flight mirror of the driver's DuckDB correctness check.

Not part of the shipped library (the Scala engine has no Python deps);
this just lets the builder catch Spark-vs-DuckDB mismatches before the
round gate runs. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output");  n_bad += 1;  continue
        try:
            got = pq.read_table(spark_path).to_pandas()
        except Exception as e:
            print(f"[ERR ] {name}: read spark: {e}");  n_bad += 1;  continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}");  n_bad += 1;  continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"[BAD ] {name}: columns {gc} vs {ec}");  n_bad += 1;  continue
        g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ec].itertuples(index=False)]
        if sorted(map(repr, g)) != sorted(map(repr, e)):
            print(f"[BAD ] {name}: {len(g)} vs {len(e)} rows; first diff:")
            sg, se = sorted(map(repr, g)), sorted(map(repr, e))
            for a, b in zip(sg, se):
                if a != b:
                    print(f"        spark : {a}\n        duckdb: {b}");  break
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(g)} rows");  n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
