#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: tools/check_oracle.py <sfDir> <verifyOutDir> [key ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with
views named after the parquet tables in <sfDir>, loads the Spark
result parquet from <verifyOutDir>/<key>/, sorts columns by name, and
compares row-by-row (exact for ints/strings/timestamps, bitwise for
floats). Mirrors CORRECTNESS_r{N}.json so mismatches are caught before
the driver runs.
"""
import sys, json, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    # Decimal → float would lose exactness; keep str for compare
    import decimal, datetime
    if isinstance(v, decimal.Decimal): return ("dec", str(v))
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None)
    if isinstance(v, list): return tuple(norm(x) for x in v)
    if isinstance(v, tuple): return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    keys = sorted(oracle) if not only else [k for k in sorted(oracle) if k in only]
    for key in keys:
        spark_dir = f"{out_dir}/{key}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING-SPARK {key}"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            g_cols = got.columns
            g_rows = got.fetchall()
            want = con.sql(oracle[key])
            w_cols = want.columns
            w_rows = want.fetchall()
        except Exception as e:
            print(f"ERROR {key}: {str(e).splitlines()[0]}"); n_bad += 1; continue
        if sorted(g_cols) != sorted(w_cols):
            print(f"SCHEMA-MISMATCH {key}: spark={sorted(g_cols)} oracle={sorted(w_cols)}")
            n_bad += 1; continue
        gi = [g_cols.index(c) for c in sorted(g_cols)]
        wi = [w_cols.index(c) for c in sorted(w_cols)]
        g = [tuple(norm(r[i]) for i in gi) for r in g_rows]
        w = [tuple(norm(r[i]) for i in wi) for r in w_rows]
        if len(g) != len(w):
            print(f"ROWCOUNT-MISMATCH {key}: spark={len(g)} oracle={len(w)}")
            n_bad += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"VALUE-MISMATCH {key}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
            n_bad += 1
        else:
            print(f"OK {key} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
