#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, runs the matching oracle SQL
from oracle_sql.json in DuckDB against the raw tables in <sfDir>, and
compares row count, column names, and content (rows sorted, columns
sorted by name).  Dev tool only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb

def canon(con, rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    # normalize for hashing: stringify with float repr, sort rows
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return list(df.columns), rows

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_weak = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        got_cols, got_rows = canon(con, con.sql(f"SELECT * FROM '{d}/*.parquet'"))
        if name not in oracle:
            print(f"WEAK {name}: rows={len(got_rows)} (no oracle)")
            n_weak += 1
            continue
        try:
            exp_cols, exp_rows = canon(con, con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
        elif got_rows != exp_rows:
            bad = next(i for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e)
            print(f"FAIL {name}: content differs at sorted row {bad}:")
            print(f"  got {got_rows[bad]}")
            print(f"  exp {exp_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
