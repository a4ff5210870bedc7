#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, creates DuckDB views over the parquet tables in
sfDir, runs each oracle, reads the Spark result parquet, sorts columns
by name (the driver does this before hashing), and compares cell values
exactly (floats: exact equality first, else reports max abs diff).
"""
import decimal, json, sys, math, struct
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Sign-of-zero / bit-strict float compare: the driver hashes the raw
    # IEEE bits, so -0.0 != +0.0 there. Python's == treats them equal,
    # which let q201 pass locally while failing the driver (round 8).
    # DECIMAL columns coerce to float64 first (the driver's pandas-style
    # load does the same — a DECIMAL oracle column vs a DOUBLE Spark
    # column of equal value passed the round-8 driver gate).
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle: {ecols}\n  spark:  {gcols}")
            n_fail += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows oracle={exp.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        # Replicate the driver's pandas path EXACTLY: to_pandas, select
        # sorted columns, sort_values over every column. An output
        # column pandas cannot sort (list/struct -> ndarray cells raise
        # "unhashable type" inside lexsort) must FAIL here, the way it
        # fails the driver gate (q201 round 8, q328 round 9).
        # Run purely for the exception side effect (the driver-shape
        # gate): the actual value comparison below stays on the Arrow
        # row path, which normalizes floats the way the gate expects.
        try:
            exp.to_pandas()[ecols].sort_values(by=ecols)
            got.to_pandas()[gcols].sort_values(by=gcols)
        except Exception as e:
            print(f"FAIL {name}: driver-unsortable output (pandas sort_values): {e!r}")
            n_fail += 1
            continue
        erows = [[norm(exp.column(c)[i].as_py()) for c in ecols]
                 for i in range(exp.num_rows)]
        grows = [[norm(got.column(c)[i].as_py()) for c in gcols]
                 for i in range(got.num_rows)]
        if erows == grows:
            print(f"PASS {name} ({exp.num_rows} rows)")
            n_pass += 1
        else:
            bad = 0
            maxd = 0.0
            first = None
            for i, (er, gr) in enumerate(zip(erows, grows)):
                if er != gr:
                    bad += 1
                    if first is None:
                        first = (i, er, gr)
                    for a, b in zip(er, gr):
                        if isinstance(a, bytes) and isinstance(b, bytes):
                            fa = struct.unpack(">d", a)[0]
                            fb = struct.unpack(">d", b)[0]
                            maxd = max(maxd, abs(fa - fb))
            print(f"FAIL {name}: {bad}/{exp.num_rows} rows differ, maxfloatdiff={maxd:.3g}")
            i, er, gr = first
            print(f"  row {i} cols {ecols}\n   oracle: {er}\n   spark:  {gr}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
