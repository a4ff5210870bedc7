#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB (single-threaded) over the given
parquet dir — the head-to-head baseline the engine's Bench compares
against. Usage: python3 tools/time_oracles.py <sfDir> <verifyOutDir>
(verifyOutDir only needs oracle_sql.json). Prints one JSON line."""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = None
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v is not None)
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(total, 1),
                      "unit": "sec", "n": len(times), "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
