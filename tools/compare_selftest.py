#!/usr/bin/env python3
"""Self-test for the driver-shape gate in tools/compare.py.

The driver's harness loads both result sides into pandas and
`sort_values` over every column; a list/struct-typed output column
arrives as ndarray cells and crashes lexsort with "unhashable type"
(q201 round 8, q328 round 9) — BEFORE any comparison happens, so the
query counts as failed with all match fields null. compare.py must
reproduce that failure locally. This builds a fixture where a
list-typed column is VALUE-IDENTICAL on both sides (so the old
tuple-normalising compare would PASS it) and asserts compare.py FAILS
it as driver-unsortable, plus a scalar control that must PASS.

Usage: python3 tools/compare_selftest.py   (exit 0 = gate behaves)
"""
import io, json, os, sys, tempfile
from contextlib import redirect_stdout

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare


def main():
    tmp = tempfile.mkdtemp(prefix="cmp_selftest_")
    sf = os.path.join(tmp, "sf")
    out = os.path.join(tmp, "out")
    os.makedirs(sf)
    os.makedirs(out)
    con = duckdb.connect()
    # every table compare.py views must exist; a 1-row stand-in is fine
    for t in compare.TABLES:
        con.execute(
            f"COPY (SELECT 1 AS one) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
    # list-typed Spark-side output, value-identical to its oracle
    os.makedirs(f"{out}/t_list")
    con.execute(
        "COPY (SELECT 1::BIGINT AS k, ['a','b'] AS items"
        " UNION ALL SELECT 2, ['c']) TO"
        f" '{out}/t_list/part0.parquet' (FORMAT PARQUET)")
    # scalar control: same shape stringified — must PASS
    os.makedirs(f"{out}/t_str")
    con.execute(
        "COPY (SELECT 1::BIGINT AS k, 'a|b' AS items"
        " UNION ALL SELECT 2, 'c') TO"
        f" '{out}/t_str/part0.parquet' (FORMAT PARQUET)")
    oracle = {
        "t_list": "SELECT 1::BIGINT AS k, ['a','b'] AS items"
                  " UNION ALL SELECT 2, ['c'] ORDER BY k",
        "t_str": "SELECT 1::BIGINT AS k, 'a|b' AS items"
                 " UNION ALL SELECT 2, 'c' ORDER BY k",
    }
    json.dump(oracle, open(f"{out}/oracle_sql.json", "w"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = compare.main(sf, out)
    report = buf.getvalue()
    ok = True
    if "FAIL t_list: driver-unsortable output" not in report:
        print("SELFTEST FAIL: list-typed column did not fail as"
              " driver-unsortable")
        ok = False
    if "PASS t_str" not in report:
        print("SELFTEST FAIL: stringified control did not pass")
        ok = False
    if rc != 1:
        print(f"SELFTEST FAIL: expected exit 1 (one failing query), got {rc}")
        ok = False
    print(report)
    print("SELFTEST " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
