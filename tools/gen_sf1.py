#!/usr/bin/env python3
"""Deterministic sf1 fixture builder (driver-side tool, like the other
tools/ scripts): scales the driver's read-only sf0.1 fixtures 10x by
REPLICATION UNDER THE GENERATOR'S OWN KEY LAWS, so every per-sf
structural property the queries depend on is preserved:

 - key offsets follow the driver's linear scaling (orders +150000/rep,
   parts +20000, customers +15000, suppliers +1000, docs +5000,
   vecs +2000, events +100000, users +1500);
 - c_name/s_name are REGENERATED from the new key with the fixtures'
   own printf law (Customer#%09d), so q157's name-prefix blocking keeps
   its block-size distribution instead of collapsing into 10x-duplicate
   name blocks;
 - every mod-split the suite uses stays aligned (150000 % 4 == 0 for
   the basketEdges 1/4-orders slice; 5000 % 2 == 0 for q103's
   corpus/batch parity split);
 - documents TEXT is caesar-rotated per replica (a-z rotation by the
   replica index; the 31-word fixture vocab is rotation-disjoint for
   i=1..9 — asserted below), so token/shingle/substring structure is
   EXACTLY preserved within a replica while replicas share zero
   vocabulary: dedup/similarity workloads scale as 10 independent
   sub-problems (linear), not as a 100x cross-replica pair blowup of
   identical copies. Rotation preserves token lengths, so n_chars and
   all length-derived stats carry over unchanged.

Caveat (documented, not hidden): embeddings replicate with offset
vec_ids but IDENTICAL vectors — fine for the sf1 study (no weak-set
query reads embeddings); an embedding-similarity study at sf1 would
need perturbed replicas.

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10  # overridable via argv[2]: 20 builds an sf2-equivalent
           # (rotation-disjointness is asserted for every replica index,
           # so the caesar guarantee extends to i=1..19 unchanged)
OFF = {  # per-replica key offsets = the driver's per-0.1-sf key ranges
    "orderkey": 150_000, "custkey": 15_000, "partkey": 20_000,
    "suppkey": 1_000, "doc_id": 5_000, "vec_id": 2_000,
    "event_id": 100_000, "user_id": 1_500,
}


def rot(s, i):
    return "".join(chr((ord(c) - 97 + i) % 26 + 97)
                   if "a" <= c <= "z" else c for c in s)


def main(out):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # safety: the caesar transform must keep replica vocabularies
    # disjoint, or cross-replica near-dup pairs would appear
    toks = sorted(t[0] for t in con.execute(
        f"select distinct unnest(string_split(text,' ')) "
        f"from read_parquet('{SRC}/documents.parquet')").fetchall())
    tokset = set(toks)
    for i in range(1, REPS):
        clash = [t for t in toks if rot(t, i) in tokset]
        assert not clash, f"vocab not rotation-disjoint at {i}: {clash}"

    def build(table, select_tpl):
        parts = " UNION ALL ".join(
            select_tpl.format(i=i) for i in range(REPS))
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"select count(*) from read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n}")

    L = f"read_parquet('{SRC}/lineitem.parquet')"
    build("lineitem", f"""
      SELECT l_orderkey + {{i}} * {OFF['orderkey']} AS l_orderkey,
             l_partkey + {{i}} * {OFF['partkey']} AS l_partkey,
             l_suppkey + {{i}} * {OFF['suppkey']} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate FROM {L}""")
    build("orders", f"""
      SELECT o_orderkey + {{i}} * {OFF['orderkey']} AS o_orderkey,
             o_custkey + {{i}} * {OFF['custkey']} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet')""")
    build("customer", f"""
      SELECT c_custkey + {{i}} * {OFF['custkey']} AS c_custkey,
             printf('Customer#%09d', c_custkey + {{i}} * {OFF['custkey']})
               AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM read_parquet('{SRC}/customer.parquet')""")
    build("supplier", f"""
      SELECT s_suppkey + {{i}} * {OFF['suppkey']} AS s_suppkey,
             printf('Supplier#%09d', s_suppkey + {{i}} * {OFF['suppkey']})
               AS s_name,
             s_nationkey, s_acctbal
      FROM read_parquet('{SRC}/supplier.parquet')""")
    build("part", f"""
      SELECT p_partkey + {{i}} * {OFF['partkey']} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM read_parquet('{SRC}/part.parquet')""")
    build("events", f"""
      SELECT event_id + {{i}} * {OFF['event_id']} AS event_id, ts,
             user_id + {{i}} * {OFF['user_id']} AS user_id,
             event_type, value, props
      FROM read_parquet('{SRC}/events.parquet')""")
    build("embeddings", f"""
      SELECT vec_id + {{i}} * {OFF['vec_id']} AS vec_id, embedding, label
      FROM read_parquet('{SRC}/embeddings.parquet')""")

    # documents: python-side text rotation (duckdb has no caesar)
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = con.execute(
        f"select doc_id, text, lang, source from "
        f"read_parquet('{SRC}/documents.parquet') order by doc_id"
    ).fetchall()
    rows = []
    for i in range(REPS):
        for (doc_id, text, lang, source) in src:
            t = text if i == 0 else rot(text, i)
            rows.append((doc_id + i * OFF["doc_id"], t, lang, source,
                         len(t)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {tbl.num_rows}")

    for t in ("region", "nation"):  # fixed dimensions: copy
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")


if __name__ == "__main__":
    if len(sys.argv) > 2:
        REPS = int(sys.argv[2])
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
