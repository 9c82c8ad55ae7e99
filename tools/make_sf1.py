#!/usr/bin/env python3
"""Deterministic sf1 generator: a 10x key-shifted upsample of the driver's
sf0.1 testdata, used only by the opt-in sf1 spot-oracle probe (VERDICT r12
Next #8). Both Spark (Verify) and DuckDB (tools/check.py) read the SAME
generated parquet, so the engine comparison is valid regardless of how the
data was produced.

Replication scheme: each of the 10 replicas i shifts every key column of a
fact/entity table by i*STRIDE (stride > max key), and shifts the foreign
keys that reference a replicated table by the SAME stride, so referential
integrity and per-entity join fan-out are preserved exactly (10x entities,
same per-entity density -- the shape a real 10x scale-up has). The TPC-H
fixed dimensions region/nation are copied as-is (constant across SF, as in
the TPC-H spec). Non-key columns (names, texts, timestamps, embeddings) are
left unchanged; duplicated texts/embeddings across replicas are fine -- both
engines see the same rows, and it stresses the dedup capstones at 10x.

Usage: python3 tools/make_sf1.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata_sf1
"""
import os
import sys

import duckdb

REPLICAS = 10

# table -> {column: stride}; strides chosen > max key at sf0.1 with headroom.
# VEC stride must clear the q_semantic_* fixtures' planted-twin id space
# (vec_id + 100000): a 100k stride would collide replica-1 vec_ids with the
# planted copies, giving two distinct vectors the same id.
CUST, SUPP, PART, ORD, EVT, USR, DOC, VEC = (
    1_000_000, 100_000, 1_000_000, 10_000_000, 10_000_000, 100_000,
    1_000_000, 1_000_000)
SHIFTS = {
    "customer":   {"c_custkey": CUST},
    "supplier":   {"s_suppkey": SUPP},
    "part":       {"p_partkey": PART},
    "orders":     {"o_orderkey": ORD, "o_custkey": CUST},
    "lineitem":   {"l_orderkey": ORD, "l_partkey": PART, "l_suppkey": SUPP},
    "events":     {"event_id": EVT, "user_id": USR},
    "documents":  {"doc_id": DOC},
    "embeddings": {"vec_id": VEC},
}
COPY_AS_IS = ["region", "nation"]


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'")
        print(f"{t}: copied as-is")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        proj = ", ".join(
            f"CAST(t.{c} + r.i * {shifts[c]} AS BIGINT) AS {c}"
            if c in shifts else f"t.{c}" for c in cols)
        con.execute(
            f"COPY (SELECT {proj} FROM '{src}/{t}.parquet' t, "
            f"(SELECT UNNEST(range({REPLICAS})) AS i) r) "
            f"TO '{dst}/{t}.parquet'")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({REPLICAS}x)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    main(src, dst)
