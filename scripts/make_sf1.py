#!/usr/bin/env python
"""Build a deterministic sf1 dataset (10x sf0.1) for at-scale gating.

No external data and no RNG: each table is replicated REP times with
DENSE key offsets (offset = max(key)+1 per key family, applied
consistently on both sides of every foreign-key edge, so referential
integrity and id-derived laws — geo grids, media laws, query-id strides
— keep working), plus deterministic value perturbations (replica index
added as whole dollars / days / minutes) so replicas aren't bitwise
clones.  Text/embedding payloads stay identical across replicas on
purpose: dedup at sf1 then exercises real 10-deep duplicate groups.

DuckDB does the replication in one pass per table; Spark reads the
resulting parquet with the SAME schema as the source sf dir (asserted
by scripts/sf1_gate.py before gating).
"""

from __future__ import annotations

import argparse
import os

import duckdb

REP = 10

SRC_DEFAULT = "/root/testdata/sf0.1"
DST_DEFAULT = "/tmp/emsort-sf1"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def key_offsets(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    def mx(table: str, col: str) -> int:
        return int(
            con.execute(
                f"SELECT COALESCE(MAX({col}), 0) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )

    return {
        # each offset covers BOTH sides of the FK edge
        "cust": max(mx("customer", "c_custkey"), mx("orders", "o_custkey")) + 1,
        "ord": max(mx("orders", "o_orderkey"), mx("lineitem", "l_orderkey")) + 1,
        "part": max(mx("part", "p_partkey"), mx("lineitem", "l_partkey")) + 1,
        "supp": max(mx("supplier", "s_suppkey"), mx("lineitem", "l_suppkey")) + 1,
        "event": mx("events", "event_id") + 1,
        "user": mx("events", "user_id") + 1,
        "doc": mx("documents", "doc_id") + 1,
        "vec": mx("embeddings", "vec_id") + 1,
    }


def table_sql(table: str, src: str, off: dict[str, int]) -> str:
    p = f"read_parquet('{src}/{table}.parquet')"
    reps = f"(SELECT range AS r FROM range({REP})) reps"
    if table in ("region", "nation"):
        # fixed dimension tables: never replicated
        return f"SELECT * FROM {p}"
    bodies = {
        "customer": f"""
SELECT c_custkey + r * {off['cust']} AS c_custkey, c_name, c_nationkey,
       c_acctbal, c_mktsegment
FROM {p} CROSS JOIN {reps}""",
        "supplier": f"""
SELECT s_suppkey + r * {off['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal
FROM {p} CROSS JOIN {reps}""",
        "part": f"""
SELECT p_partkey + r * {off['part']} AS p_partkey, p_name, p_brand, p_type,
       p_size, p_retailprice
FROM {p} CROSS JOIN {reps}""",
        "orders": f"""
SELECT o_orderkey + r * {off['ord']} AS o_orderkey,
       o_custkey + r * {off['cust']} AS o_custkey,
       o_orderstatus,
       o_totalprice + r AS o_totalprice,
       o_orderdate + INTERVAL (r) DAY AS o_orderdate,
       o_orderpriority
FROM {p} CROSS JOIN {reps}""",
        "lineitem": f"""
SELECT l_orderkey + r * {off['ord']} AS l_orderkey,
       l_partkey + r * {off['part']} AS l_partkey,
       l_suppkey + r * {off['supp']} AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus,
       l_shipdate + INTERVAL (r) DAY AS l_shipdate
FROM {p} CROSS JOIN {reps}""",
        "events": f"""
SELECT event_id + r * {off['event']} AS event_id,
       ts + INTERVAL (r) MINUTE AS ts,
       user_id + r * {off['user']} AS user_id,
       event_type, value, props
FROM {p} CROSS JOIN {reps}""",
        "documents": f"""
SELECT doc_id + r * {off['doc']} AS doc_id, text, lang, source, n_chars
FROM {p} CROSS JOIN {reps}""",
        "embeddings": f"""
SELECT vec_id + r * {off['vec']} AS vec_id, embedding, label
FROM {p} CROSS JOIN {reps}""",
    }
    return bodies[table]


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    off = key_offsets(con, src)
    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        if os.path.exists(out):
            continue
        con.execute(
            f"COPY ({table_sql(t, src, off)}) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--dst", default=DST_DEFAULT)
    args = ap.parse_args()
    build(args.src, args.dst)
