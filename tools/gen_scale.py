#!/usr/bin/env python3
"""Extrapolate the read-only sf0.1 corpus to a larger scale factor for
local scale spot-checks (SCALE.md). NOT driver testdata — writes to /tmp.

Method: union N key-shifted copies of each scaling table, preserving
schema, FK consistency (order/customer/part/supplier keys shift by the
same stride everywhere they appear), and per-copy uniqueness where join
or dedup semantics need it (document text gets a copy prefix with
n_chars recomputed; supplier/customer names get a copy suffix).
events.ts round-trips as TIMESTAMP_NS because graft.Tables.events reads
the nanos physical type via nanosAsLong.

Usage: python3 tools/gen_scale.py [copies] [outdir]
"""
import sys
import duckdb

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{COPIES}x0.1"
SRC = "/root/testdata/sf0.1"

# key strides: > max key in sf0.1, round numbers for debuggability
S_CUST, S_SUPP, S_PART, S_ORD = 20_000, 2_000, 30_000, 200_000
S_DOC, S_VEC, S_EVT, S_USER = 10_000, 5_000, 200_000, 10_000

con = duckdb.connect()
import os
os.makedirs(OUT, exist_ok=True)


def gen(table, per_copy_sql):
    union = " UNION ALL ".join(per_copy_sql(i) for i in range(COPIES))
    con.sql(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")


def copy_static(table):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: static copy")


copy_static("region")
copy_static("nation")

gen("customer", lambda i:
    f"SELECT c_custkey + {i * S_CUST} AS c_custkey, "
    f"c_name || '_{i}' AS c_name, c_nationkey, c_acctbal, c_mktsegment "
    f"FROM '{SRC}/customer.parquet'")

gen("supplier", lambda i:
    f"SELECT s_suppkey + {i * S_SUPP} AS s_suppkey, "
    f"s_name || '_{i}' AS s_name, s_nationkey, s_acctbal "
    f"FROM '{SRC}/supplier.parquet'")

gen("part", lambda i:
    f"SELECT p_partkey + {i * S_PART} AS p_partkey, p_name, p_brand, "
    f"p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'")

gen("orders", lambda i:
    f"SELECT o_orderkey + {i * S_ORD} AS o_orderkey, "
    f"o_custkey + {i * S_CUST} AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'")

gen("lineitem", lambda i:
    f"SELECT l_orderkey + {i * S_ORD} AS l_orderkey, "
    f"l_partkey + {i * S_PART} AS l_partkey, "
    f"l_suppkey + {i * S_SUPP} AS l_suppkey, l_linenumber, l_quantity, "
    f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"l_shipdate FROM '{SRC}/lineitem.parquet'")

gen("events", lambda i:
    f"SELECT event_id + {i * S_EVT} AS event_id, ts::TIMESTAMP_NS AS ts, "
    f"user_id + {i * S_USER} AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'")

gen("documents", lambda i:
    f"SELECT doc_id + {i * S_DOC} AS doc_id, 'c{i} ' || text AS text, "
    f"lang, source, CAST(length('c{i} ' || text) AS BIGINT) AS n_chars "
    f"FROM '{SRC}/documents.parquet'")

gen("embeddings", lambda i:
    f"SELECT vec_id + {i * S_VEC} AS vec_id, embedding, label "
    f"FROM '{SRC}/embeddings.parquet'")

print(f"wrote {OUT}")
