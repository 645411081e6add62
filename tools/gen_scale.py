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

Regimes (VERDICT r17 #5): the default CLIQUE mode prefixes each copy's
document text with 'c{i} ', so every base doc becomes an N-clique of
near-identicals — the worst case for pair-EMITTING entries, whose output
(and so their cost) grows Omega(N^2) by construction; it measures output
scaling, not engine scaling. --organic instead makes every copy UNIQUE
and non-near-duplicate: each word gets a per-copy suffix (word-level
shingles/minhash across copies share nothing, so no dedup clique forms)
and each embedding is rotated by i positions (norm-preserving, cosine
broken), while lengths/counts/key strides stay identical to clique mode.
Organic measures pure engine scaling at N x rows with output sizes that
stay ~linear; run both and the gap between the columns IS the
output-bound share of an entry's cost.

Usage: python3 tools/gen_scale.py [copies] [outdir] [--organic]
"""
import sys
import duckdb

ORGANIC = "--organic" in sys.argv
argv = [a for a in sys.argv if a != "--organic"]
COPIES = int(argv[1]) if len(argv) > 1 else 5
# the organic embedding transform is rotation(i mod 64) composed with a
# per-copy signed permutation (sign mask from sha256(i)) — orthogonal, so
# norm-preserving, and no two copies share the transform, so the old
# rotation-wrap clique at copies 64 apart is gone (VERDICT r18 #6). A
# generation-time cross-copy cosine audit below enforces the no-clique
# property empirically (an explicit raise, not an assert — ADVICE r18:
# asserts vanish under python -O). Sanity cap only:
if ORGANIC and COPIES > 1024:
    raise SystemExit("--organic sanity cap: at most 1024 copies")
OUT = argv[2] if len(argv) > 2 else \
    f"/tmp/sf{COPIES}x0.1{'org' if ORGANIC else ''}"
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

def doc_text(i):
    if i == 0 or not ORGANIC:
        # clique mode: near-identical copies (prefix perturbation only)
        return f"'c{i} ' || text"
    # organic mode: suffix every word with the copy ordinal — copy i's
    # word-level shingle/minhash/token space shares nothing with copy j's,
    # so no near-dup cliques form; word count and ~lengths are preserved
    return ("list_aggregate(list_transform("
            "string_split_regex(trim(text), '\\s+'), "
            f"w -> w || '_{i}'), 'string_agg', ' ')")


gen("documents", lambda i:
    f"SELECT doc_id + {i * S_DOC} AS doc_id, {doc_text(i)} AS text, "
    f"lang, source, CAST(length({doc_text(i)}) AS BIGINT) AS n_chars "
    f"FROM '{SRC}/documents.parquet'")


def emb_signs(i):
    # deterministic per-copy sign mask: bit j of sha256("graft-organic-i")
    # decides dim j's sign. Distinct copies get distinct masks (sha256
    # collision over small ints is not a real event), so even copies whose
    # rotation amount wraps (64 apart) differ by a sign pattern whose
    # cross-cosine on a dense vector is a +-1 random walk over 64 dims
    # (~0.12 typical), nowhere near the 0.9+ near-dup band.
    import hashlib
    h = hashlib.sha256(f"graft-organic-{i}".encode()).digest()
    return [1.0 if (h[j // 8] >> (j % 8)) & 1 else -1.0 for j in range(64)]


def emb_select(i):
    # organic mode: rotation by (i mod 64) composed with the per-copy sign
    # mask — a signed permutation, i.e. an orthogonal matrix: norms are
    # preserved (quantize/norm audits see the same magnitudes) while
    # cross-copy cosine is broken, so no embedding near-dup cliques form.
    # The rotated vector is built in an inner SELECT so it is evaluated
    # once, not 64 times in the sign-application list.
    if i == 0 or not ORGANIC:
        return (f"SELECT vec_id + {i * S_VEC} AS vec_id, embedding, label "
                f"FROM '{SRC}/embeddings.parquet'")
    k = i % 64
    rot = "embedding" if k == 0 else \
        f"list_concat(embedding[{k + 1}:], embedding[1:{k}])"
    signs = emb_signs(i)
    flipped = ", ".join(
        f"r[{j + 1}]" if signs[j] > 0 else f"-r[{j + 1}]" for j in range(64))
    return (f"SELECT vec_id, [{flipped}] AS embedding, label FROM "
            f"(SELECT vec_id + {i * S_VEC} AS vec_id, {rot} AS r, label "
            f"FROM '{SRC}/embeddings.parquet')")


gen("embeddings", emb_select)

if ORGANIC and COPIES > 1:
    # empirical no-clique audit: for a sample of base vectors, the max
    # cross-copy |cosine| between any two copies must sit far below the
    # near-dup band. This is the real guard (raises regardless of -O).
    row = con.sql(f"""
        WITH e AS (SELECT vec_id % {S_VEC} AS base, vec_id, embedding
                   FROM '{OUT}/embeddings.parquet'
                   WHERE vec_id % {S_VEC} < 20)
        SELECT max(abs(list_cosine_similarity(a.embedding, b.embedding)))
        FROM e a JOIN e b ON a.base = b.base AND a.vec_id < b.vec_id
    """).fetchone()
    worst = row[0]
    print(f"organic cross-copy |cosine| max (20-base sample): {worst:.4f}")
    if worst is None or worst >= 0.9:
        raise SystemExit(
            f"organic embedding transform leaked a cross-copy near-dup "
            f"(max |cosine| {worst}) — the no-clique property is broken")

print(f"wrote {OUT}")
