#!/usr/bin/env python3
"""Derive a 10x-rows probe corpus from sf0.1 (the SCALE.md method).

documents: replica 0 is the original; replicas 1-9 prefix every token with
rN_ so cross-replica shingles are disjoint and each replica's internal
duplicate structure equals sf0.1's.

embeddings: each replica applies its own dimension-rotation + sign-pattern
(an orthogonal transform) so intra-replica geometry is exactly preserved
while cross-replica cosines decorrelate.

events: each replica offsets user_id/event_id so per-user trajectories and
windows replicate over disjoint users (timestamps and values unchanged).

Usage: python3 tools/derive_sf1.py [src_dir] [out_dir]
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"

con = duckdb.connect()
con.execute(f"CREATE VIEW docs AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"CREATE VIEW emb AS SELECT * FROM '{src}/embeddings.parquet'")
con.execute(f"CREATE VIEW ev AS SELECT * FROM '{src}/events.parquet'")
import os
os.makedirs(out, exist_ok=True)

ndocs = con.execute("SELECT max(doc_id) + 1 FROM docs").fetchone()[0]
nvec = con.execute("SELECT max(vec_id) + 1 FROM emb").fetchone()[0]
nuser = con.execute("SELECT max(user_id) + 1 FROM ev").fetchone()[0]
nevent = con.execute("SELECT max(event_id) + 1 FROM ev").fetchone()[0]
dims = con.execute("SELECT len(embedding) FROM emb LIMIT 1").fetchone()[0]

doc_parts = ["SELECT doc_id, text, lang, source, n_chars FROM docs"]
for r in range(1, 10):
    doc_parts.append(
        f"SELECT doc_id + {r * ndocs} AS doc_id, "
        f"list_aggregate(list_transform(string_split(trim(text), ' '), "
        f"w -> 'r{r}_' || w), 'string_agg', ' ') AS text, "
        f"lang, source, n_chars FROM docs")
con.execute(f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
            f"'{out}/documents.parquet' (FORMAT PARQUET)")

emb_parts = ["SELECT vec_id, embedding, label FROM emb"]
for r in range(1, 10):
    # rotation: dimension i <- (i + r) % dims; sign: flip when (i*r) % 3 = 0
    emb_parts.append(
        f"SELECT vec_id + {r * nvec} AS vec_id, "
        f"list_transform(range(1, {dims + 1}), i -> "
        f"CAST(CASE WHEN ((i - 1) * {r}) % 3 = 0 THEN -1 ELSE 1 END "
        f"* embedding[((i - 1 + {r}) % {dims}) + 1] AS FLOAT)) AS embedding, "
        f"label FROM emb")
con.execute(f"COPY ({' UNION ALL '.join(emb_parts)}) TO "
            f"'{out}/embeddings.parquet' (FORMAT PARQUET)")

ev_parts = ["SELECT event_id, ts, user_id, event_type, value, props FROM ev"]
for r in range(1, 10):
    ev_parts.append(
        f"SELECT event_id + {r * nevent} AS event_id, ts, "
        f"user_id + {r * nuser} AS user_id, event_type, value, props FROM ev")
con.execute(f"COPY ({' UNION ALL '.join(ev_parts)}) TO "
            f"'{out}/events.parquet' (FORMAT PARQUET)")

# TPC-H: facts replicate 10x over disjoint order keys; dims stay 1x —
# the realistic 100 TB shape (facts grow, dimensions are bounded).
# Customers/parts/suppliers keep their keys, so each gets 10x the fact
# rows; per-orderkey aggregates get 10x the groups instead.
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
con.execute(f"CREATE VIEW ord AS SELECT * FROM '{src}/orders.parquet'")
con.execute(f"CREATE VIEW li AS SELECT * FROM '{src}/lineitem.parquet'")
nord = con.execute("SELECT max(o_orderkey) + 1 FROM ord").fetchone()[0]
ord_parts = ["SELECT * FROM ord"]
li_parts = ["SELECT * FROM li"]
for r in range(1, 10):
    ord_parts.append(
        f"SELECT o_orderkey + {r * nord} AS o_orderkey, o_custkey, "
        f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM ord")
    li_parts.append(
        f"SELECT l_orderkey + {r * nord} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"l_tax, l_returnflag, l_linestatus, l_shipdate FROM li")
con.execute(f"COPY ({' UNION ALL '.join(ord_parts)}) TO "
            f"'{out}/orders.parquet' (FORMAT PARQUET)")
con.execute(f"COPY ({' UNION ALL '.join(li_parts)}) TO "
            f"'{out}/lineitem.parquet' (FORMAT PARQUET)")
print("derived", out, "docs", ndocs * 10, "vecs", nvec * 10,
      "events", nevent * 10, "orders x10, lineitem x10")
