#!/usr/bin/env python3
"""Build a k-fold scaled copy of an sf testdata dir for scaling-slope
measurement (round-9 task: measure, don't argue, the time-vs-size slope).

Fact tables (events, documents, embeddings, lineitem, orders) get k
shifted copies; dimension tables (customer, supplier, part, nation,
region) are copied as-is — the realistic growth shape: facts grow,
dims don't.

Key shifts keep copies disjoint where identity matters; ts shifts extend
the TIME RANGE (a feed growing 3x is 3 months, not 3x density); document
text gets a per-copy suffix token so exact-dup dedup does not collapse
the copies (cross-copy pairs stay LINEAR in k for the near-dup family:
each original contributes k-1 clone pairs, not a quadratic blowup).

Usage: make_scale.py <src_sf_dir> <dst_dir> <k>
"""
import sys

import duckdb

SRC, DST, K = sys.argv[1], sys.argv[2], int(sys.argv[3])

con = duckdb.connect()
con.execute("SET threads TO 16")


def copy_as_is(name: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO '{DST}/{name}.parquet' (FORMAT PARQUET)"
    )


def scaled(name: str, select_for_copy) -> None:
    union = "\nUNION ALL\n".join(select_for_copy(c) for c in range(K))
    con.execute(f"COPY ({union}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")


import os

os.makedirs(DST, exist_ok=True)

for dim in ["customer", "supplier", "part", "nation", "region"]:
    copy_as_is(dim)

span = con.execute(
    f"SELECT max(ts) - min(ts) + INTERVAL 1 HOUR FROM '{SRC}/events.parquet'"
).fetchone()[0]

scaled(
    "events",
    lambda c: f"""SELECT event_id + {c*1000000000} AS event_id,
        ts + {c} * INTERVAL '{span.total_seconds()}' SECOND AS ts,
        user_id + {c*1000000000} AS user_id, event_type, value, props
      FROM '{SRC}/events.parquet'""",
)
scaled(
    "documents",
    lambda c: f"""SELECT doc_id + {c*100000000} AS doc_id,
        text || ' cp{c}tok' AS text, lang, source,
        n_chars + {len(' cpXtok')} AS n_chars
      FROM '{SRC}/documents.parquet'""" if c else
    f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'",
)
scaled(
    "embeddings",
    lambda c: f"""SELECT vec_id + {c*1000000000} AS vec_id, embedding, label
      FROM '{SRC}/embeddings.parquet'""",
)
scaled(
    "lineitem",
    lambda c: f"""SELECT l_orderkey + {c*1000000000} AS l_orderkey, l_partkey,
        l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
        l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM '{SRC}/lineitem.parquet'""",
)
scaled(
    "orders",
    lambda c: f"""SELECT o_orderkey + {c*1000000000} AS o_orderkey, o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{SRC}/orders.parquet'""",
)

for name in ["events", "documents", "embeddings", "lineitem", "orders"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n}")
print("done")
