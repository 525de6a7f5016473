#!/usr/bin/env python3
"""Build a k-fold scaled copy of an sf testdata dir for scaling-slope
measurement (round-9 task: measure, don't argue, the time-vs-size slope).

Fact tables (events, documents, embeddings, lineitem, orders) get k
shifted copies; dimension tables (customer, supplier, part, nation,
region) are copied as-is — the realistic growth shape: facts grow,
dims don't.

Key shifts keep copies disjoint where identity matters; ts shifts extend
the TIME RANGE (a feed growing 3x is 3 months, not 3x density).

Text copies substitute every 3rd TOKEN with a copy-tagged token (not just
an appended suffix): every word n-gram of width >= 3 — the smallest
shingle width any family uses — then straddles at least one substituted
position (every run of unsubstituted tokens has length <= 2), so a copy
shares no word shingles with its original or with other copies — exact
dedup cannot collapse copies AND the near-dup / repeated-span families
see each copy as genuinely new text whose only matches are the
WITHIN-copy pairs the original already had. Pair counts therefore grow
exactly k-fold (a bare suffix leaves copies mutually near-identical,
planting C(k,2) cross-copy pairs per original — a quadratic term that
poisons the slope measurement; every-4th substitution leaves intact
3-token runs, so ~25% of trigram shingles survived across copies).
n_chars is recomputed from the substituted text.

Embedding copies go through a per-copy SIGNED PERMUTATION of the 64
dims (an orthogonal transform): every within-copy pairwise angle is
preserved exactly — each copy reproduces the original slice's planted
near-dup structure, so semantic-dedup work grows k-fold — while a
vector and its cross-copy image decorrelate to cos ~ N(0, 1/64)
(sigma ~ 0.125), below the suite's 0.35 near-dup threshold for all but
a ~0.5% tail (measured max ~0.39 at sf0.1 — a handful of stray cross
pairs, noise next to the k-fold within-copy structure); k exact clones
per vector would instead plant C(k,2) cross-copy pairs.

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
def subst_text(c: int) -> str:
    # every 3rd token -> a copy-tagged token (varied by position mod 13 so
    # the substitutes themselves don't form new cross-doc repeated shingles)
    return (
        "array_to_string(list_transform(string_split(text, ' '), "
        f"(t, i) -> CASE WHEN i % 3 = 0 THEN 'cp{c}q' || CAST(i % 13 AS VARCHAR) "
        "ELSE t END), ' ')"
    )


scaled(
    "documents",
    lambda c: f"""SELECT doc_id + {c*100000000} AS doc_id,
        {subst_text(c)} AS text, lang, source,
        CAST(length({subst_text(c)}) AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet'""" if c else
    f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'",
)
scaled(
    "embeddings",
    # per-copy signed permutation (orthogonal: angles preserved within a
    # copy, decorrelated across copies): dim i reads dim (a*i + b) mod 64
    # with a = 2c+1 (odd => bijective mod 64), sign flipped by hash(c, i)
    lambda c: f"""SELECT vec_id + {c*1000000000} AS vec_id,
        list_transform(generate_series(1, 64), i -> CAST(
          (CASE WHEN (hash({c} * 1337 + i) & 1) = 0 THEN -1 ELSE 1 END) *
          embedding[(({2*c+1} * (i - 1) + {c*7}) % 64) + 1] AS FLOAT))
          AS embedding, label
      FROM '{SRC}/embeddings.parquet'""" if c else
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'",
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
