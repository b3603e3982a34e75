"""Scale sf0.1 testdata 10x (or Nx) into a local sf1 directory for
benchmarking (verdict r5 #2: close the 2x gate honestly with an sf1
comparison — at sf0.1 the suite measures Spark's per-query constant).

The driver testdata is read-only and only goes to sf0.1, so sf1 is
derived: each fact table is replicated N times with per-copy key shifts
that stay mutually consistent across tables (copy i of lineitem joins
copy i of orders/part/supplier), so join selectivities and group
cardinalities scale the way real data would. Dims (region, nation) are
shared. Two tables need more than a key shift to keep workload shape:

* documents — a verbatim copy would make every doc a 10-way exact/near
  duplicate, collapsing the dedup entries into a degenerate workload.
  Copy i>0 deterministically shuffles each doc's words (seed = (copy,
  doc_id)) and prepends a copy token: unigram/length distributions are
  preserved (quality/language/token-count entries see the same data
  profile) while order-dependent shingles diverge, so MinHash/SimHash
  near-dup structure per copy matches the original corpus instead of
  exploding across copies.
* embeddings — copy i>0 adds seeded Gaussian noise (sigma 0.2/dim,
  renormalized): far enough from the original that near-dup pairs do
  not explode across copies, close enough that the label clusters (IVF
  structure) survive.

Deterministic: same inputs -> byte-identical outputs (numpy PCG64
seeded per (copy, table)). Usage:

    python tools/gen_sf_scale.py [--out /root/repo/.localdata/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, key ranges used for shifting)
CUST_N = 15_000
SUPP_N = 1_000
PART_N = 20_000
ORD_N = 150_000
EVT_N = 100_000
EVT_USERS = 1_500
DOC_N = 5_000
VEC_N = 2_000


def _copy_sql(con: duckdb.DuckDBPyConnection, out: str, table: str,
              select_tmpl: str, copies: int) -> None:
    parts = [select_tmpl.format(i=i) for i in range(copies)]
    sql = " UNION ALL ".join(parts)
    # Explicit row groups: parquet scan splits align to row-group
    # boundaries in every engine, and DuckDB's default (122,880 rows)
    # writes small tables as ONE group — a single-threaded scan for both
    # engines no matter the core count. Real multi-file datasets don't
    # have this artifact; ~100k-row groups restore honest parallelism.
    con.execute(
        f"COPY ({sql}) TO '{out}/{table}.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


def gen(out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )

    # Dims: shared (region/nation keyspace referenced by every copy).
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )

    _copy_sql(con, out, "customer", f"""
        SELECT c_custkey + {{i}} * {CUST_N} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment FROM customer
    """, copies)
    _copy_sql(con, out, "supplier", f"""
        SELECT s_suppkey + {{i}} * {SUPP_N} AS s_suppkey, s_name,
               s_nationkey, s_acctbal FROM supplier
    """, copies)
    _copy_sql(con, out, "part", f"""
        SELECT p_partkey + {{i}} * {PART_N} AS p_partkey, p_name,
               p_brand, p_type, p_size, p_retailprice FROM part
    """, copies)
    _copy_sql(con, out, "orders", f"""
        SELECT o_orderkey + {{i}} * {ORD_N} AS o_orderkey,
               o_custkey + {{i}} * {CUST_N} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders
    """, copies)
    _copy_sql(con, out, "lineitem", f"""
        SELECT l_orderkey + {{i}} * {ORD_N} AS l_orderkey,
               l_partkey + {{i}} * {PART_N} AS l_partkey,
               l_suppkey + {{i}} * {SUPP_N} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem
    """, copies)
    _copy_sql(con, out, "events", f"""
        SELECT event_id + {{i}} * {EVT_N} AS event_id, ts,
               user_id + {{i}} * {EVT_USERS} AS user_id,
               event_type, value, props FROM events
    """, copies)

    # documents: per-copy deterministic word shuffle (see module doc).
    src_docs = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet') "
        "ORDER BY doc_id"
    ).df()
    frames = []
    for i in range(copies):
        df = src_docs.copy()
        if i > 0:
            texts = []
            for doc_id, text in zip(df["doc_id"], df["text"]):
                words = text.split(" ")
                rng = np.random.default_rng((i << 32) | int(doc_id))
                rng.shuffle(words)
                texts.append(f"c{i} " + " ".join(words))
            df["text"] = texts
            df["n_chars"] = df["text"].str.len().astype("int64")
        df["doc_id"] = df["doc_id"] + i * DOC_N
        frames.append(df)
    import pandas as pd

    docs = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        f"{out}/documents.parquet",
        row_group_size=2000,  # 25 groups at 10 copies: parallel text scans
    )
    print(f"documents: {len(docs)} rows")

    # embeddings: per-copy seeded Gaussian perturbation, renormalized.
    emb = con.execute(
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet') "
        "ORDER BY vec_id"
    ).df()
    base = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    vec_ids, vecs, labels = [], [], []
    for i in range(copies):
        if i == 0:
            v = base
        else:
            rng = np.random.default_rng(1_000_000 + i)
            v = base + rng.normal(0.0, 0.2, base.shape).astype(np.float32)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
        vec_ids.append(emb["vec_id"].to_numpy() + i * VEC_N)
        vecs.append(v.astype(np.float32))
        labels.append(emb["label"].to_numpy())
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(vec_ids), pa.int64()),
            "embedding": pa.array(
                list(np.concatenate(vecs)), pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labels), pa.int32()),
        }
    )
    pq.write_table(table, f"{out}/embeddings.parquet", row_group_size=1000)
    print(f"embeddings: {table.num_rows} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    gen(a.out, a.copies)
