"""Warm single-node DuckDB baseline for every `oracle_sql()` entry at an
arbitrary SF directory (verdict r5 #2: extend BASELINE.md with sf1
numbers so the 2x gate is judged where constants wash out).

Methodology matches BASELINE.md exactly: 32 threads, parquet views, one
full warm pass, then best-of-N per query with `fetchall()` included.
Prints one JSON line: {"total": s, "queries": {name: s, ...}, "sf_dir": ...}.

Usage:
    python tools/baseline_duckdb.py [--sf-dir /root/repo/.localdata/sf1] \
        [--runs 3] [--only q1_pricing_summary,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="comma-separated entry names (default: all)")
    a = ap.parse_args()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{a.sf_dir}/{t}.parquet')"
        )

    # Scale-dependent oracle fragments (the embedding-LSH plane count)
    # must be derived from the SF being benchmarked, not the driver's
    # sf0.01 compare default — otherwise the two engines bucket with
    # different plane counts and the A/B is invalid (verdict r8 #1).
    os.environ["PATITO_ORACLE_SF_DIR"] = a.sf_dir
    oracles = entry_mod.oracle_sql()
    if a.only:
        keep = set(a.only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}

    # Warm pass (page cache + catalogs), then best-of-N interleaved full
    # passes — same anti-jitter shape as bench.py.
    for sql in oracles.values():
        con.execute(sql).fetchall()

    best = {name: float("inf") for name in oracles}
    for _ in range(a.runs):
        for name, sql in oracles.items():
            start = time.perf_counter()
            con.execute(sql).fetchall()
            best[name] = min(best[name], time.perf_counter() - start)

    timings = {name: round(t, 4) for name, t in best.items()}
    print(json.dumps({
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "sf_dir": a.sf_dir,
        "runs": a.runs,
    }))


if __name__ == "__main__":
    main()
