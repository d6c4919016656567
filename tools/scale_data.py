"""Materialize an sf1-equivalent dataset from the driver's sf0.1
parquet by 10x key-offset replication — the scale-smoke input for
tools/scale_smoke.py (VERDICT r03 next-step #6: convert the 100 TB
design claims into measurements above sf0.1).

Replication model: every entity key is offset by replica*10^7, so all
foreign-key joins stay consistent within a replica and replicas never
collide; region/nation stay fixed (fixed-size catalogs in TPC-H);
event/order timestamps are NOT shifted — the calendar span is a
property of the dataset, so scaling density-per-day (not span) is
what a real 10x traffic growth looks like, and it exercises the
calendar-bounded-window claims (peak_concurrency's carry table must
NOT grow 10x). Text/embeddings replicate verbatim: dedup/ANN see
10-cliques of exact duplicates — the worst-case duplicate density for
the banded self-joins.

Usage: python tools/scale_data.py [out_dir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 10_000_000  # > every sf0.1 key; replicas never collide

#: per-table bigint key columns that get the replica offset
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim")
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} + r.r * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} "
            f"      FROM read_parquet('{SRC}/{t}.parquet'), "
            f"           (SELECT unnest(range({REPLICAS})) AS r) AS r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({REPLICAS}x)")


if __name__ == "__main__":
    main()
