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
NOT grow 10x).

Content model (VERDICT r07 item 3): verbatim replication of documents
/embeddings makes every pairwise-dedup intermediate grow
~quadratically BY CONSTRUCTION (each doc becomes a 10-clique of exact
duplicates), which confounds the smoke's ratios — every dedup row
needed the same "output-bound" adjudication each round. The DEFAULT
mode therefore PERTURBS clone content, md5-seeded so runs are
bit-reproducible:

  * documents.text, replica r (1..9): each whitespace token is
    substituted with probability r% (graded — "~1% per clone"),
    decided by md5_number_lower(doc_id_r_idx) % 100 < r; the
    substitute is a unique-ish noise token derived from the same md5.
    Replica 1 is a 99%-similar near-dup of the original; replica 9 is
    ~47% at the 8-token-window level ((1-0.09)^8) — exact clone
    families are gone, near-dup STRUCTURE survives (nearby replicas
    still pair), and deep replicas fall out of band/threshold reach,
    so pairwise intermediates scale ~linearly with the corpus.
    n_chars is recomputed from the perturbed text.
  * embeddings.embedding, replica r (1..9): per-component relative
    jitter of ±r% (md5-seeded uniform), breaking exact-duplicate
    vectors while keeping each clone family a tight cosine cluster
    (cos ≥ ~0.996 at r=9) — SemDeDup/ANN still see the families as
    near-dups; they just stop being bit-identical.

``--verbatim`` restores the old worst-case-duplicate-density mode
(10-cliques of exact duplicates — the stress input the banded
self-joins were originally smoked under).

Usage: python tools/scale_data.py [out_dir] [--verbatim]
       (default out_dir /tmp/scale_sf1)
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
VERBATIM_TABLES = ["region", "nation"]

#: perturbed-clone expressions, keyed by (table, column). ``{r}`` is
#: the replica alias; r=0 passes through verbatim (the original corpus
#: and its natural near-dup structure are preserved exactly once).
_PERTURB = {
    ("documents", "text"): """
        CASE WHEN r.r = 0 THEN text ELSE array_to_string(
            list_transform(
                string_split(text, ' '),
                (tok, i) -> CASE
                    WHEN md5_number_lower(
                             doc_id::VARCHAR || '_' || r.r::VARCHAR
                             || '_' || i::VARCHAR) % 100 < r.r
                    THEN 'tk' || substr(
                             md5(doc_id::VARCHAR || '_' || r.r::VARCHAR
                                 || '_' || i::VARCHAR), 1, 6)
                    ELSE tok END),
            ' ') END AS text
    """,
    ("embeddings", "embedding"): """
        CASE WHEN r.r = 0 THEN embedding ELSE list_transform(
            embedding,
            (x, i) -> CAST(x * (1.0 + (
                (md5_number_lower(
                     vec_id::VARCHAR || '_' || r.r::VARCHAR
                     || '_' || i::VARCHAR) % 2001)::BIGINT - 1000
            ) * 1e-5 * r.r) AS FLOAT)) END AS embedding
    """,
}


USAGE = (
    "Usage: python tools/scale_data.py [out_dir] [--verbatim]\n"
    "       (default out_dir /tmp/scale_sf1)"
)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--verbatim"]
    verbatim = "--verbatim" in sys.argv[1:]
    flags = [a for a in args if a.startswith("-")]
    if flags:
        # An unknown flag must not silently become the output directory
        # (`--help` once created a ./--help dir full of parquet). Hard
        # constant, not __doc__ slices: under `python -OO` __doc__ is
        # None and the error path itself would raise (ADVICE r08).
        sys.exit(f"unknown option(s) {flags}; {USAGE}")
    out = args[0] if args else "/tmp/scale_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM_TABLES:
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
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} + r.r * {OFF} AS {c}")
            elif not verbatim and (t, c) in _PERTURB:
                exprs.append(_PERTURB[(t, c)])
            elif not verbatim and t == "documents" and c == "n_chars":
                # recomputed from the perturbed text below — the raw
                # column would be stale for replicas 1..9
                continue
            else:
                exprs.append(c)
        proj = ", ".join(exprs)
        sql = (
            f"SELECT {proj} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"     (SELECT unnest(range({REPLICAS})) AS r) AS r"
        )
        if not verbatim and t == "documents":
            sql = f"SELECT * REPLACE (length(text) AS n_chars) FROM (SELECT *, 0 AS n_chars FROM ({sql}))"
        con.sql(
            f"COPY ({sql}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        perturbed = not verbatim and any(tt == t for tt, _ in _PERTURB)
        print(f"{t}: {n} rows ({REPLICAS}x, "
              f"{'perturbed' if perturbed else 'verbatim content'})")


if __name__ == "__main__":
    main()
