"""Workload registry: every operator from SURVEY.md §2 (and the §2.9 /
LLM-pipeline extensions) as a named query with, where SQL-expressible,
a DuckDB oracle that must hash-match.

Each entry is (fn: (spark, sf_dir) -> DataFrame, oracle: str | None).
Column names/types are aligned between the Spark result and the oracle
(the driver sorts columns by name and hashes values — SURVEY.md §5.2).

Conventions shared by both sides:
  * timestamps → ``unix_micros(ts)`` / ``epoch_us(ts)`` (bigint) or
    date-formatted strings — never raw timestamp objects;
  * float aggregates → round(x, 4..6) with identical accumulation order;
  * DuckDB integer sums → CAST(... AS BIGINT) (DuckDB widens to INT128);
  * every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs744_big_data_system_spark.workloads import (
    curation,
    curation2,
    curation3,
    curation4,
    curation5,
    curation6,
    curation7,
    curation8,
    curation9,
    curation10,
    frontends,
    llm,
    pipeline_ext,
    relational,
    relational_ext,
    streaming_graph,
    tpch,
    warehouse,
)


def all_workloads() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # ORDERING INVARIANT (keep this rule every round): the driver's
    # correctness harness verifies only the FIRST ~50 registry entries in
    # order.  Rounds r01-r04 attested 200 distinct entries (see
    # CORRECTNESS_r0*.json); the never-attested go first — oracle-backed
    # ahead of rows-only.  Any NEW query added mid-round must be APPENDED
    # AFTER the never-attested block (never inserted before it) until it
    # has a driver-attested green row, so each round's window retires the
    # oldest unattested prefix.
    reg: dict = {}
    reg.update(llm.WORKLOADS)
    reg.update(streaming_graph.WORKLOADS)
    reg.update(warehouse.WORKLOADS)
    reg.update(relational.WORKLOADS)
    reg.update(tpch.WORKLOADS)
    reg.update(relational_ext.WORKLOADS)
    reg.update(pipeline_ext.WORKLOADS)
    reg.update(curation.WORKLOADS)
    # round-5 additions: appended after the never-attested block per
    # the ordering invariant; they enter the r06 window.
    # NEXT ROTATION (round 6): promote, in order, (1) the 6 rows-only
    # leftovers below the marker in never_attested_rest, (2) the
    # round-5 curation2 batch — dedup_incremental, retrieval_ndcg,
    # graph_clustering_coeff, skyline_2d, graph_link_prediction,
    # data_card_report, stream_data_card_replay, scd2_asof_lookup,
    # quantile_drift_psi, sql_pipe_syntax, dedup_cluster_stats (all
    # oracle-backed) plus rows-only audio_frame_features — every one
    # selfcheck-green under BOTH engine and vanilla sessions — 18
    # entries total, leaving ~32 window slots for round-6 additions.
    # Order oracle-backed before rows-only when promoting.
    reg.update(curation2.WORKLOADS)
    # late-round-5 batch (curation3, ALL 12 oracle-backed): recursive
    # CTE, OHLC rollup, interval-overlap join, BM25 search, parquet
    # schema evolution, idempotent MERGE sink, state-store inspect,
    # video frame sampling, GDPR copy-on-write delete, CBO join
    # reorder, streaming progress metrics, cohort matrix — appended
    # after curation2 per the same invariant; promote with the
    # curation2 block in r06+ (30 backlog entries total → r06 window
    # has ~20 free slots).
    reg.update(curation3.WORKLOADS)
    # front-end / Python-boundary batch (frontends, ALL 8 oracle-backed):
    # pandas-on-Spark Q1, SQL table function, UTF8_LCASE collation,
    # mapInArrow, dropDuplicatesWithinWatermark, Python-DS sink
    # (two-phase commit), RocksDB state store, linear interpolation —
    # same invariant — plus DPP, runtime bloom-filter join, session
    # timeout eviction, polymorphic UDTF (12 total, all oracle-backed);
    # promote with the curation3 block in r06+ (42 backlog entries).
    reg.update(frontends.WORKLOADS)
    # round-5 closing batch (curation4, ALL 8 oracle-backed): txlog
    # vacuum/retention audit, deterministic random walks, zipWithIndex
    # global row ids, two-pass exact quantiles, dynamic partition
    # overwrite, k-fold CV from sufficient statistics, exact KS drift
    # statistic, batched multi-source BFS — appended per the same invariant;
    # promote with the curation2/3/frontends backlog in r06+.
    reg.update(curation4.WORKLOADS)
    # round-5 final batch (curation5, ALL 6 oracle-backed): regex
    # log-line ETL, grid-blocked spatial nearest-neighbor join,
    # decision-stump fit from sufficient statistics, per-column
    # entropy/mode profile, hash-bootstrap CI, per-group mode
    # imputation — appended per the same invariant; promote with the
    # curation2/3/4/frontends backlog in r06+.
    reg.update(curation5.WORKLOADS)
    # round-5 batch (curation6, ALL 5 oracle-backed): join-key skew
    # report, explicit connected components vs planted-islands truth,
    # MAD robust outliers, per-segment Welch t-test, order-independent
    # table checksum audit — appended per the same invariant; promote
    # with the rest of the round-5 backlog in r06+.
    reg.update(curation6.WORKLOADS)
    # round-5 batch (curation7, ALL 3 oracle-backed): exact Shapley
    # channel attribution, null-safe equality join, bag-semantics set
    # operations — appended per the same invariant; promote with the
    # rest of the round-5 backlog in r06+.
    reg.update(curation7.WORKLOADS)
    # round-5 batch (curation8, oracle-backed): incremental view
    # maintenance (delta-merge aggregate refresh with in-query
    # recompute proof) — appended per the same invariant.
    reg.update(curation8.WORKLOADS)
    # round-5 batch (curation9, both oracle-backed): AQP hash-sample
    # estimate with in-query error audit, merkle-style bucket diff
    # (anti-entropy repair) — appended per the same invariant.
    reg.update(curation9.WORKLOADS)
    # round-5 batch (curation10, both oracle-backed): streaming IVM
    # twin (shares the batch oracle — online/offline agreement) and
    # merkle row-level repair (phase-2 drill-down) — appended per the
    # same invariant.
    reg.update(curation10.WORKLOADS)

    # ATTESTATION ROTATION — the driver attests the FIRST 50 registry
    # entries each round, so the registry front doubles as the rotation
    # window. Invariant (VERDICT r06/r07): never-attested entries
    # first, then stalest-first (oldest successful attestation round),
    # registry order within a class. Since r09 the front is GENERATED:
    # `python tools/attest_rotation.py --write` derives it from the
    # CORRECTNESS_r*.json artifacts on disk and rewrites _rotation.py;
    # tests/test_bench_contract.py asserts the wired front still
    # matches the artifacts. Every name must exist in the registry
    # (ADVICE r06: a typo must raise, not silently shift the window;
    # ADVICE r07: raise explicitly — `python -O` strips asserts).
    from ._rotation import FRONT

    missing = [name for name in FRONT if name not in reg]
    if missing:
        raise KeyError(f"rotation names not in registry: {missing}")
    ordered = {name: reg[name] for name in FRONT}
    ordered.update(reg)
    return ordered


# (Historical r06–r08 rotation notes: see git history of this file.)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_workloads().items() if sql is not None}
