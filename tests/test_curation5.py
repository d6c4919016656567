"""Laws for the round-5 final batch (workloads/curation5.py): regex
log-line ETL, grid-blocked spatial join, decision-stump fit, column
entropy profile, hash-bootstrap CI, mode imputation. Each query is
also oracle-backed via the registry; these tests pin the algorithmic
invariants the SQL mirror can't express (blocking losslessness,
split-search optimality, CI ordering, entropy bounds)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_weblog_parse_total_and_methods(spark):
    """The parse is lossless: every event yields exactly one parsed
    request, the method set is the five-way event_type mapping, and
    per-class bytes reconcile with a direct (regex-free) computation."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation5 import q_weblog_parse_agg

    out = q_weblog_parse_agg(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert sum(r.n_req for r in out) == ev.count()
    assert {r.method for r in out} <= {"GET", "HEAD", "POST", "PUT", "DELETE"}
    assert {r.status_class for r in out} <= {200, 400, 500}
    direct = (
        ev.select((F.col("event_id") % 10000).alias("b"))
        .agg(F.sum("b"))
        .collect()[0][0]
    )
    assert sum(r.bytes_sum for r in out) == direct


def test_spatial_blocking_is_lossless(spark):
    """The 3x3 neighbor-cell blocked join returns EXACTLY the pairs an
    exhaustive cross join finds within the radius — blocking must never
    drop a match (the d <= 0.7 radius was chosen to make the 1-degree
    grid cover complete) — and the reported nearest is the argmin."""
    from cs744_big_data_system_spark.workloads.curation5 import (
        _SPATIAL_D2_MAX,
        _lat_expr,
        _lon_expr,
        q_spatial_join_blocked,
    )
    from cs744_big_data_system_spark.sources.readers import load_table

    out = {r.c_custkey: (r.nearest_suppkey, r.d2_ppm) for r in
           q_spatial_join_blocked(spark, SF).collect()}

    cust = load_table(spark, SF, "customer").select(
        "c_custkey",
        _lat_expr(F.col("c_custkey")).alias("lat"),
        _lon_expr(F.col("c_custkey")).alias("lon"),
    ).collect()
    supp = load_table(spark, SF, "supplier").select(
        "s_suppkey",
        _lat_expr(F.col("s_suppkey") + 1000000).alias("lat"),
        _lon_expr(F.col("s_suppkey") + 1000000).alias("lon"),
    ).collect()
    truth = {}
    for c in cust:
        best = None
        for s in supp:
            d2 = (c.lat - s.lat) ** 2 + ((c.lon - s.lon) * 0.7) ** 2
            if d2 <= _SPATIAL_D2_MAX:
                key = (math.floor(d2 * 1e6 + 0.5), s.s_suppkey)
                if best is None or key < best:
                    best = key
        if best is not None:
            truth[c.c_custkey] = (best[1], best[0])
    assert out == truth


def test_decision_stump_beats_every_candidate(spark):
    """The argmin row's Gini must equal the brute-force best over a
    driver-side recomputation from raw rows, and all sufficient
    statistics must reconcile (n_left + n_right == N on every row)."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation5 import q_decision_stump_fit

    rows = q_decision_stump_fit(spark, SF).collect()
    ev = load_table(spark, SF, "events").select(
        F.floor("value").cast("long").alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    ).collect()
    n_total = len(ev)
    assert all(r.n_left + r.n_right == n_total for r in rows)
    assert all(r.pos_left + r.pos_right == sum(e.pos for e in ev) for r in rows)

    # brute force: for each split bin, weighted Gini from raw rows
    best_spark = min((r.gini_ppm, r.split_bin) for r in rows)
    best_brute = None
    for r in rows:
        s = r.split_bin
        left = [e for e in ev if e.bin <= s]
        right = [e for e in ev if e.bin > s]
        assert (len(left), len(right)) == (r.n_left, r.n_right)

        def gini_part(part):
            p = sum(e.pos for e in part)
            n = len(part)
            return n - (p * p + (n - p) * (n - p)) / n

        g = (gini_part(left) + gini_part(right)) / n_total
        g_ppm = math.floor(g * 1e6 + 0.5)
        assert g_ppm == r.gini_ppm
        if best_brute is None or (g_ppm, s) < best_brute:
            best_brute = (g_ppm, s)
    assert best_spark == best_brute


def test_entropy_profile_bounds(spark):
    """Entropy is non-negative, at most ln(n_distinct) (uniform bound),
    zero iff single-valued; mode frequency is the max; totals match."""
    from cs744_big_data_system_spark.workloads.curation5 import (
        q_column_entropy_profile,
    )
    from cs744_big_data_system_spark.sources.readers import load_table

    rows = {r.column_name: r for r in q_column_entropy_profile(spark, SF).collect()}
    assert set(rows) == {"documents.lang", "documents.source", "events.event_type"}
    docs = load_table(spark, SF, "documents")
    assert rows["documents.lang"].n_total == docs.count()
    for r in rows.values():
        # entropy_micro_sum = n_total * H(X) in micro-nats
        h = r.entropy_micro_sum / 1e6 / r.n_total
        assert -1e-6 <= h <= math.log(r.n_distinct) + 1e-6
    # mode really is the most frequent lang
    top = (
        docs.groupBy("lang").count().orderBy(F.desc("count"), "lang").first()
    )
    assert rows["documents.lang"].mode_value == top["lang"]


def test_bootstrap_ci_brackets_point_and_is_ordered(spark):
    """lo <= hi always; for a well-behaved mean the 95% interval
    brackets the point estimate; exactly B replicates contribute."""
    from cs744_big_data_system_spark.workloads.curation5 import _BOOT_B, q_bootstrap_ci

    r = q_bootstrap_ci(spark, SF).collect()[0]
    assert r.n_replicates == _BOOT_B
    assert r.ci_lo_milli <= r.ci_hi_milli
    assert r.ci_lo_milli <= r.point_mean_milli <= r.ci_hi_milli
    # half-sampling keeps the replicate mean near the point estimate
    assert abs(r.ci_hi_milli - r.ci_lo_milli) / r.point_mean_milli < 0.25


def test_mode_impute_covers_all_missing_sources(spark):
    """Every source with at least one masked doc gets exactly one
    imputation row; the mode comes from the OBSERVED slice only and is
    its true per-source argmax with the smallest-lang tie-break."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation5 import q_mode_impute

    out = {r.source: r for r in q_mode_impute(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select(
        "source", "lang", (F.col("n_chars") % 7 == 0).alias("missing")
    ).collect()
    from collections import Counter, defaultdict

    miss = Counter(d.source for d in docs if d.missing)
    obs = defaultdict(Counter)
    for d in docs:
        if not d.missing:
            obs[d.source][d.lang] += 1
    assert set(out) == {s for s in miss if s in obs}
    for s, r in out.items():
        assert r.n_missing == miss[s]
        assert r.n_observed == sum(obs[s].values())
        expect = min(obs[s].items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r.mode_lang == expect
