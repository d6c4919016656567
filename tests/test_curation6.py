"""Laws for the round-5 diagnostics batch (workloads/curation6.py):
skew report, explicit connected components, MAD outliers, segmented
Welch t, table checksums. Each query is also oracle-backed via the
registry; these tests pin the invariants the SQL mirror can't express
(planted-truth recovery, layout invariance, statistic sanity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_skew_report_reconciles_with_raw_counts(spark):
    """Hot keys really are the top-k by count (desc, then key), and the
    global stats columns agree with a direct computation."""
    from collections import Counter

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation6 import q_skew_report

    rows = q_skew_report(spark, SF).collect()
    ev = load_table(spark, SF, "events").select("user_id").collect()
    cnt = Counter(r.user_id for r in ev)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted(((r.hot_key, r.hot_cnt) for r in rows), key=lambda kv: (-kv[1], kv[0]))
    assert got == top
    r0 = rows[0]
    assert r0.total_rows == len(ev) and r0.n_keys == len(cnt)
    assert r0.skew_ppm == math.floor(
        max(cnt.values()) * 1000000 * len(cnt) / len(ev)
    )


def test_connected_components_recovers_planted_islands(spark):
    """The iterative kernel must recover the planted island structure
    EXACTLY: every component is [head, next_head), sizes sum to CC_N,
    singleton islands survive via the isolated-node path."""
    import hashlib

    from cs744_big_data_system_spark.workloads.curation6 import (
        CC_N,
        q_graph_connected_components,
    )

    def md5_int60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    heads = [i for i in range(CC_N) if i == 0 or md5_int60(str(i)) % 10 == 0]
    truth = {}
    for k, h in enumerate(heads):
        end = heads[k + 1] if k + 1 < len(heads) else CC_N
        truth[h] = (end - h, end - 1)

    got = {r.component: (r.size, r.max_node) for r in
           q_graph_connected_components(spark, SF).collect()}
    assert got == truth
    assert sum(s for s, _ in got.values()) == CC_N


def test_mad_outliers_match_numpy(spark):
    """Median/MAD/outlier counts against a numpy recomputation with
    the same (n-1)*q interpolation rule."""
    import numpy as np

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation6 import q_robust_outlier_mad

    rows = {r.event_type: r for r in q_robust_outlier_mad(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    from collections import defaultdict

    by = defaultdict(list)
    for r in ev:
        by[r.event_type].append(r.value)
    assert set(rows) == set(by)
    for et, vals in by.items():
        a = np.array(vals)
        med = float(np.quantile(a, 0.5))
        mad = float(np.quantile(np.abs(a - med), 0.5))
        r = rows[et]
        assert r.n == len(vals)
        assert r.med_micro == math.floor(med * 1e6 + 0.5)
        assert r.mad_micro == math.floor(mad * 1e6 + 0.5)
        assert r.n_outliers == int(np.sum(np.abs(a - med) > 3.0 * 1.4826 * mad))


def test_welch_t_matches_scipy_formula(spark):
    """t statistic per segment against a direct Welch computation from
    the raw cents; symmetric arm swap flips the sign."""
    from collections import defaultdict

    import hashlib

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation6 import q_segmented_ab_welch

    rows = {r.segment: r for r in q_segmented_ab_welch(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("user_id", "value").collect()
    arms = defaultdict(lambda: ([], []))
    for r in ev:
        arm = int(hashlib.md5(f"arm#{r.user_id}".encode()).hexdigest()[:15], 16) % 2
        seg = r.user_id % 8
        arms[seg][arm].append(math.floor(r.value * 100 + 0.5))
    for seg, (a, b) in arms.items():
        if len(a) <= 1 or len(b) <= 1:
            assert seg not in rows
            continue
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = (sum(x * x for x in a) - sum(a) ** 2 / len(a)) / (len(a) - 1)
        vb = (sum(x * x for x in b) - sum(b) ** 2 / len(b)) / (len(b) - 1)
        t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        r = rows[seg]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.t_stat - t) < 1e-5


def test_checksum_layout_invariance_and_sensitivity(spark):
    """The fingerprint ignores row order and column order (the query
    itself asserts layout_invariant=1 across a repartitioned,
    reordered scan) but MUST change when a single value changes."""
    from cs744_big_data_system_spark.operators.dedup import md5_int60
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation6 import (
        _fingerprint,
        q_table_checksum_audit,
    )

    rows = q_table_checksum_audit(spark, SF).collect()
    assert {r.table_name for r in rows} == {"customer", "orders", "events"}
    assert all(r.layout_invariant == 1 for r in rows)

    cust = load_table(spark, SF, "customer")
    s = F.concat_ws("|", F.col("c_custkey").cast("string"), F.col("c_name"))
    base = _fingerprint(cust, "t", s).collect()[0]
    # perturb ONE row's name
    perturbed = cust.withColumn(
        "c_name",
        F.when(F.col("c_custkey") == 1, F.concat(F.col("c_name"), F.lit("X"))).otherwise(
            F.col("c_name")
        ),
    )
    changed = _fingerprint(perturbed, "t", s).collect()[0]
    assert changed.n_rows == base.n_rows
    assert changed.hash_sum != base.hash_sum


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 64-node path (diameter 63 >> the 20-round cap) must converge
    under the default max_iterations: plain min-label propagation needs
    diameter rounds and used to raise RuntimeError here; the r08
    pointer-jumping step (COMPRESS_FROM onward) converges in O(log d)
    rounds and must land every node on component 0."""
    from cs744_big_data_system_spark.graph.connected_components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src bigint, dst bigint"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(64)}


def test_connected_components_two_chains_stay_separate(spark):
    """Pointer jumping must not leak labels across components: two
    disjoint long chains resolve to their own minima."""
    from cs744_big_data_system_spark.graph.connected_components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)]
        + [(100 + i, 100 + i + 1) for i in range(30)],
        "src bigint, dst bigint",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert all(c == 0 for n, c in got.items() if n < 100)
    assert all(c == 100 for n, c in got.items() if n >= 100)
    assert len(got) == 62
