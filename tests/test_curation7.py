"""Laws for the round-5 closing batch (workloads/curation7.py):
Shapley attribution, null-safe join, bag set-operations. Each query is
also oracle-backed via the registry; these tests pin the axioms the
SQL mirror can't express (efficiency, multiset identities)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency_axiom(spark):
    """Σ_i φ_i must equal v(grand coalition) − v(∅) (the efficiency
    axiom) — recomputed from raw rows, within micro-unit rounding of
    the 4 per-channel floors."""
    from collections import defaultdict

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation7 import (
        _SHAP_CHANNELS,
        q_attribution_shapley,
    )

    rows = {r.channel: r.phi_micro for r in q_attribution_shapley(spark, SF).collect()}
    assert set(rows) == {c for c, _ in _SHAP_CHANNELS}

    ev = load_table(spark, SF, "events").select("user_id", "event_type").collect()
    bit = dict(_SHAP_CHANNELS)
    masks = defaultdict(int)
    conv = defaultdict(int)
    for r in ev:
        masks[r.user_id] |= bit.get(r.event_type, 0)
        if r.event_type == "purchase":
            conv[r.user_id] = 1

    def v(S):
        users = [u for u, m in masks.items() if (m & S) == m]
        if not users:
            return 0.0
        return sum(conv[u] for u in users) / len(users)

    # full recompute of every phi for exactness, then the axiom
    fact = {0: 6, 1: 2, 2: 2, 3: 6}
    for name, b in _SHAP_CHANNELS:
        total = 0.0
        for S in range(16):
            if S & b:
                continue
            sz = bin(S).count("1")
            total += fact[sz] * (v(S | b) - v(S))
        assert rows[name] == math.floor(total / 24.0 * 1e6 + 0.5)
    # efficiency: sum of unfloored phis telescopes to v(15) - v(0)
    phi_sum = sum(rows.values()) / 1e6
    assert abs(phi_sum - (v(15) - v(0))) < 4e-6  # 4 floors' worth of slack


def test_null_safe_join_counts(spark):
    """NULL keys pair with each other (count = n_null_a * n_null_b under
    key -1) and non-null groups multiply their side counts."""
    from collections import Counter

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation7 import q_join_null_safe

    out = {r.key: r.n_pairs for r in q_join_null_safe(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_id", "user_id").collect()
    ca, cb = Counter(), Counter()
    for r in ev:
        k = -1 if r.event_id % 7 == 0 else r.user_id % 50
        (ca if r.event_id % 2 == 0 else cb)[k] += 1
    expect = {k: ca[k] * cb[k] for k in set(ca) & set(cb) if ca[k] * cb[k] > 0}
    assert out == expect
    assert -1 in out  # the NULL-NULL matches really happen


def test_bag_ops_multiset_identities(spark):
    """|A ∩all B| + |A \\all B| = |A| and |A ∪all B| = |A| + |B|; the
    checksums obey the same additivity (union) and the intersect/except
    checksums partition A's checksum."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation7 import q_set_ops_bag

    rows = {r.op: r for r in q_set_ops_bag(spark, SF).collect()}
    assert set(rows) == {"intersect_all", "except_all", "union_all"}
    ev = load_table(spark, SF, "events").select(
        (F.col("user_id") % 100).alias("u"), "event_type"
    )
    n_a = ev.filter(F.col("event_type").isin("click", "view", "purchase")).count()
    n_b = ev.filter(F.col("event_type").isin("view", "purchase", "signup")).count()
    assert rows["intersect_all"].n_rows + rows["except_all"].n_rows == n_a
    assert rows["union_all"].n_rows == n_a + n_b
    assert (
        rows["intersect_all"].bag_checksum + rows["except_all"].bag_checksum
        != rows["union_all"].bag_checksum
    )  # union includes B's copies too
