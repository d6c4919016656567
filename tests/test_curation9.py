"""Laws for the AQP + anti-entropy batch (workloads/curation9.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _md5_int60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_aqp_estimate_reconciles_and_is_unbiased_ish(spark):
    """The estimate is EXACTLY sample_sum x 20 for the md5-selected
    rows; the audit columns reconcile with a driver recompute; the
    relative error of a 5% sample on thousands of rows stays within a
    loose sanity bound (<20%)."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation9 import (
        _AQP_BUCKETS,
        q_aqp_sample_estimate,
    )

    rows = {r.l_returnflag: r for r in q_aqp_sample_estimate(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).collect()
    samp_sum, samp_n, exact_sum = defaultdict(int), defaultdict(int), defaultdict(int)
    for r in li:
        exact_sum[r.l_returnflag] += r.cents
        if _md5_int60(str(r.l_orderkey)) % _AQP_BUCKETS == 0:
            samp_sum[r.l_returnflag] += r.cents
            samp_n[r.l_returnflag] += 1
    for flag, r in rows.items():
        assert r.est_cents == samp_sum[flag] * _AQP_BUCKETS
        assert r.n_sampled == samp_n[flag]
        assert r.exact_cents == exact_sum[flag]
        assert r.rel_err_ppm == math.floor(
            abs(r.est_cents - r.exact_cents) / r.exact_cents * 1e6 + 0.5
        )
        # CLT-scaled sanity bound: ~4 sigma of a mean over n_sampled rows
        assert r.rel_err_ppm < 4.0 / math.sqrt(max(r.n_sampled, 1)) * 1e6


def test_merkle_diff_localizes_exactly_the_corrupted_buckets(spark):
    """Divergent buckets = exactly the md5 buckets containing an
    orderkey divisible by 997; counts equal on both sides (corruption
    is in-place, not insert/delete) and every digest delta is
    non-zero."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation9 import (
        _MERKLE_BUCKETS,
        q_merkle_bucket_diff,
    )

    rows = {r.bucket: r for r in q_merkle_bucket_diff(spark, SF).collect()}
    orders = load_table(spark, SF, "orders").select("o_orderkey").collect()
    expect = {
        _md5_int60(str(r.o_orderkey)) % _MERKLE_BUCKETS
        for r in orders
        if r.o_orderkey % 997 == 0
    }
    assert set(rows) == expect and expect  # non-empty by construction
    for r in rows.values():
        assert r.n_a == r.n_b  # in-place corruption: same cardinality
        assert r.digest_delta != 0
