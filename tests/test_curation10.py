"""Laws for the streaming-IVM + merkle-repair batch
(workloads/curation10.py): online/offline view agreement and exact
repair-set recovery."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def test_stream_ivm_equals_batch_ivm(spark):
    """The foreachBatch-maintained view must equal the batch IVM query
    row-for-row (same output contract, same oracle) and pass its own
    in-query recompute audit."""
    from cs744_big_data_system_spark.workloads.curation8 import q_ivm_agg_maintenance
    from cs744_big_data_system_spark.workloads.curation10 import q_stream_ivm_replay

    stream_rows = {
        r.event_type: (r.n, r.sum_cents, r.ivm_matches_recompute)
        for r in q_stream_ivm_replay(spark, SF).collect()
    }
    batch_rows = {
        r.event_type: (r.n, r.sum_cents, r.ivm_matches_recompute)
        for r in q_ivm_agg_maintenance(spark, SF).collect()
    }
    assert stream_rows == batch_rows
    assert all(flag == 1 for _, _, flag in stream_rows.values())


def test_merkle_repair_set_is_exactly_the_corruption(spark):
    """The repair rows are exactly the planted corruption (orderkey %
    997 == 0), each with cents_corrupt = cents_good + 1, and each row's
    bucket is in merkle_bucket_diff's divergent set."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation9 import q_merkle_bucket_diff
    from cs744_big_data_system_spark.workloads.curation10 import q_merkle_row_repair

    rows = q_merkle_row_repair(spark, SF).collect()
    expect = {
        r.o_orderkey
        for r in load_table(spark, SF, "orders").select("o_orderkey").collect()
        if r.o_orderkey % 997 == 0
    }
    assert {r.o_orderkey for r in rows} == expect and expect
    assert all(r.cents_corrupt == r.cents_good + 1 for r in rows)
    divergent = {r.bucket for r in q_merkle_bucket_diff(spark, SF).collect()}
    assert {r.bucket for r in rows} <= divergent
