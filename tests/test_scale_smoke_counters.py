"""The sf1 smoke's measured input-growth counters (VERDICT r08 item
5): the adjudication denominators for the >=10x time-ratio rows must
be computed by the smoke itself, and must equal what the queries
actually process — otherwise the in-artifact adjudication is theater.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _snm_closed_form(sizes: list[int], w: int) -> int:
    # brute-force reference: per block, pairs (i, j) with j > i and
    # j - i <= w over the sorted ranks
    total = 0
    for b in sizes:
        total += sum(min(w, b - i) for i in range(1, b + 1))
    return total


def test_snm_pair_formula_matches_bruteforce():
    from tools.scale_smoke import _input_entity_match_pairs  # noqa: F401

    # the closed form used in the counter, checked standalone
    w = 3
    for b in range(0, 12):
        closed = (b - w) * w + w * (w - 1) // 2 if b >= w else b * (b - 1) // 2
        assert closed == _snm_closed_form([b], w), b


def test_entity_match_counter_equals_prefilter_pair_count(spark):
    """The counter's closed form must equal the query's actual
    pre-filter candidate-pair cardinality (the rank-banded join before
    the edit-distance filter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import SNM_WINDOW
    from tools.scale_smoke import _input_entity_match_pairs

    counted = _input_entity_match_pairs(spark, SF)
    c = load_table(spark, SF, "customer")
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "c_name", "c_custkey"
    )
    r = c.withColumn("rn", F.row_number().over(w)).select(
        "c_nationkey", "c_mktsegment", "rn"
    )
    a = r.withColumnRenamed("rn", "rn_a")
    b = r.withColumnRenamed("rn", "rn_b")
    brute = (
        a.join(b, ["c_nationkey", "c_mktsegment"])
        .filter(
            (F.col("rn_b") > F.col("rn_a"))
            & (F.col("rn_b") - F.col("rn_a") <= SNM_WINDOW)
        )
        .count()
    )
    assert counted == brute


def test_text_novelty_counter_matches_query_shingle_total(spark):
    """doc_shingles' cardinality must equal the sum of n_shingles the
    query itself reports — same tokenization, same distinct."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.text_analysis import (
        doc_shingles,
        ngram_novelty,
    )
    from cs744_big_data_system_spark.sources.readers import load_table
    from tools.scale_smoke import _input_text_novelty

    docs = load_table(spark, SF, "documents")
    counted = _input_text_novelty(spark, SF)
    assert counted == doc_shingles(docs, n=3).count()
    reported = (
        ngram_novelty(docs, n=3).agg(F.sum("n_shingles").alias("s")).first()["s"]
    )
    assert counted == reported
    assert counted > 0
