"""Skew-stress fixture for the dedup family (VERDICT r06 item 7).

The remaining untested 100 TB risk in the dedup operators is KEY SKEW:
a boilerplate shingle shared by 10⁶ documents fans a shingle self-join
out to 10¹² rows on that one key, and no partitioning strategy saves a
single key. These tests plant exactly that shape — one boilerplate
sentence shared by HOT_DOCS documents (≈100× the median shingle df of
1) — and assert the operators' documented caps keep the heaviest
bucket bounded:

* ngram_jaccard_pairs / containment_pairs: the ``max_df`` cutoff is
  applied to the exact table the self-join consumes
  (operators/dedup.pruned_shingle_table), so post-cutoff df ≤ max_df
  ⇒ heaviest join bucket ≤ max_df·(max_df−1)/2 candidate rows.
* minhash_lsh_pairs / simhash_hamming_pairs: banding keys are hashes
  of (mostly unique) full signatures, so boilerplate-sharing but
  DISSIMILAR docs must not collapse into one bucket.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT_DOCS = 500  # docs sharing the identical boilerplate sentence
COLD_DOCS = 100
BOILERPLATE = "all rights reserved contact us subscribe to our newsletter today"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """HOT_DOCS docs = shared boilerplate + 24 unique filler words
    (pairwise dissimilar: any two share ONLY the boilerplate shingles);
    COLD_DOCS docs fully unique. Median shingle df = 1, boilerplate
    shingle df = HOT_DOCS — a ~500× hot key."""
    rows = []
    for i in range(HOT_DOCS):
        filler = " ".join(f"hotdoc{i}word{j}" for j in range(24))
        rows.append((i, f"{BOILERPLATE} {filler}", "en", "web"))
    for i in range(COLD_DOCS):
        text = " ".join(f"colddoc{i}word{j}" for j in range(30))
        rows.append((HOT_DOCS + i, text, "en", "web"))
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"]
    ).localCheckpoint(eager=True)


def _bucket_stats(sh, block_col="lang"):
    """(max df, total candidate-pair rows Σ df·(df−1)/2) over the join
    key — the per-bucket and total work of the downstream self-join."""
    row = (
        sh.groupBy(block_col, "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.max("df").alias("max_df"),
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand_rows"),
        )
        .collect()[0]
    )
    return row.max_df, int(row.cand_rows)


def test_df_cutoff_bounds_hot_shingle_bucket(spark, skewed_docs):
    from cs744_big_data_system_spark.operators.dedup import pruned_shingle_table

    cap = 50
    uncut = pruned_shingle_table(skewed_docs, n=3, block_col="lang", max_df=None)
    cut = pruned_shingle_table(skewed_docs, n=3, block_col="lang", max_df=cap)

    max_uncut, cand_uncut = _bucket_stats(uncut)
    max_cut, cand_cut = _bucket_stats(cut)

    # the fixture really is skewed: the boilerplate shingles carry
    # HOT_DOCS df each, and the self-join would pay C(500,2) per shingle
    assert max_uncut == HOT_DOCS
    assert cand_uncut >= (HOT_DOCS * (HOT_DOCS - 1) // 2)

    # the cap is the invariant the 100 TB posture claims: NO join key
    # exceeds max_df after the cutoff, so the heaviest bucket is
    # bounded by max_df^2 regardless of corpus skew
    assert max_cut is not None and max_cut <= cap
    assert cand_cut <= cap * (cap - 1) // 2 * 8  # a few shingles may tie at cap
    # and the cutoff must not nuke the whole table — unique filler stays
    assert cut.count() > HOT_DOCS * 20


def test_jaccard_pairs_complete_and_empty_under_skew(spark, skewed_docs):
    """Boilerplate-only overlap is NOT near-duplication: with the df
    cutoff the hot shingles are pruned (no pairs at all); without it
    the operator must still produce no pairs ABOVE the threshold
    (shared boilerplate ≈ 9/57 Jaccard < 0.2) — the cutoff changes the
    work bound, not the verdict on dissimilar docs."""
    from cs744_big_data_system_spark.operators.dedup import ngram_jaccard_pairs

    pruned = ngram_jaccard_pairs(
        skewed_docs, n=3, threshold=0.2, block_col="lang", max_df=50
    )
    assert pruned.count() == 0


def test_containment_pairs_use_same_pruned_table(spark, skewed_docs):
    from cs744_big_data_system_spark.operators.dedup import containment_pairs

    out = containment_pairs(
        skewed_docs, n=3, threshold=0.8, block_col="lang", max_df=50
    )
    assert out.count() == 0


def test_minhash_banding_does_not_bucket_boilerplate(spark, skewed_docs):
    """LSH band keys hash r=4 minhashes together; docs sharing only
    ~9/33 shingles almost never agree on 4 consecutive minhashes, so
    the hot boilerplate must NOT collapse the band join into one
    500-doc bucket. Assert on the operator's real banding table: the
    heaviest (band_idx, band_hash) bucket stays far below HOT_DOCS."""
    from cs744_big_data_system_spark.operators.dedup import (
        _minhash_band_entries,
        minhash_signatures,
    )

    sig = minhash_signatures(skewed_docs, n=3, num_hashes=32)
    entries = _minhash_band_entries(sig, num_hashes=32, bands=8)
    hottest = (
        entries.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.max("sz"))
        .collect()[0][0]
    )
    assert hottest < HOT_DOCS // 5, hottest


def test_simhash_banding_under_boilerplate_skew(spark, skewed_docs):
    """Simhash pigeonhole bands are 15-bit slices of a 60-bit hash;
    with 24/33 unique tokens per doc the signatures spread. Assert the
    candidate join completes and verified pairs (hamming ≤ 3) do not
    explode into the boilerplate clique."""
    from cs744_big_data_system_spark.operators.dedup import simhash_hamming_pairs

    pairs = simhash_hamming_pairs(skewed_docs, bits=60, max_hamming=3)
    # dissimilar docs (24 unique of ~33 tokens) should essentially
    # never be within hamming 3 of each other; allow a tiny tail
    assert pairs.count() < 50
