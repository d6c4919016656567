"""Perceptual image-hash dedup: planted near-dup families through the
REAL PPM decode path (SURVEY.md §5.2 planted-duplicate strategy)."""

from __future__ import annotations


def test_image_ahash_is_64bit_and_deterministic(spark):
    from cs744_big_data_system_spark.operators.multimodal import (
        image_ahash,
        synthetic_ppm_assets,
    )

    assets = synthetic_ppm_assets(spark, n=12, groups=6)
    a = {r.asset_id: r.phash for r in image_ahash(assets).collect()}
    b = {r.asset_id: r.phash for r in image_ahash(assets).collect()}
    assert a == b and len(a) == 12
    # base image and its variant share almost all bits
    assert bin((a[0] ^ a[6]) & (2**64 - 1)).count("1") <= 2


def test_image_neardup_finds_planted_families_only(spark):
    from cs744_big_data_system_spark.operators.multimodal import (
        image_neardup_pairs,
        synthetic_ppm_assets,
    )

    # 8 groups × 3 variants; every within-group pair is a near-dup
    assets = synthetic_ppm_assets(spark, n=24, groups=8)
    pairs = {(r.asset_a, r.asset_b): r.hamming for r in
             image_neardup_pairs(assets, max_hamming=6).collect()}
    for (x, y), ham in pairs.items():
        assert x % 8 == y % 8, (x, y)   # precision: no cross-family pair
        assert ham <= 6
    found_groups = {x % 8 for x, _ in pairs}
    assert found_groups == set(range(8))  # recall: every family detected
    # each family of {base, var1, var2}: var1/var2 are identical images
    # (same inverted block), so all 3 within-family pairs must surface
    assert len(pairs) == 24


def test_undecodable_payloads_are_dropped_not_fatal(spark):
    from cs744_big_data_system_spark.operators.multimodal import (
        image_ahash,
        synthetic_assets,
    )

    # synthetic_assets payloads are md5 bytes — not decodable images
    out = image_ahash(synthetic_assets(spark, n=9)).collect()
    assert out == []
