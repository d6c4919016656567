"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (the 5-value ``event_type`` column is
the fixture's miniature of this) turn one reducer into the job's
critical path. Two standard remedies, both pure DataFrame ops:

  salted aggregation — shuffle once on (key, salt) so hot keys fan out
      across ``buckets`` reducers, then a second tiny shuffle on the
      key merges the partials. The extra shuffle is over pre-aggregated
      rows (|keys|·buckets), i.e. ~free.
  salted broadcast-replicated join — replicate the small side once per
      salt value and salt the big side's key, so a hot join key's rows
      spread over ``buckets`` tasks.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles the
join case automatically when statistics expose the skew; these
operators are for when you know the skew a priori (or the skewed side
is an aggregation, which AQE does not re-balance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """groupBy(keys).sum(value_col) executed as two phases through a
    salted shuffle. The result is identical to the direct aggregation
    (sum is commutative/associative); only the shuffle layout differs.

    Phase 1 shuffles on (keys, salt) — hot keys spread over ``buckets``
    reducers; phase 2 shuffles |distinct keys|·buckets partial rows.
    """
    out = out_col or f"sum_{value_col}"
    salt = F.pmod(F.abs(F.hash(F.rand(seed=14))), F.lit(buckets)).alias("_salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_count(
    df: DataFrame, keys: list[str], buckets: int = 16, out_col: str = "n"
) -> DataFrame:
    """Two-phase salted count — see :func:`salted_sum`."""
    salt = F.pmod(F.abs(F.hash(F.rand(seed=14))), F.lit(buckets)).alias("_salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed ``key`` values: the big side
    gets a random salt ∈ [0, buckets), the small side is replicated
    once per salt value (explode of a literal range — ``buckets``× the
    small side's size, which must remain broadcast-able), and the join
    key becomes (key, salt). Row multiplicity is exactly that of the
    plain join for inner/left joins; right/full outer are rejected —
    the (buckets−1) unmatched small-side replicas per key would emit
    spurious null-extended rows."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left join types, got {how!r}: "
            "replicated small-side rows would null-extend under right/full outer"
        )
    big_s = big.withColumn("_salt", F.pmod(F.abs(F.hash(F.rand(seed=14))), F.lit(buckets)))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(F.broadcast(small_r), [key, "_salt"], how)
    return out.drop("_salt")
