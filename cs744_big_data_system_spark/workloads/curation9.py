"""Round-5 sixth closing batch —

  * ``aqp_sample_estimate`` — approximate query processing: estimate a
    grouped SUM from a 5% md5-hash sample (Horvitz-Thompson scale-up)
    and audit the relative error against the exact answer IN-QUERY —
    the sample-first pattern that turns a 100 TB exploratory scan into
    a 5 TB one with a quantified error bar (the exact pass exists here
    only for the audit; production AQP skips it);
  * ``merkle_bucket_diff`` — anti-entropy replica repair: compare two
    physical copies of a table by per-bucket (count, hash-sum)
    digests — 256 hash buckets instead of a row-level join — and
    report only the divergent buckets with their row deltas. One scan
    per replica + a 256-row digest join; a row-level repair would then
    drill into ONLY the divergent buckets (here one bucket is
    perturbed by construction so the drill-down set is non-empty and
    deterministic).

Both oracle-backed. Per the registry ordering invariant they are
APPENDED after the never-attested block and enter the r06+ window.

Reference scope: the reference repo (/root/reference, RDD coursework)
has no AQP/anti-entropy surface; these extend SURVEY.md §2.9's
pipeline inventory the same way curation1-8 did.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.operators.dedup import md5_int60
from cs744_big_data_system_spark.sources.readers import load_table

__all__ = ["WORKLOADS"]


# --- Approximate query processing ------------------------------------------
_AQP_BUCKETS = 20  # keep 1 of 20 → 5% sample


def q_aqp_sample_estimate(spark, sf_dir):
    """Estimated vs exact SUM(l_extendedprice) per l_returnflag from a
    5% hash sample: estimate = sample_sum x 20 (Horvitz-Thompson for
    equal-probability sampling), error reported in integer ppm.

    The sample is md5-keyed (never ``rand()``): reproducible,
    oracle-checkable, and consistent across tables — the same 5% of
    orderkeys would be sampled in every table, so sampled JOINS stay
    meaningful (the join-synopsis property bernoulli row sampling
    loses).

    Scale shape: the sample predicate is a scan-side filter (no
    shuffle until the 3-group aggregation); the exact pass exists only
    for the in-query audit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    sample = li.filter(
        F.pmod(md5_int60(F.col("l_orderkey").cast("string")), F.lit(_AQP_BUCKETS)) == 0
    )
    est = sample.groupBy("l_returnflag").agg(
        (F.sum("cents") * F.lit(_AQP_BUCKETS)).alias("est_cents"),
        F.count(F.lit(1)).alias("n_sampled"),
    )
    exact = li.groupBy("l_returnflag").agg(F.sum("cents").alias("exact_cents"))
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_sampled").cast("long").alias("n_sampled"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("exact_cents").cast("long").alias("exact_cents"),
            F.floor(
                F.abs(F.col("est_cents") - F.col("exact_cents")).cast("double")
                / F.col("exact_cents").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rel_err_ppm"),
        )
    )


SQL_AQP_SAMPLE_ESTIMATE = f"""
WITH li AS (
  SELECT l_orderkey, l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
), est AS (
  SELECT l_returnflag,
         CAST(sum(cents) * {_AQP_BUCKETS} AS BIGINT) AS est_cents,
         CAST(count(*) AS BIGINT) AS n_sampled
  FROM li
  WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
        % {_AQP_BUCKETS} = 0
  GROUP BY l_returnflag
), exact AS (
  SELECT l_returnflag, CAST(sum(cents) AS BIGINT) AS exact_cents
  FROM li GROUP BY l_returnflag
)
SELECT e.l_returnflag, e.n_sampled, e.est_cents, x.exact_cents,
       CAST(floor(abs(e.est_cents - x.exact_cents) * 1.0 / x.exact_cents * 1e6
            + 0.5) AS BIGINT) AS rel_err_ppm
FROM est e JOIN exact x USING (l_returnflag)
"""


# --- Merkle-style bucket diff (anti-entropy repair) --------------------------
_MERKLE_BUCKETS = 256


def q_merkle_bucket_diff(spark, sf_dir):
    """Replica divergence localization: replica A = the orders table;
    replica B = the same table with a deterministic corruption (every
    order divisible by 997 gets its price shifted — a bit-rot stand-in).
    Each replica collapses to 256 bucket digests (bucket =
    md5(orderkey) % 256; digest = count + hash-sum over row content);
    the diff join touches 256 rows per side and reports ONLY divergent
    buckets.

    Scale shape: one scan per replica into a combinable 256-group
    aggregation — the row-level repair pass would then re-scan only
    `divergent/256` of the data. This is the Dynamo/Cassandra
    anti-entropy shape, relational."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    replica_b = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 997 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def digests(df, side):
        row_h = F.pmod(
            md5_int60(
                F.concat(
                    F.col("o_orderkey").cast("string"), F.lit("|"), F.col("cents").cast("string")
                )
            ),
            F.lit(1000000000000),
        )
        return (
            df.groupBy(
                F.pmod(md5_int60(F.col("o_orderkey").cast("string")), F.lit(_MERKLE_BUCKETS)).alias(
                    "bucket"
                )
            )
            .agg(
                F.count(F.lit(1)).alias(f"n_{side}"),
                F.sum(row_h).alias(f"h_{side}"),
            )
        )
    a = digests(orders, "a")
    b = digests(replica_b, "b")
    return (
        a.join(b, "bucket", "full_outer")
        .filter(
            (F.coalesce(F.col("n_a"), F.lit(0)) != F.coalesce(F.col("n_b"), F.lit(0)))
            | (F.coalesce(F.col("h_a"), F.lit(0)) != F.coalesce(F.col("h_b"), F.lit(0)))
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
            (F.coalesce(F.col("h_a"), F.lit(0)) - F.coalesce(F.col("h_b"), F.lit(0)))
            .cast("long")
            .alias("digest_delta"),
        )
    )


SQL_MERKLE_BUCKET_DIFF = f"""
WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), b_rows AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 997 = 0 THEN cents + 1 ELSE cents END AS cents
  FROM o
), da AS (
  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_MERKLE_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS n_a,
         CAST(sum(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
              CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000000000)
              AS BIGINT) AS h_a
  FROM o GROUP BY 1
), db AS (
  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_MERKLE_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
              CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000000000)
              AS BIGINT) AS h_b
  FROM b_rows GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
       CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
       CAST(coalesce(h_a, 0) - coalesce(h_b, 0) AS BIGINT) AS digest_delta
FROM da FULL OUTER JOIN db USING (bucket)
WHERE coalesce(n_a, 0) <> coalesce(n_b, 0) OR coalesce(h_a, 0) <> coalesce(h_b, 0)
"""


WORKLOADS = {
    "aqp_sample_estimate": (q_aqp_sample_estimate, SQL_AQP_SAMPLE_ESTIMATE),
    "merkle_bucket_diff": (q_merkle_bucket_diff, SQL_MERKLE_BUCKET_DIFF),
}
