"""MERGE / upsert and slowly-changing-dimension operators (SURVEY.md
§2.9 warehouse family — absent from the reference, which has no
mutable-table story at all; re-expressed as the standard copy-on-write
full-outer-join rewrite every lakehouse engine (Delta/Iceberg/Hudi
MERGE INTO) lowers to).

Scale design:
  * MERGE is ONE full-outer shuffle join on the key — at 100 TB this
    is the canonical copy-on-write merge; when the change-set is small
    relative to the target (the common CDC case) Spark's AQE converts
    the join to broadcast automatically, and a partitioned target
    prunes untouched partitions before the join ever runs;
  * SCD-2 history build is a single window pass per business key
    (change-detection via lag, interval close via lead) — one shuffle
    on the key, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    matched_set: dict[str, Column],
    not_matched_insert: dict[str, Column],
    action_col: str = "merge_action",
    validate: bool = True,
) -> DataFrame:
    """SQL ``MERGE INTO`` semantics via one full-outer join.

    Output = every target column, where
      * rows matched by source get ``matched_set``'s expressions
        (WHEN MATCHED THEN UPDATE SET ...),
      * source rows with no target match become inserts built from
        ``not_matched_insert`` (WHEN NOT MATCHED THEN INSERT ...),
      * unmatched target rows pass through unchanged,
    plus an ``action_col`` tag ∈ {updated, inserted, kept} so callers
    (and tests) can audit which MERGE branch fired per row.

    Expressions in both dicts refer to columns as ``t.<col>`` /
    ``s.<col>`` (the join sides are aliased).

    Key contract (SQL MERGE cardinality rules): the source must have at
    most one row per key and no NULL keys. ``validate=True`` (default)
    enforces both with one tiny aggregate over the source — the same
    error a warehouse MERGE raises at runtime; with ``validate=False``
    the check is skipped and the degenerate inputs behave as the join
    dictates: duplicate source keys fan their matched target row out
    into multiple updated rows, and NULL-key source rows never match
    anything (NULL != NULL) so each becomes an ``inserted`` row with a
    NULL key.
    """
    if validate:
        stats = source.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(key).alias("n_keys"),
            F.countDistinct(key).alias("n_distinct"),
        ).first()
        if stats["n_keys"] != stats["n_distinct"]:
            raise ValueError(
                "merge_upsert: source has duplicate merge keys "
                f"({stats['n_keys']} non-null rows, {stats['n_distinct']} distinct) — "
                "SQL MERGE cardinality violation"
            )
        if stats["n_rows"] != stats["n_keys"]:
            raise ValueError(
                f"merge_upsert: source has {stats['n_rows'] - stats['n_keys']} NULL merge "
                "key(s); pass validate=False to insert them unmatched"
            )
    t, s = target.alias("t"), source.alias("s")
    tk, sk = F.col(f"t.{key}"), F.col(f"s.{key}")
    joined = t.join(s, tk == sk, "full_outer")

    is_matched = tk.isNotNull() & sk.isNotNull()
    is_insert = tk.isNull()

    out_cols = []
    for c in target.columns:
        if c == key:
            expr = F.coalesce(tk, sk)
        else:
            branches = F.col(f"t.{c}")
            if c in matched_set:
                branches = F.when(is_matched, matched_set[c]).otherwise(branches)
            if c in not_matched_insert:
                branches = F.when(is_insert, not_matched_insert[c]).otherwise(branches)
            expr = branches
        out_cols.append(expr.alias(c))

    action = (
        F.when(is_matched, F.lit("updated"))
        .when(is_insert, F.lit("inserted"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(*out_cols, action.alias(action_col))


def scd2_history(
    changes: DataFrame,
    key: str,
    tracked: str,
    order_by: list[str],
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log.

    ``changes`` holds one row per observation (key, tracked attribute,
    ordering columns — e.g. customer orders carrying a status). Output:
    one row per (key, run of equal ``tracked`` values) with
    ``valid_from`` / ``valid_to`` date-string intervals and an
    ``is_current`` flag — the standard warehouse history table.

    Change detection = ``tracked != lag(tracked)`` over the key's
    ordered window; interval close = ``lead(valid_from)``. Both windows
    share one partitioning, so the whole build is a single shuffle on
    the business key.
    """
    from pyspark.sql import Window

    # Both windows use the SAME (unique) ordering — ties on the date
    # alone (two changes observed the same day) would otherwise make
    # lead() nondeterministic. order_by must therefore end in a
    # tie-breaking unique column (e.g. the change-log's event key).
    w = Window.partitionBy(key).orderBy(*order_by)
    first_date = order_by[0]
    changed = changes.withColumn("_prev", F.lag(tracked).over(w)).filter(
        F.col("_prev").isNull() | (F.col(tracked) != F.col("_prev"))
    )
    nxt = F.lead(first_date).over(w)  # re-applied over the filtered rows
    return changed.select(
        key,
        tracked,
        F.date_format(first_date, "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit(open_end)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: list[str] | None = None,
    class_col: str = "diff_class",
) -> DataFrame:
    """Snapshot diff: classify every key across two table versions as
    ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (present in both, any compared column differs, null-safely), or
    ``unchanged`` — the audit primitive behind CDC validation, backfill
    verification, and replication drift checks.

    One full-outer shuffle join on the key (AQE broadcasts the smaller
    snapshot); the comparison is a null-safe equality conjunction over
    ``compare`` (default: every shared non-key column). Output: key +
    each compared column's old/new values (``<col>_old`` / ``<col>_new``)
    + the class — project before writing if only counts are needed.
    """
    if compare is None:
        compare = [c for c in old.columns if c != key and c in new.columns]
    o, n = old.alias("o"), new.alias("n")
    ok, nk = F.col(f"o.{key}"), F.col(f"n.{key}")
    joined = o.join(n, ok == nk, "full_outer")

    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    cls = (
        F.when(ok.isNull(), F.lit("added"))
        .when(nk.isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    cols = [F.coalesce(ok, nk).alias(key)]
    for c in compare:
        cols.append(F.col(f"o.{c}").alias(f"{c}_old"))
        cols.append(F.col(f"n.{c}").alias(f"{c}_new"))
    return joined.select(*cols, cls.alias(class_col))
