"""Grouped-map and cogrouped-map Pandas operators — the two
Arrow-batched UDF surfaces not covered elsewhere in the engine
(grouped-AGG pandas_udf → workloads/relational_ext.udaf_weighted_mean;
mapInPandas → operators/multimodal; mapInArrow → ml/superstep;
applyInPandasWithState → streaming/stateful). Together these complete
the Spark Pandas-UDF API family (SURVEY.md §2.9 UDF surface).

Both operators here are deliberately chosen so their results are
closed-form deterministic — the grouped-map one mirrors SQL's
regr_slope/regr_intercept and the cogrouped one mirrors a window-based
as-of match — so even these Python-side paths stay oracle-checkable.

Scale note: applyInPandas shuffles each group to one task and holds it
in memory — correct for per-key model fitting (groups = bounded
per-key slices), wrong for unbounded groups; both operators key on
bounded groups (event_type ≈ 5 values but each slice is a fraction of
the input; per-user for the cogroup). The hot paths elsewhere in the
engine stay native-Column; these exist where per-group imperative math
is the genuine semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_group_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression y = a + b·x via grouped-map
    applyInPandas: each group's slice arrives as ONE pandas DataFrame
    (Arrow-transferred), the closed-form OLS runs vectorized, one row
    returns per group. Mirrors SQL regr_slope/regr_intercept/regr_r2,
    which is exactly what the oracle uses."""
    import pandas as pd

    gtype = dict(df.dtypes)[group_col]
    out_schema = (
        f"{group_col} {gtype}, n_obs long, slope double, intercept double, r2 double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        n = len(x)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        syy = ((y - my) ** 2).sum()
        slope = sxy / sxx if sxx > 0 else np.nan
        intercept = my - slope * mx if sxx > 0 else np.nan
        r2 = (sxy * sxy) / (sxx * syy) if sxx > 0 and syy > 0 else np.nan
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_obs": [n],
                "slope": [round(slope, 6)],
                "intercept": [round(intercept, 6)],
                "r2": [round(r2, 6)],
            }
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(
        fit, schema=out_schema
    )


def cogrouped_asof_match(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    max_gap_s: int = 1800,
) -> DataFrame:
    """Per-key as-of match via cogroup().applyInPandas: for every left
    row, the LATEST right row of the same key with right.ts ≤ left.ts
    and within ``max_gap_s`` seconds. Both sides' per-key slices arrive
    together as two pandas frames (the cogrouped-map surface); the
    match is a vectorized searchsorted — the pandas merge_asof
    algorithm by hand, so no pandas version drift affects results.

    Semantically identical to operators/relational.asof_join's
    window-based plan; this exists to exercise (and test) the cogroup
    API path with an oracle-checkable deterministic result.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, {left_id} long, {right_id} long, gap_s long"
    )

    def match(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(l) == 0:
            return pd.DataFrame(columns=[key_col, left_id, right_id, "gap_s"])
        def ns(series: pd.Series) -> "np.ndarray":
            # Arrow may hand timestamps over as datetime64[us] or [ns]
            # depending on version — normalize to int64 nanoseconds.
            return (
                pd.to_datetime(series)
                .to_numpy(dtype="datetime64[ns]")
                .astype("int64")
            )

        l = l.sort_values([ts_col, left_id]).reset_index(drop=True)
        lt = ns(l[ts_col])
        if len(r) == 0:
            ridx = np.full(len(l), -1)
            rt = np.empty(0, dtype="int64")
            rid = np.empty(0, dtype="int64")
        else:
            r = r.sort_values([ts_col, right_id]).reset_index(drop=True)
            rt = ns(r[ts_col])
            rid = r[right_id].to_numpy()
            # index of the last right ts <= left ts
            ridx = np.searchsorted(rt, lt, side="right") - 1
        if len(rt) == 0:
            return pd.DataFrame(columns=[key_col, left_id, right_id, "gap_s"])
        # fully vectorized: filter on the EXACT gap (ns) — flooring
        # first would admit gaps up to max_gap_s+1s and diverge from
        # the oracle's microsecond compare — then report floor seconds.
        valid = ridx >= 0
        gap_ns = np.where(valid, lt - rt[np.clip(ridx, 0, None)], np.int64(1 << 62))
        keep = valid & (gap_ns <= max_gap_s * 1_000_000_000)
        return pd.DataFrame(
            {
                key_col: np.full(int(keep.sum()), l[key_col].iloc[0], dtype="int64"),
                left_id: l[left_id].to_numpy()[keep],
                right_id: rid[ridx[keep]],
                "gap_s": gap_ns[keep] // 1_000_000_000,
            }
        )

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(match, schema=out_schema)
    )


def per_group_arrow_stats(documents, group_col: str = "lang"):
    """Per-group document statistics through ``applyInArrow`` (Spark 4
    grouped-map over RAW pyarrow RecordBatches — the zero-pandas,
    zero-copy sibling of applyInPandas; the last Arrow UDF surface the
    engine exercises). All math runs in pyarrow.compute kernels, so
    the batch never materializes Python objects.

    Returns (group, n_docs, total_chars, mean_chars, max_chars) with
    the mean rounded to 6 dp — exactly mirrorable by plain SQL
    aggregates, so the API demo stays hash-checked.
    """
    import pyarrow as pa

    def stats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: PLC0415 — worker-side

        chars = batch.column("n_chars")
        n = batch.num_rows
        total = pc.sum(chars).as_py() or 0
        return pa.table(
            {
                "group": [batch.column(0)[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "total_chars": pa.array([int(total)], pa.int64()),
                "mean_chars": pa.array(
                    [round(total / n, 6) if n else None], pa.float64()
                ),
                "max_chars": pa.array([pc.max(chars).as_py()], pa.int64()),
            }
        )

    return (
        documents.select(F.col(group_col).alias("group"), "n_chars")
        .groupBy("group")
        .applyInArrow(
            stats,
            schema=(
                "group string, n_docs long, total_chars long, "
                "mean_chars double, max_chars long"
            ),
        )
    )


def cogrouped_arrow_order_fill(orders, lineitem):
    """Per-order fill reconciliation through ``cogroup().applyInArrow``
    — the LAST cell of the Pandas/Arrow UDF matrix (grouped-map and
    cogroup × pandas and Arrow; map/superstep and stateful streaming
    cover the rest): both sides of each order-key cogroup arrive as
    raw pyarrow Tables and all math runs in pyarrow.compute kernels.

    Emits (o_orderkey, o_totalprice, n_lines, sum_qty, net_revenue)
    per order that HAS lines — a plain join+agg relationally, which is
    exactly why the API demo stays hash-checked against a SQL oracle.
    Scale note: one shuffle per side keyed by the cogroup key; a
    group's two slices must fit one task (bounded here by lines per
    order, ≤ 7 in TPC-H).
    """
    import pyarrow as pa

    def fill(left: pa.Table, right: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: PLC0415 — worker-side

        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.float64()),
                    "net_revenue": pa.array([], pa.float64()),
                }
            )
        rev = pc.multiply(
            right.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), right.column("l_discount")),
        )
        return pa.table(
            {
                "o_orderkey": [left.column("o_orderkey")[0].as_py()],
                "o_totalprice": pa.array(
                    [left.column("o_totalprice")[0].as_py()], pa.float64()
                ),
                "n_lines": pa.array([right.num_rows], pa.int64()),
                "sum_qty": pa.array(
                    [round(float(pc.sum(right.column("l_quantity")).as_py()), 6)],
                    pa.float64(),
                ),
                "net_revenue": pa.array(
                    [round(float(pc.sum(rev).as_py()), 6)], pa.float64()
                ),
            }
        )

    return (
        orders.select("o_orderkey", "o_totalprice")
        .groupBy("o_orderkey")
        .cogroup(
            lineitem.select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
            ).groupBy("l_orderkey")
        )
        .applyInArrow(
            fill,
            schema=(
                "o_orderkey long, o_totalprice double, n_lines long, "
                "sum_qty double, net_revenue double"
            ),
        )
    )
