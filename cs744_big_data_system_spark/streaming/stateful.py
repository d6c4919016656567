"""Custom stateful streaming operators via applyInPandasWithState.

PySpark has no flatMapGroupsWithState (JVM-only); the supported
arbitrary-state API is applyInPandasWithState (SURVEY.md §7 risk 6):
state lives in the state store per group, the user function sees
Arrow-batched pandas frames — state size is bounded by the number of
groups, not events, so this scales to any stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running per-key event count maintained in explicit group state —
    the minimal custom stateful operator (an incremental
    `groupBy(key).count()` written against the raw state API, the
    pattern any bespoke aggregator follows).

    Emits (key, n_events) with the updated cumulative count every
    micro-batch in which the key appears (output mode `update`).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
