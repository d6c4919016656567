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


def last_touch_attribution(
    events: DataFrame, attr_window_s: int = 7 * 86400
) -> DataFrame:
    """Streaming last-touch attribution: per-user group state holds the
    single latest touch (click/view); each arriving purchase is
    credited against it immediately — the online sibling of the batch
    window query (workloads/pipeline_ext.q_attribution_last_touch),
    and the classic example of state the built-in windowed aggregates
    cannot express (the state is "latest preceding row", not a count).

    Expects columns (event_id, ts_us, user_id, event_type) with
    ts_us = unix_micros(ts). State per user is ONE (id, ts, type)
    triple — constant bytes per user regardless of stream length.
    Within a micro-batch rows are walked in (ts_us, event_id) order;
    with time-ordered waves the concatenated walk equals the batch
    query's global per-user ordering, so replay output hash-matches
    the batch SQL oracle.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            tid, tts, ttyp = state.get
        else:
            tid, tts, ttyp = -1, -1, ""
        out = {
            "purchase_event_id": [],
            "user_id": [],
            "touch_event_id": [],
            "touch_type": [],
            "latency_s": [],
        }
        pdf = pd.concat(list(pdf_iter))
        for r in pdf.sort_values(["ts_us", "event_id"]).itertuples():
            if r.event_type == "purchase":
                if tid >= 0 and r.ts_us - tts <= attr_window_s * 1_000_000:
                    out["purchase_event_id"].append(r.event_id)
                    out["user_id"].append(key[0])
                    out["touch_event_id"].append(tid)
                    out["touch_type"].append(ttyp)
                    out["latency_s"].append((r.ts_us - tts) // 1_000_000)
            elif r.event_type in ("click", "view"):
                tid, tts, ttyp = r.event_id, r.ts_us, r.event_type
        state.update((int(tid), int(tts), ttyp))
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "purchase_event_id long, user_id long, touch_event_id long, "
            "touch_type string, latency_s long"
        ),
        stateStructType="tid long, tts long, ttyp string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cdc_current_state(events: DataFrame) -> DataFrame:
    """Streaming CDC apply: per-key group state is the CURRENT row —
    (last ts, event id, op, value) plus op counters — updated as
    change events arrive and re-emitted every micro-batch the key
    appears in (output mode `update`). The online sibling of
    workloads/curation.q_cdc_apply: with time-ordered waves the last
    emission per key equals the batch max-of-struct pick, so the
    replay hash-matches the SAME DuckDB oracle (SQL_CDC_APPLY).

    Expects columns (user_id, ts_us, event_id, op, value); state is
    constant bytes per key regardless of stream length.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            ts, eid, op, val, n, d = state.get
        else:
            ts, eid, op, val, n, d = -1, -1, "", 0.0, 0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for r in pdf.itertuples():
                # Micro-batch rows arrive unordered relative to state:
                # apply only changes NEWER than the current row (the
                # batch oracle's (ts, event_id) max pick).
                if (r.ts_us, r.event_id) > (ts, eid):
                    ts, eid, op, val = int(r.ts_us), int(r.event_id), r.op, float(r.value)
            n += len(pdf)
            d += int((pdf["op"] == "D").sum())
        state.update((ts, eid, op, val, n, d))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_ts": [ts],
                "last_op": [op],
                "value": [val],
                "n_ops": [n],
                "n_deletes": [d],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, last_ts long, last_op string, value double, "
            "n_ops long, n_deletes long"
        ),
        stateStructType=(
            "ts long, eid long, op string, val double, n long, d long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_windows_timeout(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom session windows with EVENT-TIME TIMEOUT eviction — the
    state-API pattern the built-in session_window can't customize:
    per-user state is the OPEN session (start, end, count); in-batch
    gaps close sessions inline, and the trailing open session closes
    when the WATERMARK passes end + gap (GroupStateTimeout
    .EventTimeTimeout + state.setTimeoutTimestamp → the function is
    re-invoked with hasTimedOut, emits the session, removes the
    state). Emits CLOSED sessions only, exactly once each; state is
    one (start, end, n) triple per user — constant bytes per key — and
    timed-out keys are EVICTED, which is what bounds state on an
    unbounded stream.

    Expects (user_id, ts, ts_us, event_id) with a watermark already
    set on ``ts``. With strictly time-ordered waves the emissions
    equal the batch gaps-and-islands sessionize, so the replay
    hash-checks against the same oracle.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdf_iter, state: GroupState):
        out = {
            "user_id": [],
            "session_start_us": [],
            "session_end_us": [],
            "n_events": [],
        }

        def emit(st, en, n):
            out["user_id"].append(key[0])
            out["session_start_us"].append(st)
            out["session_end_us"].append(en)
            out["n_events"].append(n)

        if state.hasTimedOut:
            st, en, n = state.get
            emit(st, en, n)
            state.remove()
            yield pd.DataFrame(out)
            return
        if state.exists:
            st, en, n = state.get
        else:
            st, en, n = -1, -1, 0
        pdf = pd.concat(list(pdf_iter))
        for r in pdf.sort_values(["ts_us", "event_id"]).itertuples():
            if st < 0:
                st, en, n = int(r.ts_us), int(r.ts_us), 1
            elif r.ts_us - en > gap_s * 1_000_000:
                emit(st, en, n)
                st, en, n = int(r.ts_us), int(r.ts_us), 1
            else:
                en, n = int(r.ts_us), n + 1
        state.update((st, en, n))
        # close when the watermark passes the inactivity horizon
        state.setTimeoutTimestamp(en // 1000 + gap_s * 1000)
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session_start_us long, session_end_us long, n_events long"
        ),
        stateStructType="st long, en long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
