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
    import numpy as np  # noqa: PLC0415 — worker-side import
    import pandas as pd  # noqa: PLC0415 — worker-side import

    window_us = attr_window_s * 1_000_000

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            tid, tts, ttyp = state.get
        else:
            tid, tts, ttyp = -1, -1, ""
        # Vectorized "latest preceding touch": running-max of touch row
        # positions (maximum.accumulate) gives each purchase its last
        # in-batch touch; position -1 falls back to the carried state.
        pdf = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        etype = pdf["event_type"].to_numpy()
        eid = pdf["event_id"].to_numpy(np.int64)
        ts = pdf["ts_us"].to_numpy(np.int64)
        is_touch = (etype == "click") | (etype == "view")
        last_touch_pos = np.maximum.accumulate(
            np.where(is_touch, np.arange(len(pdf)), -1)
        )
        pi = np.flatnonzero(etype == "purchase")
        li = last_touch_pos[pi]
        safe = np.maximum(li, 0)
        t_id = np.where(li >= 0, eid[safe], tid)
        t_ts = np.where(li >= 0, ts[safe], tts)
        t_typ = np.where(li >= 0, etype[safe], ttyp)
        ok = (t_id >= 0) & (ts[pi] - t_ts <= window_us)
        if is_touch.any():
            last = int(last_touch_pos[-1])
            tid, tts, ttyp = int(eid[last]), int(ts[last]), str(etype[last])
        state.update((int(tid), int(tts), ttyp))
        yield pd.DataFrame(
            {
                "purchase_event_id": eid[pi][ok],
                "user_id": np.full(int(ok.sum()), key[0], dtype=np.int64),
                "touch_event_id": t_id[ok],
                "touch_type": t_typ[ok],
                "latency_s": (ts[pi][ok] - t_ts[ok]) // 1_000_000,
            }
        )

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
    import numpy as np  # noqa: PLC0415 — worker-side import
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            ts, eid, op, val, n, d = state.get
        else:
            ts, eid, op, val, n, d = -1, -1, "", 0.0, 0, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # Micro-batch rows arrive unordered relative to state: the
            # surviving row is the (ts, event_id)-lexicographic max of
            # the chunk vs the carried state (the batch oracle's max
            # pick) — one lexsort, no per-row walk.
            t = pdf["ts_us"].to_numpy(np.int64)
            e = pdf["event_id"].to_numpy(np.int64)
            i = int(np.lexsort((e, t))[-1])
            if (int(t[i]), int(e[i])) > (ts, eid):
                ts, eid = int(t[i]), int(e[i])
                op, val = pdf["op"].iat[i], float(pdf["value"].iat[i])
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
    import numpy as np  # noqa: PLC0415 — worker-side import
    import pandas as pd  # noqa: PLC0415 — worker-side import

    gap_us = gap_s * 1_000_000

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            st, en, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [st],
                    "session_end_us": [en],
                    "n_events": [n],
                }
            )
            return
        # Vectorized gaps-and-islands over the batch (the r06 bench's
        # hot path was a per-row itertuples loop + per-session list
        # appends — ~100k events / ~95k sessions per replay at sf0.1).
        # Session stats depend only on the SORTED event times, so one
        # np.sort + one diff>gap scan finds every boundary.
        chunks = [c["ts_us"].to_numpy(np.int64) for c in pdf_iter]
        ts = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype=np.int64)
        )
        if not ts.size:  # defensive: no data and not timed out
            if state.exists:
                _, en0, _ = state.get
                state.setTimeoutTimestamp(en0 // 1000 + gap_s * 1000)
            return
        starts_idx = np.flatnonzero(
            np.concatenate(([True], ts[1:] - ts[:-1] > gap_us))
        )
        seg_start = ts[starts_idx]
        seg_end = ts[np.append(starts_idx[1:] - 1, len(ts) - 1)]
        seg_n = np.diff(np.append(starts_idx, len(ts))).astype(np.int64)
        if state.exists:
            pst, pen, pn = state.get
            if ts[0] - pen > gap_us:
                # prior open session closes before this batch's first event
                seg_start = np.insert(seg_start, 0, pst)
                seg_end = np.insert(seg_end, 0, pen)
                seg_n = np.insert(seg_n, 0, pn)
            else:
                # first segment continues the prior open session
                # (waves are time-ordered, so ts[0] >= pen)
                seg_start[0] = pst
                seg_n[0] += pn
        # every segment but the last is closed by an in-batch gap; the
        # last stays open in state until a later batch or the timeout
        st, en, n = int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1])
        state.update((st, en, n))
        # close when the watermark passes the inactivity horizon
        state.setTimeoutTimestamp(en // 1000 + gap_s * 1000)
        closed = len(seg_start) - 1
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.full(closed, key[0], dtype=np.int64),
                    "session_start_us": seg_start[:closed],
                    "session_end_us": seg_end[:closed],
                    "n_events": seg_n[:closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session_start_us long, session_end_us long, n_events long"
        ),
        stateStructType="st long, en long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
