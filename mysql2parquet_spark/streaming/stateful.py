"""Custom stateful streaming operators via applyInPandasWithState (B35).

This is the engine's escape hatch for stateful semantics the built-in
operators (windowed aggs, dropDuplicates, stream joins) cannot express —
per-key accumulators, custom session logic, CDC-style merge state. State
is partitioned by the grouping key and bounded by timeouts; at scale the
state store shards across executors with the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches and
    emit the updated running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals — custom state kept across
    micro-batches. Equivalent batch face: groupBy(user).count/sum."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONIZE_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("end_us", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _session_pdf(user_id, sessions):
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [
                pd.Timestamp(s, unit="us") for s, _e, _n in sessions
            ],
            "session_end": [pd.Timestamp(e, unit="us") for _s, e, _n in sessions],
            "n_events": [n for _s, _e, n in sessions],
        }
    )


def _make_sessionizer(gap_us: int):
    """Closure over the gap so applyInPandasWithState gets a 2-arg-free
    update function (cloudpickle ships the closure to executors)."""

    def update(key, pdfs, state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            # watermark passed end+gap with no new events: the open
            # session is final. Emit it and drop the state.
            start, end, n = state.get
            state.remove()
            yield _session_pdf(key[0], [(start, end, n)])
            return

        parts = [
            pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            for pdf in pdfs
        ]
        ts = np.sort(np.concatenate(parts)) if parts else np.empty(0, "int64")
        start, end, n = state.get if state.exists else (None, None, 0)

        closed: list[tuple[int, int, int]] = []
        if ts.size:
            # segment the batch at gaps; every segment but the last is a
            # finished session ALREADY — emit in this batch, don't wait
            # for the timeout. Boundaries are HALF-OPEN to match
            # F.session_window: an event exactly gap after its
            # predecessor starts a NEW session (>=, not >).
            cuts = np.flatnonzero(np.diff(ts) >= gap_us) + 1
            segments = np.split(ts, cuts)
            first = segments[0]
            if start is not None and first[0] - end < gap_us:
                # min/max merge, not assignment: a within-watermark
                # late event may SORT BEFORE the open session's end —
                # the session's bounds only ever widen.
                start = min(start, int(first[0]))
                end = max(end, int(first[-1]))
                n += len(first)
            else:
                if start is not None:
                    closed.append((start, end, n))
                start, end, n = int(first[0]), int(first[-1]), len(first)
            for seg in segments[1:]:
                closed.append((start, end, n))
                start, end, n = int(seg[0]), int(seg[-1]), len(seg)

        state.update((start, end, n))
        # close the open session when event time passes end+gap; the
        # max() keeps the timeout legal (must exceed the watermark) for
        # sessions already older than the watermark when they arrive.
        timeout_ms = max(
            (end + gap_us) // 1000 + 1, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _session_pdf(key[0], closed)

    return update


def sessionize_with_timeout(
    events: DataFrame, *, gap: int = 30, watermark: str = "10 seconds"
) -> DataFrame:
    """Gap-based sessionization with EVENT-TIME TIMEOUT finalization —
    the stateful shape ``F.session_window`` cannot express: emit each
    session EXACTLY ONCE, as soon as it is provably over (either a
    bigger-than-``gap`` silence inside a batch, or the watermark passing
    ``session_end + gap`` between batches), never re-emitting or
    updating it afterward. Downstream consumers get append-only
    finished sessions — a billing/export-grade contract.

    ``gap`` is seconds of silence that ends a session. State per key is
    three longs; the state store shards on ``user_id`` with the shuffle,
    and timeouts bound its lifetime, so state size tracks ACTIVE keys
    only — the at-scale requirement for an unbounded stream.

    Batch equivalence is pinned in tests against ``session_window``:
    closed sessions match the batch sessionization exactly; the final
    still-open session per key stays in state (emitted when a later
    batch advances the watermark past its end).
    """
    gap_us = int(gap) * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_us),
            outputStructType=SESSIONIZE_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
