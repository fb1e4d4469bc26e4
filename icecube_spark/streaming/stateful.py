"""Custom stateful streaming operator: sessionization with
applyInPandasWithState (SURVEY §2 C5 extension).

The streaming twin of operators/timeseries.sessionize: per-user
session aggregation where a session closes after `gap` of silence.
State = (open session start/end/count/sum) per user; a processing-time
timeout flushes sessions the watermark has passed. This is the
pattern the reference's time-stacking would need on an unbounded
acquisition stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, end long, n long, s double"

GAP_SECONDS = 30 * 60


USE_TIMEOUT = False  # ProcessingTimeTimeout keeps availableNow drains
# spinning (the trigger waits out pending timeouts); in production use
# EventTimeTimeout + watermark. Without timeouts, sessions close via
# in-batch gaps and the final open session per key stays in state.


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    # pdfs is EMPTY for timed-out keys; pd.concat([]) raises, so guard
    chunks = list(pdfs)
    rows = pd.concat(chunks).sort_values("ts") if chunks else None

    if state.hasTimedOut:
        if state.exists:
            start, end, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
        return

    if rows is None or rows.empty:
        return

    start, end, n, s = state.get if state.exists else (None, None, 0, 0.0)
    closed: list[tuple[int, int, int, float]] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        us = int(ts.value // 1000)
        if start is None:
            start, end, n, s = us, us, 1, float(value)
        elif us - end > GAP_SECONDS * 1_000_000:
            closed.append((start, end, n, s))
            start, end, n, s = us, us, 1, float(value)
        else:
            end, n, s = us, n + 1, s + float(value)

    state.update((start, end, n, s))
    if USE_TIMEOUT:
        state.setTimeoutDuration(GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def streaming_sessionize(events_stream):
    """events stream (ts timestamp, user_id, value) → closed sessions."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if USE_TIMEOUT
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
