"""Custom stateful streaming operator #3: ordered-funnel pattern
matching with applyInPandasWithState (SURVEY §2 C43s).

Per user the state is (stage_reached, t_first_step, t_prev_step):
walk the stage list view -> click -> purchase strictly in order
(later stages only count after all earlier ones) and emit ONE row
the moment the final stage completes — the streaming form of "alert
when a user finishes onboarding", where the batch funnel
(operators/timeseries.py funnel_conversion) is the offline report.

The batch twin applies the IDENTICAL fold per user (same function,
same sort), so the completed-funnel sets agree exactly — the pytest
asserts set equality, the same discipline as streaming/anomaly.py.

Scale: state is 3 scalars per user (constant per key); output is
completions only (append). A real deployment adds a state TTL via
GroupStateTimeout to drop abandoned funnels; with the file-drain
harness there is no wall-clock, so the twin keeps NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STAGES = ("view", "click", "purchase")

OUTPUT_SCHEMA = (
    "user_id long, t_start timestamp, t_complete timestamp, "
    "duration_s double"
)
STATE_SCHEMA = "stage integer, t0 long, tprev long"


def _advance(stage: int, t0: int, rows: pd.DataFrame):
    """Shared fold: walk rows (sorted by ts, event_id), advance the
    stage pointer on in-order stage events; yield a completion tuple
    each time the last stage closes, then reset."""
    out = []
    for ts_us, etype in zip(rows["ts_us"], rows["event_type"]):
        if etype == STAGES[stage]:
            if stage == 0:
                t0 = int(ts_us)
            stage += 1
            if stage == len(STAGES):
                out.append((t0, int(ts_us)))
                stage, t0 = 0, 0
    return stage, t0, out


def _match_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    chunks = list(pdfs)
    if not chunks:
        return
    rows = pd.concat(chunks).sort_values(["ts_us", "event_id"])
    stage, t0, _ = state.get if state.exists else (0, 0, 0)
    stage, t0, out = _advance(stage, t0, rows)
    state.update((stage, t0, 0))
    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "t_start": [pd.Timestamp(a, unit="us") for a, _ in out],
                "t_complete": [pd.Timestamp(b, unit="us") for _, b in out],
                "duration_s": [(b - a) / 1e6 for a, b in out],
            }
        )


def _with_us(df: DataFrame) -> DataFrame:
    return df.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


def streaming_funnel(events_stream: DataFrame) -> DataFrame:
    """events stream (ts, event_id, user_id, event_type) → completed
    view→click→purchase funnels, one row per completion."""
    return (
        _with_us(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _match_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_funnel(events: DataFrame) -> DataFrame:
    """Batch twin: the same fold via applyInPandas (no state — each
    user's full history is one group)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(["ts_us", "event_id"])
        _, _, out = _advance(0, 0, rows)
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": [uid] * len(out),
                "t_start": [pd.Timestamp(a, unit="us") for a, _ in out],
                "t_complete": [pd.Timestamp(b, unit="us") for _, b in out],
                "duration_s": [(b - a) / 1e6 for a, b in out],
            }
        )

    return (
        _with_us(events)
        .groupBy("user_id")
        .applyInPandas(fold, schema=OUTPUT_SCHEMA)
    )
