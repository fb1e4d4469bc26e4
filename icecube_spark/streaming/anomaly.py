"""Custom stateful streaming operator #2: running z-score anomaly
detection with applyInPandasWithState (SURVEY §2 C39s).

Per event_type the state is the exact integer moment triple
(n, sum_q, sumsq_q) over values quantized to 1e-3; an event is
anomalous when it sits more than 3 running standard deviations from
the running mean of all PRIOR events of its type. Integer state makes
the streaming operator and its batch twin (cumulative windows over
the same quantized ints) agree exactly — the flagged event set is
identical, which the test asserts.

Scale: state is 3 integers per event_type — constant memory however
long the stream runs; output is anomalies only (append mode).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "event_type string, event_id long, value double, "
    "n_prior long, mean_prior double, std_prior double"
)
STATE_SCHEMA = "n long, sq long, sq2 long"

QUANT = 1000.0
SIGMAS = 3.0


def _detect_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    chunks = list(pdfs)
    if not chunks:
        return
    rows = pd.concat(chunks).sort_values(["ts", "event_id"])
    n, sq, sq2 = state.get if state.exists else (0, 0, 0)
    out: list[tuple[int, float, int, float, float]] = []
    for event_id, value in zip(rows["event_id"], rows["value"]):
        q = int(np.floor(value * QUANT))
        if n >= 2:
            # float64 ops in the same order as the batch twin
            mean = np.float64(sq) / np.float64(n)
            var = np.float64(sq2) / np.float64(n) - mean * mean
            std = np.sqrt(max(var, 0.0))
            v = np.float64(q) / np.float64(QUANT)
            m = mean / np.float64(QUANT)
            s = std / np.float64(QUANT)
            if np.abs(v - m) > SIGMAS * s:
                out.append((int(event_id), float(value), n, float(m), float(s)))
        n, sq, sq2 = n + 1, sq + q, sq2 + q * q
    state.update((n, sq, sq2))
    if out:
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(out),
                "event_id": [o[0] for o in out],
                "value": [o[1] for o in out],
                "n_prior": [o[2] for o in out],
                "mean_prior": [o[3] for o in out],
                "std_prior": [o[4] for o in out],
            }
        )


def streaming_anomaly(events_stream: DataFrame) -> DataFrame:
    """events stream (ts, event_id, event_type, value) → anomalies."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _detect_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_anomaly(events: DataFrame) -> DataFrame:
    """Batch twin: cumulative prior-moment windows over the same
    quantized integers — must flag the identical event set."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    q = F.floor(F.col("value") * F.lit(QUANT))
    base = events.select(
        "event_type",
        "event_id",
        "value",
        "ts",
        q.alias("q"),
    )
    cum = base.select(
        "event_type",
        "event_id",
        "value",
        F.count("q").over(w).alias("n"),
        F.sum("q").over(w).alias("sq"),
        F.sum(F.col("q") * F.col("q")).over(w).alias("sq2"),
        "q",
    ).where(F.col("n") >= 2)
    mean = F.col("sq").cast("double") / F.col("n").cast("double")
    var = F.col("sq2").cast("double") / F.col("n").cast("double") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    v = F.col("q").cast("double") / F.lit(QUANT)
    m = mean / F.lit(QUANT)
    s = std / F.lit(QUANT)
    return (
        cum.where(F.abs(v - m) > F.lit(SIGMAS) * s)
        .select(
            "event_type",
            "event_id",
            "value",
            F.col("n").alias("n_prior"),
            m.alias("mean_prior"),
            s.alias("std_prior"),
        )
    )
