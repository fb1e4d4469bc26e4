"""Sessionization and windowed aggregation (SURVEY §2 C2-C4).

Session assignment is the classic lag+cumsum: one shuffle on the key,
one sort, no self-joins. Rolling aggregates keep their reductions in
decimal (see functions/parity.py) because window frames may be summed
in different associations by different engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from icecube_spark.functions.parity import davg, dsum
from icecube_spark.functions.materialize import materialize


def _us(c) -> Column:
    """Epoch microseconds of a timestamp column/name. The cast makes
    TIMESTAMP_NTZ inputs (how the harness parquet loads) acceptable to
    unix_micros; under the UTC session tz it is a pure
    reinterpretation, identical for both timestamp types."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    df: DataFrame, ts_col: str, key_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap
    from the previous event exceeds `gap_minutes`.
    Adds `session_id` (1-based per key).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    new_session = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
        > gap_s
    )
    return df.withColumn(
        "session_id",
        F.sum(F.when(new_session | F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling-window aggregate, shared verbatim by the batch queries
    and the Structured Streaming pipeline (streaming/events.py) — the
    batch result is the streaming pipeline's oracle.
    """
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .withColumn("window_start", F.col("win.start"))
        .drop("win")
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    bucket: str = "day",
) -> DataFrame:
    """C10 — OHLC bars: open/high/low/close + volume per (group,
    time-bucket). Open/close are selected by min/max over a
    (ts, value) struct — lexicographic struct ordering makes the
    tiebreak on equal timestamps deterministic (min value wins for
    open, max for close), so the result is engine-independent and
    partial-aggregable: one shuffle on the group key, map-side
    combine does most of the work at scale.
    """
    s = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    return (
        df.groupBy(*group_cols, F.date_trunc(bucket, ts_col).alias("bucket"))
        .agg(
            F.min(s)["v"].alias("open"),
            F.max(F.col(value_col)).alias("high"),
            F.min(F.col(value_col)).alias("low"),
            F.max(s)["v"].alias("close"),
            dsum(value_col).alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    tiebreak_col: str,
    bucket: str = "day",
) -> DataFrame:
    """C14 — time-weighted average per (key, bucket): each sample is
    weighted by how long it was "current" (until the next sample in the
    same bucket); the bucket's last sample carries no weight
    (TimescaleDB ``time_weight('locf')`` semantics on an
    interval-closed bucket).

    Plan: one shuffle on (key, bucket) shared by the lead() window and
    the aggregate — Catalyst reuses the exchange because the window
    partition keys equal the groupBy keys. The per-row value·gap_µs
    product (~1e14, past decimal(18,8)'s integer range and subject to
    ulp-divergent decimal(38)→double casts) is floor-quantized to a
    BIGINT instead: integer sums are association-order-free and
    engine-identical, and the quantization error is bounded by
    n_rows/Σgap_µs ≈ 1e-14 relative.
    """
    bucket_col = F.date_trunc(bucket, ts_col).alias("bucket")
    with_bucket = df.select(*key_cols, bucket_col, ts_col, tiebreak_col, value_col)
    w = Window.partitionBy(*key_cols, "bucket").orderBy(ts_col, tiebreak_col)
    gap_us = (_us(F.lead(ts_col).over(w)) - _us(ts_col)).alias("gap_us")
    g = with_bucket.select(*key_cols, "bucket", value_col, gap_us)
    weighted = F.floor(F.col(value_col) * F.col("gap_us"))
    return g.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        (F.sum(weighted) / F.sum("gap_us")).alias("twa"),
    )


def trend_stats(
    df: DataFrame,
    day_num_col: str,
    y_col: str,
    key_cols: list[str],
) -> DataFrame:
    """C15 — per-key OLS trend (slope/intercept) of a daily series via
    the closed-form normal equations. The datacube analogue of
    per-stack deformation-trend estimation over the acquisition axis
    (reference stacks layers by acquisition_date; the trend over that
    axis is the standard InSAR velocity product).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Every moment is kept in
    int64: x must be a SMALL day index (centered at the series epoch,
    not 1970 — centering keeps n·Σxy within 2^63 at any realistic
    series length) and y is floor-quantized to 1e-6 resolution, so
    both engines run identical integer arithmetic and convert the
    identical int64s to double only for the final three divisions
    (int64→double is a single correctly-rounded conversion in both).
    Decimal folds are NOT used here: Spark casts double→decimal via
    the shortest string representation, which HALF_UP-rounds ties at
    the 9th fractional digit that other engines (rounding the exact
    binary value) break downward — large-magnitude x·y products hit
    such ties routinely. One tiny shuffle on the key over the
    already-aggregated daily series.
    """
    x = F.col(day_num_col)
    yq = F.floor(F.col(y_col) * 1_000_000)
    stats = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(yq).alias("syq"),
        F.sum(x * yq).alias("sxyq"),
    )
    n, sx, sxx, syq, sxyq = (
        F.col(c) for c in ("n_days", "sx", "sxx", "syq", "sxyq")
    )
    num = n * sxyq - sx * syq
    den = n * sxx - sx * sx
    slope = num.cast("double") / den.cast("double") / 1e6
    return stats.select(
        *key_cols,
        "n_days",
        slope.alias("slope"),
        ((syq.cast("double") / 1e6 - slope * sx) / n).alias("intercept"),
    )


def rolling_window_agg(
    df: DataFrame,
    order_num_col: str,
    value_col: str,
    preceding: int,
    partition_cols: list[str] = (),
) -> DataFrame:
    """Sliding RANGE-frame mean over the `preceding`+current range of
    `order_num_col`. The frame sum stays in decimal so the result is
    association-order independent (bit-exact vs any engine).
    Adds `rolling_avg` and `n_in_window`.
    """
    base = Window.partitionBy(*partition_cols).orderBy(F.col(order_num_col))
    w = base.rangeBetween(-preceding, 0)
    dec_sum = F.sum(F.col(value_col).cast("decimal(18,8)")).over(w).cast("double")
    n = F.count(value_col).over(w)
    return df.withColumn("rolling_avg", dec_sum / n).withColumn("n_in_window", n)


def cohort_retention(df: DataFrame, ts_col: str, user_col: str) -> DataFrame:
    """C16 — cohort retention triangle: users grouped by first-active
    day, counted on each later active day (the standard product-
    analytics retention report; the datacube analogue is per-stack
    acquisition recurrence over the time axis).

    Plan: ONE wide shuffle on the user key does all the heavy work —
    the cohort-day window (min over an unordered user partition), and
    the (user, day) dedup reuse the same exchange because
    HashPartitioning(user) satisfies clustering on (user, day, ...).
    The final rollup shuffles only the deduped activity rows, with
    map-side partials bounded by |cohorts| x |days| per task.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    w = Window.partitionBy("user")
    active = (
        df.select(F.col(user_col).alias("user"), day)
        .withColumn("cohort_day", F.min("day").over(w))
        .groupBy("user", "day", "cohort_day")
        .agg(F.lit(1))
    )
    return active.groupBy(
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day"))
        .cast("bigint")
        .alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


def funnel_conversion(
    df: DataFrame, ts_col: str, user_col: str, type_col: str, steps: list[str]
) -> DataFrame:
    """C17 — ordered funnel: per user, the first time of step 1, the
    first step-2 event strictly after it, the first step-3 event
    strictly after that, ... rolled up into per-step user counts and
    conversion rates.

    Plan: chained partition-only windows over ONE user-key exchange —
    step k's min() can reference step k-1's output column because the
    windows are unordered (no frame), so Catalyst stacks Window nodes
    on the same sorted child without re-shuffling. The per-user dedup
    again reuses the exchange; only |steps| summary rows leave the
    final (tiny) aggregation.
    """
    w = Window.partitionBy("user")
    cur = df.select(
        F.col(user_col).alias("user"), F.col(ts_col).alias("ts"), F.col(type_col)
    )
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        cur = cur.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    step_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    per_user = cur.groupBy("user", *step_cols).agg(F.lit(1))
    counts = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[F.count(c).alias(f"n_step{i}") for i, c in enumerate(step_cols, 1)],
    )
    rates = [
        (F.col(f"n_step{i}").cast("double") / F.col(f"n_step{i-1}")).alias(
            f"rate_step{i}"
        )
        for i in range(2, len(steps) + 1)
    ]
    return counts.select("n_users", *[f"n_step{i}" for i in range(1, len(steps) + 1)], *rates)


def percentile_disc(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """C18 — exact discrete percentiles per key (p = value at rank
    ceil(q*n), the PERCENTILE_DISC convention), engine-portable because
    rank selection never interpolates: the answer is an actual data
    value, so float parity is trivial.

    Plan: per-key ranks come from the keyed distributed_rank (range-
    partition on (key, value, tiebreak), per-(key, partition) local
    ranks, broadcast offsets) — bit-identical to the keyed window form
    the SQL oracle uses, but a low-cardinality key (e.g. 5 event
    types) no longer serializes each key's whole corpus-grain slice
    into one task: big keys split across the 32 ranges, so the sort
    parallelizes with the cluster, not with |keys|.
    """
    from icecube_spark.operators.pipeline import distributed_rank

    ranked = distributed_rank(
        df.select(*key_cols, F.col(value_col), F.col(tiebreak_col)),
        [value_col, tiebreak_col],
        rank_col="rn",
        n_col="n",
        key_cols=list(key_cols),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col(value_col)
            )
        ).alias(f"p{round(q * 100)}")
        for q in qs
    ]
    return ranked.groupBy(*key_cols).agg(F.max("n").alias("n"), *aggs)


def calendar_lags(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """C19 — per-key daily feature rows with calendar-exact lag
    columns: lag_kd is the daily aggregate exactly k days earlier, or
    null across gaps — a row-based lag() would silently read the wrong
    day on sparse series. The standard label/feature staging step
    before training a forecaster on the cube's time axis.

    Plan: an explicit repartition(key) FIRST, so the daily aggregate
    (clustering (key, day) ⊇ key) and every ordered RANGE window reuse
    the single exchange; the lag frames [-k, -k] are pure in-partition
    sorted lookups. Daily sums fold in decimal (functions/parity.py).
    """
    from icecube_spark.functions.parity import dsum

    day_num = F.datediff(
        F.to_date(ts_col), F.lit("1970-01-01").cast("date")
    ).alias("day_num")
    daily = (
        df.repartition(F.col(key_col))
        .groupBy(F.col(key_col), day_num)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col).alias("daily_value"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("day_num")
    lag_cols = [
        F.max("daily_value").over(w.rangeBetween(-k, -k)).alias(f"lag_{k}d")
        for k in lags
    ]
    return daily.select(
        key_col, "day_num", "n_events", "daily_value", *lag_cols
    )


def running_total(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """C20 — per-key running (cumulative) total and sequence number:
    the lifetime-to-date ledger view (customer cumulative spend,
    sensor cumulative dose) every dashboard derives from the raw
    stream.

    Plan: ONE shuffle on the key, one in-partition sort; the
    cumulative frame is evaluated incrementally (no O(n^2) rescan).
    The accumulation itself happens in DECIMAL(18,8) and each row's
    prefix-sum is cast back to double — prefix sums of exact decimals
    are association-free, so any engine that sorts the frame the same
    way produces bit-identical doubles (functions/parity.py).
    `order_cols` must make the sort total (include a unique id) or
    per-row prefixes are nondeterministic.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        key_col,
        *order_cols,
        F.col(value_col),
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy(*order_cols))
        .alias("seq"),
        F.sum(F.col(value_col).cast("decimal(18,8)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """C21 — first-order Markov transition matrix of the event stream:
    count of (previous event_type -> event_type) steps within each
    key's timeline plus the row-conditional transition probability.
    The standard session-flow / product-funnel exploration query, and
    the input to any Markov-chain user model.

    Plan: one shuffle on the key for the lag window; the pair
    aggregate is a partial-agg shuffle bounded by |types|^2 rows. The
    probability is an exact INT/INT division done identically by both
    engines. `order_tiebreak` (a unique id) makes the sort total so
    ties on ts are deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    steps = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_steps")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_steps",
        (
            F.col("n_steps").cast("double")
            / F.sum("n_steps").over(w_from).cast("double")
        ).alias("p_transition"),
    )


def rolling_active_users(
    df: DataFrame, ts_col: str, user_col: str, window_days: int = 7
) -> DataFrame:
    """C22 — DAU + trailing-N-day distinct actives (the DAU/WAU
    engagement ratio): COUNT(DISTINCT user) is not decomposable over
    sliding windows, so naive rescan-per-day is O(days·corpus).

    Plan: dedup the stream to (day, user) once (one shuffle that also
    serves the DAU count); the trailing window is a bounded-fanout
    range join of that *deduped* table against the tiny day grid
    (each active-day row lands in ≤ N grid rows) followed by a
    count-distinct per day. All corpus-sized work happens before the
    fanout; the join is a broadcast of the day grid. At 100 TB the
    same shape holds — (day,user) is DAU-sized, orders of magnitude
    smaller than raw events.
    """
    # date_trunc keeps the column a TIMESTAMP — date-typed columns
    # round-trip differently through pandas in Spark vs DuckDB
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    daily = df.select(day, F.col(user_col).alias("u")).distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    grid = dau.select(F.col("day").alias("grid_day"), "dau")
    trailing = (
        daily.join(
            F.broadcast(grid),
            (F.datediff(F.col("grid_day"), F.col("day")) >= 0)
            & (F.datediff(F.col("grid_day"), F.col("day")) < window_days),
        )
        .groupBy("grid_day", "dau")
        .agg(F.countDistinct("u").alias("trailing_active"))
    )
    return trailing.select(
        F.col("grid_day").alias("day"),
        "dau",
        "trailing_active",
        (F.col("dau").cast("double") / F.col("trailing_active").cast("double")).alias(
            "stickiness"
        ),
    )


def conversion_lag_quantiles(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
) -> DataFrame:
    """C23 — time-to-convert profile: for every key whose first
    `from_type` event is followed by a `to_type` event, the lag
    between them, summarized as exact rank-selected quantiles
    (min/p50/p90/max in microseconds). The funnel-latency twin of
    funnel_conversion — "how long does signup→purchase take", not
    just "how many convert".

    Plan: the type filter pushes to the scan (two thin branches of
    one source); both aggregates shuffle on the key. Lags are integer
    microseconds and quantiles are rank-selected (value at row
    ceil(q·n)) — pure integer semantics, bit-equal across engines,
    no interpolation. The quantile ranks come from the keyless
    distributed_rank (range-partition on (lag, key), local ranks,
    broadcast offsets) — bit-identical to the global
    row_number()/count() window pair the SQL oracle uses, but
    converter-grain rows (one per converting key, which scales WITH
    the corpus) never funnel through a single task.
    """
    from icecube_spark.operators.pipeline import distributed_rank

    first_from = (
        df.where(F.col(type_col) == from_type)
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("from_ts"))
    )
    to_ev = df.where(F.col(type_col) == to_type).select(
        F.col(key_col), F.col(ts_col).alias("to_ts")
    )
    lags = (
        to_ev.join(first_from, key_col)
        .where(F.col("to_ts") >= F.col("from_ts"))
        .groupBy(key_col, "from_ts")
        .agg(F.min("to_ts").alias("first_to"))
        .select(
            F.col(key_col),
            (_us("first_to") - _us("from_ts")).alias("lag_us"),
        )
    )
    ranked = distributed_rank(
        lags.select("lag_us", key_col),
        ["lag_us", key_col],
        rank_col="rn",
        n_col="n",
    ).select("lag_us", "rn", "n")
    at = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(q * F.col("n")), F.col("lag_us"))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lag_us").alias("min_lag_us"),
        at(F.lit(0.5)).alias("p50_lag_us"),
        at(F.lit(0.9)).alias("p90_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
    )


def activity_heatmap(df: DataFrame, ts_col: str, type_col: str) -> DataFrame:
    """C24 — weekday×hour activity heat map per event type with the
    within-type share: the seasonality fingerprint behind load
    forecasting and anomaly baselines.

    Plan: map-only bucketing (weekday Monday=0, hour) then one
    partial-agg shuffle bounded by |types|·168 rows; the share
    divides by a type-total window over that tiny aggregate. Exact
    INT/INT division in both engines.
    """
    buckets = df.select(
        F.col(type_col).alias("event_type"),
        F.weekday(ts_col).alias("dow"),
        F.hour(ts_col).alias("hour"),
    )
    counts = buckets.groupBy("event_type", "dow", "hour").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "dow",
        "hour",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "share_of_type"
        ),
    )


def coverage_report(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """C25 — per-key time-axis coverage: active days, span, longest
    day gap, completeness ratio. The reference's dummy-layer
    accounting (sar_datacube.py gap rows) turned into the per-stack
    coverage report an ingestion pipeline checks before trusting a
    time series.

    Plan: dedup to (key, day) first (one shuffle that the lag window
    and the aggregate then reuse — dedup output is hash-clustered by
    the same key). All arithmetic is integer day numbers; the
    completeness ratio is one exact INT/INT double division.
    """
    day = F.datediff(F.to_date(ts_col), F.lit("1970-01-01").cast("date"))
    days = df.select(F.col(key_col), day.alias("day_num")).distinct()
    w = Window.partitionBy(key_col).orderBy("day_num")
    g = days.select(
        F.col(key_col),
        F.col("day_num"),
        (F.col("day_num") - F.lag("day_num").over(w) - 1).alias("gap_days"),
    )
    return g.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_active_days"),
        (F.max("day_num") - F.min("day_num") + 1).alias("span_days"),
        F.coalesce(F.max("gap_days"), F.lit(0)).alias("max_gap_days"),
        (
            F.count(F.lit(1)).cast("double")
            / (F.max("day_num") - F.min("day_num") + 1).cast("double")
        ).alias("completeness"),
    )


def rapid_repeats(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    tiebreak_col: str,
    max_gap_s: int = 1,
) -> DataFrame:
    """C26 — rapid-repeat detector: per key, how many events repeat
    the same type within `max_gap_s` of the previous one — the
    bot/dup-fire signal behind rate-limit and data-quality alerts.

    Plan: one shuffle on (key, type) for the lag window; the per-key
    rollup re-shuffles only (key, type) aggregate rows. Gap compare
    is integer microseconds; the ratio is exact INT/INT division.
    """
    w = Window.partitionBy(key_col, type_col).orderBy(ts_col, tiebreak_col)
    gap_us = _us(ts_col) - _us(F.lag(ts_col).over(w))
    flagged = df.select(
        F.col(key_col),
        F.col(type_col),
        F.when(gap_us < max_gap_s * 1_000_000, 1).otherwise(0).alias("is_rapid"),
    )
    per_type = flagged.groupBy(key_col, type_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_rapid").alias("n_rapid")
    )
    return (
        per_type.groupBy(key_col)
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("n_rapid").alias("n_rapid"),
        )
        .where(F.col("n_rapid") > 0)
        .select(
            key_col,
            "n_events",
            "n_rapid",
            (F.col("n_rapid").cast("double") / F.col("n_events").cast("double")).alias(
                "rapid_ratio"
            ),
        )
    )


def json_props_stats(df: DataFrame, type_col: str, props_col: str) -> DataFrame:
    """C27 — semi-structured payload promotion: parse the JSON props
    column into typed fields (from_json with an explicit schema — the
    schema-on-read path every event pipeline needs) and profile the
    extracted value per event type.

    Plan: from_json is map-only codegen (no Python); the aggregate is
    one partial-agg shuffle bounded by |types|. avg is an exact
    INT/INT double division. At 100 TB promote once and persist the
    typed column — this op is the promotion audit.
    """
    parsed = df.select(
        F.col(type_col).alias("event_type"),
        F.from_json(F.col(props_col), "k INT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k").alias("n_parsed"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("k").cast("double")).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


def value_histogram(
    df: DataFrame, type_col: str, value_col: str, width: float = 50.0
) -> DataFrame:
    """C28 — fixed-width value histogram per event type: the
    distribution fingerprint behind drift monitors and range checks.

    Plan: map-only bucketing (one floor division, codegen), a single
    partial-agg shuffle bounded by |types|·|buckets|, and an exact
    INT/INT share division. floor(value/width) is the identical
    double op in both engines.
    """
    b = F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("bucket")
    counts = df.select(F.col(type_col).alias("event_type"), b).groupBy(
        "event_type", "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "bucket",
        (F.col("bucket") * F.lit(width)).alias("bucket_low"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "share"
        ),
    )


def scd2_intervals(
    df: DataFrame, key_col: str, ts_col: str, state_col: str, tiebreak_col: str
) -> DataFrame:
    """C29 — SCD2 validity-interval compression: collapse an event
    stream into (key, state, valid_from, valid_to) rows, one per
    state RUN (consecutive repeats merge), open-ended for the current
    state. The slowly-changing-dimension history table every
    warehouse derives from a change stream.

    Plan: one shuffle on the key serves all three windows (lag to
    find run starts, then lead over run-start rows for valid_to).
    Timestamps exported as epoch µs integers so both engines compare
    exact int64s.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = df.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        _us(ts_col).alias("ts_us"),
        (
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col))
        ).alias("is_start"),
    ).where(F.col("is_start"))
    w2 = Window.partitionBy(key_col).orderBy("ts_us")
    return runs.select(
        F.col(key_col),
        "state",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
    )


def last_touch_attribution(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    tiebreak_col: str,
    target: str,
) -> DataFrame:
    """C30 — last-touch attribution: each `target` event (purchase)
    is credited to the most recent PRECEDING non-target event type of
    the same key; the report is conversions + share per channel. The
    standard marketing-attribution query, and a carry-forward
    (last IGNORE NULLS over an open frame) window pattern the engine
    must support for SCD gap-filling generally.

    Plan: one shuffle on the key; the carry is an in-partition
    incremental frame (no rescan per row). The report aggregate is
    |types|-bounded. Share is exact INT/INT division.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = df.select(
        F.col(type_col),
        F.last(
            F.when(F.col(type_col) != target, F.col(type_col)), ignorenulls=True
        )
        .over(w)
        .alias("channel"),
    )
    conv = (
        carried.where(F.col(type_col) == target)
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )
    total = Window.partitionBy()
    return conv.select(
        F.coalesce("channel", F.lit("none")).alias("channel"),
        "n_conversions",
        (
            F.col("n_conversions").cast("double")
            / F.sum("n_conversions").over(total).cast("double")
        ).alias("share"),
    )


def ewma_smooth(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    value_col: str,
    span: int = 10,
) -> DataFrame:
    """C31 — windowed EWMA smoothing of per-type daily series.

    The classic exponential smoother truncated to the last `span`
    points with alpha=1/2, so weights are exact powers of two:
    ewma_d = sum_k 2^(span-1-k) * x_{d-k} / sum_k 2^(span-1-k).
    Generalizes the reference's per-band temporal smoothing over the
    time axis (sar_datacube_metadata.py:226-255 resampling family).

    Oracle parity: the daily mean is an exact decimal fold; the
    smoothing input is quantized to integer micro-units so numerator
    and denominator are exact INT64 sums; the final division is one
    IEEE double op — bit-identical across engines.

    Scale: one shuffle to |types|x|days| rows; the lag chain is one
    in-partition sort on an aggregate that is tiny at any corpus
    size. The raw scan only feeds a partial agg (map-side combine).
    """
    daily = (
        df.groupBy(
            F.col(type_col).alias("event_type"),
            F.to_date(ts_col).alias("day"),
        )
        .agg(
            (dsum(value_col) / F.count(value_col)).alias("day_mean"),
        )
        .withColumn("q", F.floor(F.col("day_mean") * F.lit(1000000.0)))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for k in range(span):
        weight = 1 << (span - 1 - k)
        lagged = F.lag("q", k).over(w)
        num = num + F.coalesce(lagged * weight, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return daily.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "day_mean",
        (num.cast("double") / den.cast("double") / F.lit(1000000.0)).alias("ewma"),
    )


def top_event_paths(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    tiebreak_col: str,
    depth: int = 3,
    k: int = 20,
) -> DataFrame:
    """C32 — top-k onboarding paths: the first `depth` event types of
    each key's timeline joined into a path string, counted across
    keys. The clickstream "what do users do first" query.

    Plan: one shuffle on the key; WindowGroupLimit prunes each
    partition to `depth` rows per key BEFORE the exchange, so the
    path-assembly aggregate moves at most depth rows per key. The
    final top-k is a window over |distinct paths| rows (bounded by
    |types|^depth).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    firsts = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(type_col).alias("t"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= depth)
    )
    paths = firsts.groupBy("k").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "t"))),
                lambda s: s["t"],
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    rank_w = Window.orderBy(F.col("n_users").desc(), F.col("path"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("path", "n_users", "rank")
    )


def interval_coverage(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    hold_s: int = 300,
) -> DataFrame:
    """C33 — interval-union coverage: each event opens a [ts, ts+hold)
    activity interval; report per key per day the union length,
    number of merged islands, and event count. The gaps-and-islands
    interval-algebra pattern (same shape the reference needs to merge
    overlapping acquisition windows, sar_datacube_metadata.py:207-224).

    Plan: one shuffle on (key, day); island detection is a running
    max over the sorted partition (no self-join); all arithmetic is
    integer microseconds — exact in both engines.
    """
    hold_us = hold_s * 1_000_000
    base = df.select(
        F.col(key_col).alias("k"),
        F.to_date(ts_col).alias("day"),
        _us(ts_col).alias("s_us"),
        (_us(ts_col) + F.lit(hold_us)).alias("e_us"),
    )
    w = Window.partitionBy("k", "day").orderBy("s_us", "e_us")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    flagged = base.withColumn(
        "new_island",
        F.when(
            F.coalesce(F.max("e_us").over(wprev), F.lit(-1)) < F.col("s_us"), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("k", "day", "island").agg(
        F.min("s_us").alias("i_start"),
        F.max("e_us").alias("i_end"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        islands.groupBy("k", "day")
        .agg(
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_us"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_ev").alias("n_events"),
        )
        .select(
            F.col("k").alias("user_id"),
            F.col("day").cast("timestamp").alias("day"),
            (F.col("covered_us").cast("double") / F.lit(1000000.0)).alias(
                "covered_s"
            ),
            "n_islands",
            "n_events",
        )
    )


def changepoint_cusum(
    df: DataFrame,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """C34 — CUSUM changepoint scan over per-type daily counts.

    S_d = cumsum(c)_d - d*mean(c) is the classic CUSUM statistic;
    the day with max |S_d| is the level-shift candidate. Scaled by
    n_days everything stays exact INT64:
    S'_d = n*cumsum_d - d*total (same argmax).

    Plan: the scan partial-aggregates to |types|x|days| rows in one
    shuffle; the cumsum + argmax windows reuse that one exchange
    (both partition by type). Report is |types| rows.
    """
    daily = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(ts_col).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")
    word = wt.orderBy("day")
    scored = (
        daily.withColumn("d", F.row_number().over(word))
        .withColumn(
            "cum",
            F.sum("c").over(
                word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("total", F.sum("c").over(wt))
        .withColumn("n_days", F.count(F.lit(1)).over(wt))
        .withColumn(
            "s", F.col("n_days") * F.col("cum") - F.col("d") * F.col("total")
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("day")
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("change_day"),
            F.col("s").alias("cusum_scaled"),
            "n_days",
            F.col("total").alias("total_events"),
        )
    )


def downsample_lttb(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_size: int = 20,
) -> DataFrame:
    """C35 — LTTB-style series downsampling: per type, keep ONE
    visually-dominant point per `bucket_size`-point bucket — the point
    maximizing the triangle area spanned with the neighbor buckets'
    anchors (TimescaleDB ships this as lttb()). The parallel variant:
    anchors are bucket centroids rather than the previously selected
    point, removing the sequential dependency so every bucket scores
    its points independently — the distributed-friendly formulation.

    Exactness: time in epoch SECONDS and values quantized to 1e-3 keep
    the cross-product area in int64 (microseconds would overflow);
    anchor centroids use floor-division (identical for positive ints
    in both engines); edge buckets (no neighbor) fall back to their
    first point via a COALESCE(-1) ordering.

    Scale: the per-type sequence numbers come from the keyed
    distributed_rank (range-partition on (t, ts_s, tb), local ranks,
    broadcast offsets) so a handful-valued type key never serializes
    its whole corpus-grain slice into one task; the anchor prev/next
    carries exploit that bucket ids are DENSE integers per type
    (rank div bucket_size), so lag/lead collapse to equi-self-joins
    on (t, bucket±1) — shuffle-parallel on a corpus-scaled key, no
    per-type window (bucket count scales with the corpus too: n/20
    rows per type is still a funnel at 100×); the per-bucket argmax
    is a max_by aggregate (partial map-side combine, ≤ bucket_size
    rows per group).
    """
    from icecube_spark.operators.pipeline import distributed_rank

    base = distributed_rank(
        df.select(
            F.col(type_col).alias("t"),
            (_us(ts_col) / F.lit(1_000_000)).cast("bigint").alias("ts_s"),
            F.col(ts_col).alias("ts"),
            F.floor(F.col(value_col) * 1000).alias("q"),
            F.col(value_col).alias("v"),
            F.col(tiebreak_col).alias("tb"),
        ),
        ["ts_s", "tb"],
        rank_col="rn1",
        key_cols=["t"],
    ).withColumn("rn", F.col("rn1") - 1)
    pts = base.withColumn("bucket", F.floor(F.col("rn") / bucket_size))
    anchors = pts.groupBy("t", "bucket").agg(
        F.expr("sum(ts_s) div count(1)").alias("a_t"),
        F.expr("sum(q) div count(1)").alias("a_q"),
        F.count(F.lit(1)).alias("n_points"),
    )
    prev = anchors.select(
        "t",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("a_t").alias("prev_t"),
        F.col("a_q").alias("prev_q"),
    )
    nxt = anchors.select(
        "t",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("a_t").alias("next_t"),
        F.col("a_q").alias("next_q"),
    )
    neigh = (
        anchors.select("t", "bucket", "n_points")
        .join(prev, ["t", "bucket"], "left")
        .join(nxt, ["t", "bucket"], "left")
    )
    scored = pts.join(neigh, ["t", "bucket"]).select(
        "t",
        "bucket",
        "n_points",
        "ts",
        "v",
        "rn",
        F.coalesce(
            F.abs(
                (F.col("prev_t") - F.col("next_t"))
                * (F.col("q") - F.col("prev_q"))
                - (F.col("prev_t") - F.col("ts_s"))
                * (F.col("next_q") - F.col("prev_q"))
            ),
            F.lit(-1),
        ).alias("area2"),
    )
    best = scored.groupBy("t", "bucket").agg(
        F.max("n_points").alias("n_points"),
        F.max_by(
            F.struct("ts", "v", "area2"),
            F.struct(F.col("area2"), (-F.col("rn")).alias("nr")),
        ).alias("b"),
    )
    return best.select(
        F.col("t").alias("event_type"),
        "bucket",
        "n_points",
        F.col("b.ts").alias("ts"),
        F.col("b.v").alias("v"),
        F.col("b.area2").alias("area2"),
    )


def seasonal_dow(
    df: DataFrame,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """C36 — weekday seasonality after detrending: per type, daily
    counts minus their centered 7-day moving average, averaged by
    day-of-week. The additive-decomposition seasonal component (the
    classic STL first approximation), scaled by 7 so the detrended
    residual 7*c - sum7 stays in exact INT64.

    Plan: daily counts are one partial-agg shuffle to |types|x|days|;
    the centered MA and the weekday rollup reuse that single type-key
    clustering. Only full 7-day windows contribute (edges excluded),
    so the statistic is deterministic."""
    daily = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(ts_col).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).where(F.col("n_win") == 7)
    detr = ma.withColumn("resid7", F.lit(7) * F.col("c") - F.col("sum7"))
    return (
        detr.groupBy("event_type", F.dayofweek("day").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("resid7").alias("resid7_sum"),
        )
        .select(
            "event_type",
            "dow",
            "n_days",
            (
                F.col("resid7_sum").cast("double")
                / (F.lit(7.0) * F.col("n_days").cast("double"))
            ).alias("seasonal"),
        )
    )


def feature_pivot(
    df: DataFrame,
    key_col: str,
    type_col: str,
    value_col: str,
    types: list[str],
) -> DataFrame:
    """C37 — ML feature pivot: one row per key with per-type event
    counts and decimal-exact value sums as columns — the wide
    feature-store layout trainers join against. Explicit `types` keeps
    the pivot a single-pass CASE aggregation (Spark's inferring pivot
    would scan once extra for distinct values, and column order would
    be data-dependent).

    Plan: ONE partial-agg shuffle on the key; every pivot cell is a
    map-side CASE fold. |types| is small and fixed, so the row width
    is bounded."""
    aggs = []
    for t in types:
        hit = F.col(type_col) == t
        aggs.append(
            F.sum(F.when(hit, 1).otherwise(0)).alias(f"n_{t}")
        )
        aggs.append(
            F.sum(
                F.when(hit, F.col(value_col).cast("decimal(18,8)"))
            )
            .cast("double")
            .alias(f"sum_{t}")
        )
    return df.groupBy(F.col(key_col).alias("user_id")).agg(*aggs)


def cdc_merge(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    value_col: str,
    op_col: str,
    order_cols: list[str],
) -> DataFrame:
    """C38 — CDC MERGE: apply a change stream (upserts + deletes) to a
    keyed base snapshot and emit the next snapshot — Delta/Iceberg
    MERGE INTO semantics as one declarative plan. The LATEST change
    per key wins (ordered by `order_cols`); op 'D' deletes, 'U'
    upserts (update if the key exists, insert if not).

    Plan: one window shuffle on the change stream's key to pick the
    latest op, one full-outer shuffle against the base on the same
    key (co-partitioned — AQE reuses the exchange layout). Row status
    is codegen CASE math. At scale the base would be bucketed on the
    key so only the (much smaller) change stream shuffles.
    """
    w = Window.partitionBy(key_col).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(key_col).alias("__k"),
            F.col(op_col).alias("__op"),
            F.col(value_col).alias("__new_v"),
        )
    )
    joined = base.select(
        F.col(key_col), F.col(value_col).alias("__base_v")
    ).join(latest, F.col(key_col) == F.col("__k"), "full_outer")
    merged = joined.select(
        F.coalesce(F.col(key_col), F.col("__k")).alias(key_col),
        F.when(F.col("__op") == "U", F.col("__new_v"))
        .otherwise(F.col("__base_v"))
        .alias(value_col),
        F.when(F.col("__op").isNull(), F.lit("unchanged"))
        .when(F.col("__op") == "D", F.lit("deleted"))
        .when(F.col("__base_v").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("row_status"),
    )
    return merged.where(F.col("row_status") != "deleted")


def acf(
    daily: DataFrame, idx_col: str, value_col: str, max_lag: int = 7
) -> DataFrame:
    """C40 — autocorrelation function of a regular series at lags
    1..max_lag: Pearson r between (x_t, x_{t-k}) over all aligned
    pairs. The standard seasonality detector (a weekly cycle shows as
    a peak at lag 7) and the first diagnostic before any forecasting
    model. `daily` must already be one row per integer index
    (day number); `value_col` an exact double.

    Cross-engine exactness: every reduction is a quantized-integer
    sum (floor(x*1e6) for values, exact BIGINT products for the
    cross/square moments) so the Pearson formula evaluates on
    identical doubles in both engines.

    Plan: the lagged pairing is an equi-join of the (tiny) daily
    frame against itself shifted by an exploded lag array — daily
    series size is bounded by the calendar (365 rows/year even at
    100 TB of events), so Spark broadcasts it; moments are one
    partial-agg shuffle of max_lag groups.
    """
    q = (
        F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint")
    )
    base = daily.select(F.col(idx_col).alias("i"), q.alias("qx"))
    lags = base.select(
        "i", "qx", F.explode(F.expr(f"sequence(1, {max_lag})")).alias("lag")
    )
    prev = base.select(F.col("i").alias("i_prev"), F.col("qx").alias("qy"))
    pairs = lags.join(
        F.broadcast(prev), F.col("i") - F.col("lag") == F.col("i_prev")
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qy").cast("decimal(38,0)") * F.col("qy")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    syy = F.col("syy").cast("double") / F.lit(1e12)
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return mom.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        r.alias("acf"),
    )


def burst_detection(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    min_events: int = 3,
    ratio: float = 2.0,
) -> DataFrame:
    """C41 — per-key activity-burst detector: flag every hour in
    which a key produced >= min_events events AND >= ratio× its own
    mean hourly rate (mean over the key's ACTIVE hours). The
    bot/incident/scraper screen run over any event stream — a
    volume-based complement to rapid_repeats' gap-based screen.

    Plan: one shuffle to (key, hour) counts, a per-key window for
    the mean (second small shuffle on key), filter. Counts are
    exact; the mean is an exact INT/INT double; the threshold
    compare therefore agrees bit-for-bit with the oracle.
    """
    hourly = df.groupBy(
        F.col(key_col),
        F.date_trunc("hour", F.col(ts_col).cast("timestamp")).alias("hour_start"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = Window.partitionBy(key_col)
    flagged = hourly.withColumn(
        "mean_hourly",
        F.sum("n_events").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double"),
    ).where(
        (F.col("n_events") >= min_events)
        & (
            F.col("n_events").cast("double")
            >= F.lit(ratio) * F.col("mean_hourly")
        )
    )
    return flagged.select(
        key_col,
        "hour_start",
        "n_events",
        "mean_hourly",
        (F.col("n_events").cast("double") / F.col("mean_hourly")).alias(
            "burst_ratio"
        ),
    )


def seasonal_decompose(
    daily: DataFrame, day_col: str, value_col: str, half_window: int = 3
) -> DataFrame:
    """C42 — classical additive decomposition of a daily series:
    value = trend (centered (2k+1)-day moving average) + weekday
    seasonal (mean detrended value per day-of-week) + residual.
    STL-lite: the three-line decomposition every ops/finance
    dashboard runs before alerting on "anomalous" days that are
    really just Sundays.

    Cross-engine exactness: the input double is quantized once
    (floor(x*1e6) BIGINT); trend and seasonal means are exact
    integer sums divided by exact counts, so all derived doubles are
    identical. Only COMPLETE centered windows get a trend (edges
    NULL, excluded from the seasonal fit) — same convention as
    statsmodels.

    Plan: the daily frame is calendar-bounded (tiny), so the
    single-partition ordered window and the 7-group seasonal agg are
    all cheap regardless of raw corpus size; the expensive part
    (daily aggregation) happens upstream in the caller.
    """
    k = half_window
    span = 2 * k + 1
    q = daily.select(
        F.col(day_col).alias("day"),
        F.col(value_col).alias("value"),
        F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("qv"),
    )
    w = Window.orderBy("day").rowsBetween(-k, k)
    trended = q.withColumn("win_n", F.count(F.lit(1)).over(w)).withColumn(
        "trend",
        F.when(
            F.col("win_n") == span,
            F.sum("qv").over(w).cast("double") / F.lit(float(span)) / F.lit(1e6),
        ),
    )
    detr = trended.withColumn(
        "qd",
        F.floor((F.col("value") - F.col("trend")) * F.lit(1e6)).cast("bigint"),
    )
    dow = detr.withColumn("dow", F.dayofweek("day"))
    seas = (
        dow.where(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(
            (
                F.sum("qd").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e6)
            ).alias("seasonal")
        )
    )
    out = dow.join(F.broadcast(seas), "dow", "left")
    return out.select(
        "day",
        "value",
        "trend",
        "seasonal",
        (F.col("value") - F.col("trend") - F.col("seasonal")).alias("residual"),
    )


def order_backlog(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """C45 — daily order backlog via the sweep-line pattern: +1 the
    day an order is placed, -1 the day its LAST lineitem ships
    (completion), running sum = open orders on every active day. The
    operational "how deep is the queue" series every fulfillment /
    ticketing system charts.

    Plan: completion date is one map-side-combinable max per order
    (shuffle on orderkey); the two daily delta streams union into a
    calendar-bounded frame, so the running-sum window is a
    single-partition pass over day rows regardless of corpus size —
    the sweep-line trick that replaces a per-day correlated COUNT
    (O(days · orders)) with one cumulative sum.
    """
    opened = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("opened"))
    done = (
        lineitem.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("done_day"))
        .groupBy(F.col("done_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("completed"))
    )
    daily = (
        opened.join(done, "day", "full")
        .select(
            "day",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("completed", F.lit(0)).alias("completed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "opened",
        "completed",
        F.sum(F.col("opened") - F.col("completed")).over(w).alias("backlog"),
    )


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 100,
) -> DataFrame:
    """C46 — M4 visualization downsampling: per (key, time-bucket)
    keep min, max, first, and last value — the lossless-for-pixels
    reduction (Jugel et al., VLDB'14) that charting layers
    (Grafana/Timescale) push into the store instead of shipping raw
    points. Complements LTTB (C35): M4 is exact per pixel column and
    groupBy-only — no window over the full series.

    Plan: one partial-agg shuffle on (key, bucket); first/last are
    min/max over (ts, id, value) structs — pure codegen, no sort.
    Bucket edges derive from the global min/max ts (one tiny scalar
    agg broadcast back), so the plan is two scans of pruned columns
    and no driver round-trip of data rows.
    """
    span = df.agg(
        F.min(_us(ts_col)).alias("t0"), F.max(_us(ts_col)).alias("t1")
    )
    base = df.select(
        F.col(key_col),
        F.col(id_col),
        F.col(value_col),
        _us(ts_col).alias("ts_us"),
    ).crossJoin(F.broadcast(span))
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor(
            (F.col("ts_us") - F.col("t0"))
            * F.lit(n_buckets)
            / (F.col("t1") - F.col("t0") + 1)
        ),
    ).cast("int")
    return (
        base.withColumn("bucket", bucket)
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.min(F.struct("ts_us", id_col, value_col)).alias("__f"),
            F.max(F.struct("ts_us", id_col, value_col)).alias("__l"),
        )
        .select(
            key_col,
            "bucket",
            "n_points",
            "min_value",
            "max_value",
            F.col(f"__f.{value_col}").alias("first_value"),
            F.col(f"__l.{value_col}").alias("last_value"),
        )
    )


def pit_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_key: str,
    fact_ts_us: str,
    iv_key: str,
) -> DataFrame:
    """C47 — point-in-time (temporal / "AS OF") join: label each fact
    row with the dimension state whose SCD2 validity interval covers
    the fact's timestamp — the time-travel lookup every warehouse
    does against versioned dimensions (and the lookup the reference's
    nearest-time alignment approximates for rasters).

    Plan: the as-of union+carry shape (same as operators/asof.py) —
    probes and interval-start rows union, ONE shuffle on the key, an
    in-partition carry window forwards the latest interval onto each
    probe, and a final validity check against valid_to. No
    probe×interval fanout ever materializes, so the plan is immune to
    keys with many state runs (an event-derived dimension can have
    one run per event). Timestamps compare as exact int64 µs.
    """
    probes = facts.select(
        F.col(fact_key).alias("__k"),
        F.col(fact_ts_us).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("__fact"),
        F.lit(None)
        .cast("struct<state:string,valid_from_us:bigint,valid_to_us:bigint>")
        .alias("__iv"),
    )
    iv = intervals.select(
        F.col(iv_key).alias("__k"),
        F.col("valid_from_us").alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(probes.schema["__fact"].dataType).alias("__fact"),
        # ONE nullable struct: an open interval's NULL valid_to must
        # ride along with its own state (separate ignorenulls carries
        # would leak the previous interval's end over it)
        F.struct(
            F.col("state").cast("string").alias("state"),
            F.col("valid_from_us").cast("bigint").alias("valid_from_us"),
            F.col("valid_to_us").cast("bigint").alias("valid_to_us"),
        ).alias("__iv"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = probes.unionByName(iv).select(
        "__t",
        "__is_probe",
        "__fact",
        F.last("__iv", ignorenulls=True).over(w).alias("__iv"),
    )
    valid = F.col("__iv").isNotNull() & (
        F.col("__iv.valid_to_us").isNull()
        | (F.col("__t") < F.col("__iv.valid_to_us"))
    )
    return carried.where(F.col("__is_probe") == 1).select(
        *[F.col(f"__fact.{c}").alias(c) for c in facts.columns],
        F.when(valid, F.col("__iv.state")).alias("state"),
        F.when(valid, F.col("__iv.valid_from_us")).alias("valid_from_us"),
        F.when(valid, F.col("__iv.valid_to_us")).alias("valid_to_us"),
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.0,
) -> DataFrame:
    """C50 — robust outlier detection via the median absolute
    deviation: flag rows where |x − median| > k·1.4826·MAD per key.
    The z-score detector (C11) breaks when the outliers themselves
    inflate the std; median/MAD have a 50% breakdown point — this is
    the screen ops teams actually deploy on dirty metrics.

    Exactness: both medians are rank-selected actual data values
    (PERCENTILE_DISC convention, rank ceil(n/2)) — no interpolation,
    no float folds — so the threshold compare is exact in both
    engines.

    Plan: two rank passes (median of x, then median of |x − med|),
    each a keyed distributed_rank — range-partitioned per-(key,
    partition) local ranks with broadcast offsets, bit-identical to
    the keyed window form but without serializing each key's whole
    slice into one task when the key has a handful of values.
    """
    from icecube_spark.operators.pipeline import distributed_rank

    med = (
        distributed_rank(
            df.select(key_col, id_col, F.col(value_col)),
            [value_col, id_col],
            rank_col="rn",
            n_col="n",
            key_cols=[key_col],
        )
        .groupBy(key_col)
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") / 2), F.col(value_col)
                )
            ).alias("median")
        )
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = (
        distributed_rank(
            dev.select(key_col, id_col, "absdev"),
            ["absdev", id_col],
            rank_col="rn",
            n_col="n",
            key_cols=[key_col],
        )
        .groupBy(key_col)
        .agg(
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("absdev"))
            ).alias("mad")
        )
    )
    flagged = dev.join(F.broadcast(mad), key_col).where(
        F.col("absdev") > F.lit(k) * F.lit(1.4826) * F.col("mad")
    )
    return flagged.select(
        key_col,
        id_col,
        value_col,
        "median",
        "mad",
        (F.col("absdev") / (F.lit(1.4826) * F.col("mad"))).alias("robust_z"),
    )


def winsorize_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """C52 — winsorized robust summary per key: clip values at the
    exact discrete [p_lo, p_hi] (PERCENTILE_DISC rank selection, so
    the fences are actual data values and float parity is trivial),
    then report raw vs winsorized means and the clip count — the
    outlier-robust preprocessing step feature pipelines run before
    standardization (vs mad_outliers, which flags rather than clips).

    Plan: one key shuffle computes the fences (shared-exchange rank
    windows); the per-key fence table is key-cardinality-sized and
    broadcasts back onto a second scan; means fold in decimal
    (order-free) map-side. Two scans, one wide shuffle, no
    driver-side quantiles.
    """
    pcts = percentile_disc(
        df, key_cols, value_col, tiebreak_col, qs=(lo, hi)
    ).select(
        *key_cols,
        F.col(f"p{round(lo * 100)}").alias("_lo"),
        F.col(f"p{round(hi * 100)}").alias("_hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(pcts), key_cols)
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when((v < F.col("_lo")) | (v > F.col("_hi")), 1).otherwise(0)
            ).cast("bigint").alias("n_clipped"),
            davg(v).alias("mean_raw"),
            davg(clipped).alias("mean_winsorized"),
            F.min("_lo").cast("double").alias("fence_lo"),
            F.min("_hi").cast("double").alias("fence_hi"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    event_filter,
) -> DataFrame:
    """C53 — Kaplan-Meier survival curve for time-to-first-conversion:
    per user, T = days from first activity to first purchase (event)
    or to the global observation end (right-censored); at each
    distinct event day t, the KM factor (1 - d_t/n_t) over the
    at-risk count. The churn/retention statistic conversion_lag's
    plain averages can't give: censoring-correct time-to-event.

    Cross-engine exactness: survival is reported as the NEGATIVE LOG
    curve — each factor's ln quantized to nano-nats (exact BIGINT
    cumulative sums), divided once at the end. exp() is deliberately
    NOT applied: libm exp rounding differs across engines, while the
    log-scale curve is bit-exact and order-isomorphic (tests may exp
    it with tolerance).

    Plan: two corpus-sized aggregates (per-user firsts, one shuffle
    on the user key) collapse to per-day (events, censors) counts;
    everything after — risk sets via prefix sums, the KM fold —
    is windows over DISTINCT DURATION DAYS (hundreds of rows at any
    corpus scale), so the unpartitioned windows are free.
    """
    ts = F.col(ts_col).cast("timestamp")
    per_user = df.groupBy(key_col).agg(
        F.min(F.to_date(ts)).alias("t0"),
        F.min(F.when(event_filter, F.to_date(ts))).alias("t_event"),
    )
    end = df.agg(F.max(F.to_date(ts)).alias("t_end"))
    u = per_user.crossJoin(F.broadcast(end)).select(
        F.when(
            F.col("t_event").isNotNull(),
            F.datediff("t_event", "t0"),
        )
        .otherwise(F.datediff("t_end", "t0"))
        .cast("int")
        .alias("t"),
        F.when(F.col("t_event").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grp = u.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    wo = Window.partitionBy().orderBy("t")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    n_total = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    risk = (
        grp.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_at_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)),
        )
        .where(F.col("d") > 0)
    )
    factor = F.when(
        F.col("n_at_risk") > F.col("d"),
        F.floor(
            F.log(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * F.lit(1e9)
        ).cast("bigint"),
    ).otherwise(F.lit(-999_000_000_000).cast("bigint"))
    wcum = Window.partitionBy().orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        risk.withColumn("qf_nano", factor)
        .withColumn("cum_nano", F.sum("qf_nano").over(wcum))
        .select(
            F.col("t").alias("t_days"),
            "n_at_risk",
            F.col("d").alias("n_events"),
            (-F.col("cum_nano").cast("double") / F.lit(1e9)).alias(
                "neg_log_survival"
            ),
        )
        .orderBy("t_days")
    )


def forecast_baseline_eval(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """C55 — seasonal-naive forecast evaluation per key: score the
    forecast v̂[t] = v[t − season] on the daily series and report MAE
    and MASE (MAE over the naive-1 in-sample MAE — Hyndman's
    scale-free standard). The go/no-go gate before believing any
    fancier model: if it can't beat MASE 1.0 it loses to "same as
    last week".

    Exactness: daily values are decimal-fold sums; absolute errors
    are fixed-shape IEEE; the error MEANS fold in decimal again so
    reduction order can't wobble the last bit. MASE is one final
    division.

    Plan: one (key, day) aggregate, then calendar-exact lags via
    RANGE windows on the SAME key exchange (day gaps yield null
    forecasts and drop out, exactly like calendar_lag_features), and
    a per-key aggregate still on that exchange — one shuffle end to
    end.
    """
    from icecube_spark.functions.parity import dsum

    daily = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            F.col(value_col),
        )
        .groupBy(key_col, "day_num")
        .agg(dsum(value_col).alias("v"))
    )
    w = Window.partitionBy(key_col).orderBy("day_num")
    lag_s = F.max("v").over(
        w.rangeBetween(-season, -season)
    )
    lag_1 = F.max("v").over(w.rangeBetween(-1, -1))
    scored = daily.select(
        key_col,
        "day_num",
        "v",
        lag_s.alias("f_seasonal"),
        lag_1.alias("f_naive1"),
    )
    dec = "decimal(18,8)"
    return (
        scored.groupBy(key_col)
        .agg(
            F.count(F.when(F.col("f_seasonal").isNotNull(), 1))
            .cast("bigint")
            .alias("n_eval"),
            (
                F.sum(
                    F.abs(F.col("v") - F.col("f_seasonal")).cast(dec)
                ).cast("double")
                / F.count(F.when(F.col("f_seasonal").isNotNull(), 1))
            ).alias("mae"),
            (
                F.sum(F.abs(F.col("v") - F.col("f_naive1")).cast(dec)).cast(
                    "double"
                )
                / F.count(F.when(F.col("f_naive1").isNotNull(), 1))
            ).alias("naive1_mae"),
        )
        .select(
            key_col,
            "n_eval",
            "mae",
            "naive1_mae",
            F.when(
                F.col("naive1_mae") > 0, F.col("mae") / F.col("naive1_mae")
            ).otherwise(F.lit(0.0)).alias("mase"),
        )
        .orderBy(key_col)
    )


def max_drawdown(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """C60 — maximum drawdown per key on the cumulative daily series:
    the largest peak-to-trough fall of the running total (the risk
    statistic for any monotone-ish KPI — revenue run-rate, cumulative
    yield; in SAR-ops terms, worst sustained acquisition shortfall).

    Exactness: the cumulative series, its prefix maximum, and every
    drawdown are DECIMAL(18,8) prefix computations — association-free
    — cast to double only in the output row.

    Plan: one (key, day) aggregate, then cumsum + running-max + the
    drawdown max all ride the SAME key exchange (three window passes,
    one sort). Output is key-cardinality rows.
    """
    from icecube_spark.functions.parity import dsum

    daily = (
        df.select(
            F.col(key_col),
            F.to_date(F.col(ts_col).cast("timestamp")).alias("day"),
            F.col(value_col),
        )
        .groupBy(key_col, "day")
        .agg(F.sum(F.col(value_col).cast("decimal(18,8)")).alias("dv"))
    )
    w = Window.partitionBy(key_col).orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.withColumn("cum", F.sum("dv").over(wcum)).withColumn(
        "peak", F.max(F.sum("dv").over(wcum)).over(wcum)
    )
    dd = cum.withColumn("drawdown", F.col("peak") - F.col("cum"))
    return (
        dd.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("drawdown").cast("double").alias("max_drawdown"),
            F.max("peak").cast("double").alias("peak_value"),
            F.max("cum").cast("double").alias("final_value"),
        )
        .orderBy(key_col)
    )


def bollinger_bands(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_days: int = 7,
    k: float = 2.0,
) -> DataFrame:
    """C61 — Bollinger bands on the daily series: rolling mean ±
    k·rolling std over a trailing calendar window, plus the band
    breach flag — the volatility envelope behind half of anomaly
    dashboards (anomaly_zscore is the global version; this is the
    local-regime one).

    Exactness: rolling mean and std come from exact integer moments —
    daily values quantize to micro-units once, the window sums are
    BIGINTs — and the final mean/std/band arithmetic is one
    fixed-shape double expression; breach compares band to the exact
    daily value.

    Plan: one (key, day) aggregate; both moment windows are
    calendar-exact RANGE frames on the same key exchange. No
    self-joins, no rescans.
    """
    daily = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            F.col(value_col),
        )
        .groupBy(key_col, "day_num")
        .agg(
            F.sum(
                F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint")
            ).alias("qv")
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day_num")
        .rangeBetween(-(window_days - 1), 0)
    )
    m = daily.select(
        key_col,
        "day_num",
        "qv",
        F.count(F.lit(1)).over(w).alias("n_w"),
        F.sum("qv").over(w).alias("s1"),
        # qv^2 can reach ~1e21 — fold the square sums in decimal(38,0)
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv")).over(w).alias(
            "s2"
        ),
    )
    n = F.col("n_w").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / n / F.lit(1e6)
    var = (n * s2 - s1 * s1) / (n * n) / F.lit(1e12)
    # s2 exceeds 2^53, and DuckDB's int128->double cast is not
    # correctly rounded — quantize std to a 1e-9 grid so the 1-ulp
    # wobble cannot surface (same trade as corr_matrix)
    std = (
        F.floor(F.sqrt(F.greatest(var, F.lit(0.0))) * F.lit(1e9))
        .cast("bigint").cast("double") / F.lit(1e9)
    )
    v = F.col("qv").cast("double") / F.lit(1e6)
    upper = mean + F.lit(k) * std
    lower = mean - F.lit(k) * std
    return m.select(
        key_col,
        "day_num",
        v.alias("daily_value"),
        F.col("n_w").cast("bigint").alias("n_window"),
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        upper.alias("upper_band"),
        lower.alias("lower_band"),
        F.when(v > upper, F.lit("high"))
        .when(v < lower, F.lit("low"))
        .otherwise(F.lit("in"))
        .alias("breach"),
    ).orderBy(key_col, "day_num")


def theil_sen_trend(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C65 — Theil–Sen robust trend per key: the MEDIAN of all
    pairwise slopes of the daily value series. OLS slope (C15
    trend_slope) has a 0% breakdown point — one bad day drags the
    fit; the Theil–Sen estimator tolerates ~29% contamination, which
    is what you want on dirty operational metrics.

    Exactness: daily values are decimal-fold sums; each pairwise
    slope is one IEEE division of identical doubles; the median is a
    rank-selected actual slope (PERCENTILE_DISC convention, rank
    ceil(n/2), ties broken by day pair) — no interpolation, no float
    folds.

    Plan: one (key, day) aggregate, then a per-key self-join of the
    DAILY series — O(days²) per key, bounded by the calendar (~3.7 k
    days for a decade), NEVER by corpus row count, so the pair frame
    stays small at any scale; the rank pass reuses the key exchange.
    """
    from icecube_spark.functions.parity import dsum

    daily = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            F.col(value_col),
        )
        .groupBy(key_col, "d")
        .agg(dsum(value_col).alias("v"))
    )
    a = daily.select(
        key_col, F.col("d").alias("da"), F.col("v").alias("va")
    )
    b = daily.select(
        key_col, F.col("d").alias("db"), F.col("v").alias("vb")
    )
    pairs = a.join(b, key_col).where(F.col("da") < F.col("db")).select(
        key_col,
        "da",
        "db",
        (
            (F.col("vb") - F.col("va"))
            / (F.col("db") - F.col("da")).cast("double")
        ).alias("slope"),
    )
    wp = Window.partitionBy(key_col)
    wo = wp.orderBy("slope", "da", "db")
    return (
        pairs.select(
            key_col,
            "slope",
            F.row_number().over(wo).alias("rn"),
            F.count(F.lit(1)).over(wp).alias("n"),
        )
        .groupBy(key_col)
        .agg(
            F.max(F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("slope")))
            .alias("sen_slope"),
            F.max("n").cast("bigint").alias("n_pairs"),
        )
        .orderBy(key_col)
    )


def ks_drift(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C66 — two-sample Kolmogorov–Smirnov drift statistic per key:
    split each key's events at the midpoint of its day range and
    report D = max |ECDF_early − ECDF_late| plus the sample-size-
    scaled statistic D·sqrt(n1·n2/(n1+n2)). The nonparametric
    "did the distribution move" gate — mean/std drift checks miss
    shape changes; KS doesn't.

    Exactness: the split day is integer arithmetic; ECDFs are
    integer-count ratios of identical ints; sqrt is IEEE-correctly-
    rounded in both engines (unlike ln/exp) so the scaled statistic
    is safe unquantized.

    Plan: one (key, value-point) conditional aggregate, a cumulative
    window on the same key exchange, one final max — no self-joins,
    linear in distinct values.
    """
    days = df.select(
        F.col(key_col),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.col(value_col).alias("x"),
    )
    wp = Window.partitionBy(key_col)
    # per-key mid-day via a tiny agg + broadcast join: a window over
    # the raw corpus shuffled every event into |keys| sorted
    # partitions just to read min/max (the old shape cost ~1.5 s of
    # psi_drift's 3.6 s at sf0.1).
    bounds = days.groupBy(key_col).agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    split = days.join(F.broadcast(bounds), key_col).withColumn(
        "early", F.col("d") <= F.col("mid")
    )
    pts = split.groupBy(key_col, "x").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(~F.col("early"), 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    wo = wp.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        key_col,
        F.sum("c1").over(wo).alias("f1"),
        F.sum("c2").over(wo).alias("f2"),
        F.sum("c1").over(wp.rowsBetween(Window.unboundedPreceding,
                                        Window.unboundedFollowing)).alias("n1"),
        F.sum("c2").over(wp.rowsBetween(Window.unboundedPreceding,
                                        Window.unboundedFollowing)).alias("n2"),
    )
    d_stat = F.abs(
        F.col("f1").cast("double") / F.col("n1").cast("double")
        - F.col("f2").cast("double") / F.col("n2").cast("double")
    )
    return (
        cum.select(key_col, "n1", "n2", d_stat.alias("dd"))
        .groupBy(key_col)
        .agg(
            F.max("n1").cast("bigint").alias("n_early"),
            F.max("n2").cast("bigint").alias("n_late"),
            F.max("dd").alias("ks_stat"),
            (
                F.max("dd")
                * F.sqrt(
                    (F.max("n1") * F.max("n2")).cast("double")
                    / (F.max("n1") + F.max("n2")).cast("double")
                )
            ).alias("ks_scaled"),
        )
        .orderBy(key_col)
    )


# Benford first-digit probabilities log10(1 + 1/d), hardcoded as the
# SAME literal doubles on both engine sides — computing them via
# log10() risks last-ulp transcendental drift between JVM and C libm.
BENFORD_P = [
    (1, 0.3010299956639812), (2, 0.17609125905568124),
    (3, 0.12493873660829993), (4, 0.09691001300805642),
    (5, 0.07918124604762482), (6, 0.06694678963061322),
    (7, 0.05799194697768673), (8, 0.05115252244738129),
    (9, 0.04575749056067514),
]


def benford_deviation(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """C67 — Benford first-significant-digit audit per key: observed
    digit shares vs Benford's law with per-digit chi² contributions —
    the classic fabricated-data / instrumentation-bug screen for
    metric feeds.

    Exactness: the first significant digit comes from a %.6f render
    (printf rounding is identical in JVM and C), NOT from
    floor(log10(x)) whose boundary behavior is libm-dependent; the
    Benford expectations are shared literal doubles; shares and chi²
    terms are fixed-shape IEEE over identical ints.

    Plan: one regexp projection + (key, digit) count — a single
    map-side-combined aggregate; the 9-row expectation table
    broadcasts.
    """
    spark = df.sparkSession
    bp = F.broadcast(
        spark.createDataFrame(BENFORD_P, "digit int, p_benford double")
    )
    digits = df.where(F.col(value_col) > 0).select(
        F.col(key_col),
        F.regexp_extract(
            F.format_string("%.6f", F.col(value_col)), "[1-9]", 0
        ).cast("int").alias("digit"),
    ).where(F.col("digit").isNotNull())
    counts = digits.groupBy(key_col, "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    wp = Window.partitionBy(key_col)
    shares = counts.withColumn(
        "total", F.sum("n_obs").over(wp)
    ).join(bp, "digit")
    p_obs = F.col("n_obs").cast("double") / F.col("total").cast("double")
    chi2 = (p_obs - F.col("p_benford")) * (p_obs - F.col("p_benford")) / F.col(
        "p_benford"
    )
    return shares.select(
        key_col,
        "digit",
        "n_obs",
        p_obs.alias("p_obs"),
        "p_benford",
        chi2.alias("chi2_term"),
    ).orderBy(key_col, "digit")


def record_days(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C68 — record-breaking days per key: days whose daily total
    strictly exceeds every previous day's total, with the running
    record they beat and the day gap since the last record. Record
    statistics are the streak/extreme primitive dashboards ask for
    ("biggest day ever") and a drift telltale (iid series produce
    ~ln(n) records; trending series produce many more).

    Exactness: daily values are decimal-fold sums; the running max
    of identical decimals-as-doubles is engine-exact; flags are
    comparisons only.

    Plan: one (key, day) aggregate, one ordered window on the same
    exchange — no joins.
    """
    from icecube_spark.functions.parity import dsum

    daily = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            F.col(value_col),
        )
        .groupBy(key_col, "day_num")
        .agg(dsum(value_col).alias("v"))
    )
    w = Window.partitionBy(key_col).orderBy("day_num")
    prev_max = F.max("v").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = daily.withColumn("prev_record", prev_max).where(
        F.col("prev_record").isNull() | (F.col("v") > F.col("prev_record"))
    )
    return rec.select(
        key_col,
        "day_num",
        F.col("v").alias("daily_value"),
        "prev_record",
        (
            F.col("day_num")
            - F.lag("day_num").over(
                Window.partitionBy(key_col).orderBy("day_num")
            )
        ).cast("bigint").alias("days_since_last_record"),
    ).orderBy(key_col, "day_num")


def mean_shift_split(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C69 — binary-segmentation changepoint per key: the single day
    split that maximizes |mean(before) − mean(after)| on the daily
    series, with both segment means and the gap. CUSUM (C34) flags
    WHEN drift accumulates; this names the best single break and its
    magnitude — the first step of recursive binary segmentation.

    Exactness: daily values and the cumulative/total sums fold in
    DECIMAL(18,8) (order-free); segment means are IEEE divisions of
    identical doubles; the argmax is a rank window with day tiebreak.

    Plan: one (key, day) aggregate, one cumulative window and one
    rank window on the SAME key exchange — no joins, calendar-bounded
    row counts.
    """
    from icecube_spark.functions.parity import dsum

    daily = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            F.col(value_col),
        )
        .groupBy(key_col, "day_num")
        .agg(dsum(value_col).alias("v"))
    )
    wp = Window.partitionBy(key_col)
    wcum = wp.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    dec = F.col("v").cast("decimal(18,8)")
    cum = daily.select(
        key_col,
        "day_num",
        F.sum(dec).over(wcum).cast("double").alias("lsum"),
        F.count(F.lit(1)).over(wcum).alias("lcnt"),
        F.sum(dec).over(
            wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("double").alias("tsum"),
        F.count(F.lit(1)).over(
            wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("tcnt"),
    ).where(F.col("lcnt") < F.col("tcnt"))
    lmean = F.col("lsum") / F.col("lcnt").cast("double")
    rmean = (F.col("tsum") - F.col("lsum")) / (
        (F.col("tcnt") - F.col("lcnt")).cast("double")
    )
    scored = cum.select(
        key_col,
        "day_num",
        lmean.alias("mean_before"),
        rmean.alias("mean_after"),
        F.abs(lmean - rmean).alias("abs_shift"),
    )
    w = wp.orderBy(F.desc("abs_shift"), F.asc("day_num"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            key_col,
            F.col("day_num").alias("split_day"),
            "mean_before",
            "mean_after",
            "abs_shift",
        )
        .orderBy(key_col)
    )


def dow_anova(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C70 — one-way ANOVA of values across day-of-week groups per
    key: F-statistic and effect size η². The statistical answer to
    "is the weekday pattern real" that the seasonal_dow profile (C36)
    only eyeballs.

    Exactness: values quantize once to micro-units; all moments
    (Σq, Σq²) fold in DECIMAL(38,0) exact integers; F and η²
    quantize to a 1e-9 grid at the end (the corr_matrix guard for
    >2^53 int→double casts).

    Plan: one (key, dow) aggregate (map-side combined, ≤7 rows per
    key), then a per-key fold — no shuffles beyond the first.
    """
    dec = "decimal(38,0)"
    q = df.select(
        F.col(key_col),
        F.dayofweek(F.col(ts_col).cast("timestamp")).alias("dow"),
        F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("qv"),
    )
    g = q.groupBy(key_col, "dow").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("qv").cast(dec)).alias("s_g"),
        F.sum(F.col("qv").cast(dec) * F.col("qv")).alias("ss_g"),
    )
    per_key = g.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        # Σ s_g²/n_g term of SSB, folded as doubles from exact ints —
        # identical operand sequence both engines (dow-ordered agg
        # input would not be deterministic; use a decimal-exact
        # formulation instead: collect the per-group term quantized)
        F.sum(
            F.floor(
                (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
                / F.col("n_g").cast("double")
            ).cast(dec)
        ).alias("sb_q"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    sst = F.col("ss").cast("double") - (
        F.col("s").cast("double") * F.col("s").cast("double")
    ) / n
    ssb = F.col("sb_q").cast("double") - (
        F.col("s").cast("double") * F.col("s").cast("double")
    ) / n
    ssw = sst - ssb
    f_raw = (ssb / (k - 1)) / (ssw / (n - k))
    eta_raw = ssb / sst
    grid = lambda c: F.floor(c * F.lit(1e9)).cast("bigint").cast(
        "double"
    ) / F.lit(1e9)
    return per_key.select(
        key_col,
        F.col("k").cast("int").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_obs"),
        grid(f_raw).alias("f_stat"),
        grid(eta_raw).alias("eta_sq"),
    ).orderBy(key_col)


def active_streaks(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """C71 — gaps-and-islands activity streaks per key: the longest
    run of consecutive active days, the number of distinct streaks,
    and the current streak length at the observation end. The
    engagement statistic every retention dashboard carries, and the
    canonical islands pattern (day_num − dense_rank is constant
    within an island).

    Exactness: everything is integer arithmetic on day numbers.

    Plan: one (key, day) distinct, one key-partitioned rank window,
    one aggregate per island, one per key — all on the SAME key
    exchange, no joins.
    """
    days = df.select(
        F.col(key_col),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("d")
    islands = days.withColumn(
        "grp", F.col("d") - F.row_number().over(w)
    )
    per_island = islands.groupBy(key_col, "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
    )
    wk = Window.partitionBy(key_col)
    marked = per_island.select(
        key_col,
        "len",
        "start_d",
        "end_d",
        F.max("end_d").over(wk).alias("max_end"),
        F.max("len").over(wk).alias("max_len"),
    )
    return (
        marked.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak_days"),
            F.max(
                F.when(F.col("end_d") == F.col("max_end"), F.col("len"))
            ).cast("bigint").alias("current_streak_days"),
            F.min(
                F.when(F.col("len") == F.col("max_len"), F.col("start_d"))
            ).cast("bigint").alias("longest_streak_start_day"),
        )
        .orderBy(key_col)
    )


def psi_drift(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C75 — Population Stability Index per key: decile-bin the
    early-half values (the model-monitoring convention: bins come
    from the baseline), count both halves into those bins, and fold
    PSI = Σ (p−q)·ln(p/q) with add-½ smoothing. The industry-standard
    drift gate that complements ks_drift (C66): KS flags the largest
    single deviation, PSI totals the whole reshape.

    Exactness: the mid-day split and decile edges are pure integer
    arithmetic over micro-quantized values (discrete percentiles, no
    interpolation); each bin's ln(p/q) quantizes to micro-nats and
    the (p−q)·ln term to a 1e-12 integer grid, so the 10-term sum is
    exact regardless of reduction order.

    Plan: one (key, distinct-value) conditional count, a cumulative
    window on that vocab-sized frame, then the decile bin in CLOSED
    FORM — bin(x) = min(9, (10·(cum1−c1)) div n1) — instead of
    materializing the 9 edges and joining them back: edge_i < x iff
    the cumulative early count STRICTLY BELOW x reaches
    ceil(i·n1/10), so the count of passed edges is a pure integer
    division (n1 ≥ 1 always: the min-day event is ≤ mid by
    construction). Empty deciles contribute a per-key CONSTANT term
    (c1_b=c2_b=0), folded as (10−present)·tq0 instead of a
    keys×bins cross-join + left join. One linear pipeline — the
    old shape evaluated the cumulative frame twice (edges + bins)
    and the bin table twice (counts + n-totals), re-running the
    corpus scan per consumer. Linear in distinct values at any
    corpus size.
    """
    days = df.select(
        F.col(key_col),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("x"),
    )
    wp = Window.partitionBy(key_col)
    # per-key mid-day via a tiny agg + broadcast join: a window over
    # the raw corpus shuffled every event into |keys| sorted
    # partitions just to read min/max (the old shape cost ~1.5 s of
    # psi_drift's 3.6 s at sf0.1).
    bounds = days.groupBy(key_col).agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    split = days.join(F.broadcast(bounds), key_col).withColumn(
        "early", F.col("d") <= F.col("mid")
    )
    pts = split.groupBy(key_col, "x").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(~F.col("early"), 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    wo = wp.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        key_col,
        "x",
        "c1",
        "c2",
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c1").over(wp).alias("n1"),
        F.sum("c2").over(wp).alias("n2"),
    )
    # closed-form decile bin: edge_i < x  ⟺  cum1(prev(x)) ≥
    # ceil(i·n1/10), and cum1(prev(x)) = cum1 − c1, so the number of
    # edges strictly below x is min(9, (10·(cum1−c1)) div n1) — the
    # SAME integer the old edge-materialize + join-back computed,
    # without a second evaluation of the cumulative frame (guide
    # §2.4). `div` keeps the arithmetic in bigints.
    binned = (
        cum.select(
            key_col,
            "c1",
            "c2",
            "n1",
            "n2",
            F.least(
                F.lit(9),
                F.expr("(10 * (cum1 - c1)) div n1"),
            ).cast("int").alias("bin"),
        )
        .groupBy(key_col, "bin")
        .agg(
            F.sum("c1").cast("bigint").alias("c1_b"),
            F.sum("c2").cast("bigint").alias("c2_b"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )

    def _term(c1_b, c2_b):
        p = (c1_b.cast("double") + F.lit(0.5)) / (
            F.col("n1").cast("double") + F.lit(5.0)
        )
        q = (c2_b.cast("double") + F.lit(0.5)) / (
            F.col("n2").cast("double") + F.lit(5.0)
        )
        lq = F.floor(F.log(p / q) * F.lit(1e6)) / F.lit(1e6)
        return F.floor((p - q) * lq * F.lit(1e12)).cast("bigint")

    # empty deciles all contribute the identical c=0 term, so fold
    # them as a count×constant instead of cross-joining a bins frame
    # back against the key set — m·tq0 is exactly the sum of m copies
    # of the bigint tq0.
    return (
        binned.withColumn("tq", _term(F.col("c1_b"), F.col("c2_b")))
        .withColumn("tq0", _term(F.lit(0), F.lit(0)))
        .groupBy(key_col)
        .agg(
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            (
                (
                    F.sum("tq")
                    + (F.lit(10) - F.count(F.lit(1))) * F.max("tq0")
                ).cast("double")
                / F.lit(1e12)
            ).alias("psi"),
        )
        .orderBy(key_col)
    )


def window_funnel_strict(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: list[str],
    window_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """C76 — time-capped ordered funnel (ClickHouse windowFunnel
    semantics): every later step must land within `window_us` of the
    user's FIRST step-1 event, in order. funnel_conversion (C17) is
    the uncapped variant — this one answers "converted within 7
    days", the number product teams actually quote.

    Exactness: pure integer microsecond comparisons; rates divide
    exact counts.

    Plan: same chained partition-only windows over ONE user exchange
    as C17 — the deadline is just one more predicate in each min();
    |steps| summary rows leave the final aggregate.
    """
    w = Window.partitionBy("user")
    cur = df.select(
        F.col(user_col).alias("user"),
        _us(ts_col).alias("tus"),
        F.col(type_col),
    )
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = (
                cond
                & (F.col("tus") > F.col(prev))
                & (F.col("tus") <= F.col("t1") + F.lit(window_us))
            )
        cur = cur.withColumn(f"t{i}", F.min(F.when(cond, F.col("tus"))).over(w))
        prev = f"t{i}"
    step_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    per_user = cur.groupBy("user", *step_cols).agg(F.lit(1))
    counts = per_user.agg(
        *[F.count(c).cast("bigint").alias(f"n_step{i}") for i, c in enumerate(step_cols, 1)]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"n_step{i}").alias("n_users"),
            F.when(
                F.col("n_step1") > 0,
                F.col(f"n_step{i}").cast("double")
                / F.col("n_step1").cast("double"),
            ).alias("conversion_from_first"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.orderBy("step")


def sax_symbols(
    df: DataFrame, ts_col: str, key_col: str, value_col: str,
    seg_days: int = 7,
) -> DataFrame:
    """C77 — SAX symbolization (Lin et al.): daily totals → PAA
    segment means → z-normalize against the series' own moments →
    4-symbol alphabet at the Gaussian quartile breakpoints. The
    motif/novelty-mining representation: two weeks with the same
    SAX word are "the same shape" at massive discount vs raw DTW.

    Exactness: daily totals quantize to micro-units and every moment
    folds in exact integers; z is shape-mirrored double math over
    identical ints (sqrt is IEEE-exact); breakpoints are exact
    literals, and a tie on a breakpoint would need z to equal ±0.6745
    to the last bit (measure-zero on quantized inputs).

    Plan: one (key, day) aggregate, a per-key moment window on the
    day-count-bounded frame, one segment aggregate — all reusing the
    key exchange.
    """
    days = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("qv"),
        )
        .groupBy(key_col, "d")
        .agg(F.sum("qv").alias("dq"))
    )
    wp = Window.partitionBy(key_col)
    wd = wp.orderBy("d")
    dec = "decimal(38,0)"
    with_m = days.select(
        key_col,
        "d",
        "dq",
        ((F.row_number().over(wd) - 1) / F.lit(seg_days))
        .cast("int")
        .alias("seg"),
        F.count(F.lit(1)).over(wp).alias("n_days"),
        F.sum(F.col("dq").cast(dec)).over(wp).alias("s"),
        F.sum(F.col("dq").cast(dec) * F.col("dq")).over(wp).alias("ss"),
    )
    seg = with_m.groupBy(key_col, "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seg"),
        F.sum("dq").alias("sq_seg"),
        F.max("n_days").alias("n_days"),
        F.max("s").alias("s"),
        F.max("ss").alias("ss"),
    )
    nd = F.col("n_days").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    mu = sd / nd / F.lit(1e6)
    sigma = F.sqrt((ssd - sd * sd / nd) / nd) / F.lit(1e6)
    paa = F.col("sq_seg").cast("double") / F.col("n_seg").cast("double") / F.lit(1e6)
    z = (paa - mu) / sigma
    bp = 0.6745
    sym = (
        F.when(z < F.lit(-bp), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(bp), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return seg.select(
        key_col,
        "seg",
        "n_seg",
        paa.alias("paa"),
        (F.floor(z * F.lit(1e9)) / F.lit(1e9)).alias("z"),
        sym.alias("symbol"),
    ).orderBy(key_col, "seg")


def period_detect(
    df: DataFrame, ts_col: str, key_col: str, value_col: str,
    max_lag: int = 14,
) -> DataFrame:
    """C78 — dominant-periodicity detection per key: the
    autocorrelation argmax over lags 2..max_lag of the daily-total
    series. acf_daily_value (C40) prints the whole correlogram; this
    answers the question analysts actually ask — "is there a weekly
    cycle, and how strong".

    Exactness: deviations are N-scaled exact integers (the A33
    scheme), lag products fold in DECIMAL(38,0), and the ACF
    quantizes to a 1e-9 grid before the argmax (ties break to the
    smaller lag).

    Plan: one (key, day) aggregate, per-key moment windows on the
    day-bounded frame, a lag-explode self-join co-partitioned on the
    key, and a ≤max_lag-row-per-key argmax.
    """
    days = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("qv"),
        )
        .groupBy(key_col, "d")
        .agg(F.sum("qv").alias("dq"))
    )
    wp = Window.partitionBy(key_col)
    dev = days.select(
        key_col,
        "d",
        (F.col("dq") * F.count(F.lit(1)).over(wp) - F.sum("dq").over(wp)).alias(
            "devq"
        ),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n_days"),
    )
    dec19 = "decimal(19,0)"
    den = dev.groupBy(key_col).agg(
        F.sum(F.col("devq").cast(dec19) * F.col("devq").cast(dec19)).alias("den"),
        F.max("n_days").alias("n_days"),
    )
    lags = dev.select(
        key_col, "d", "devq",
        F.explode(F.array([F.lit(i) for i in range(2, max_lag + 1)])).alias("lag"),
    ).select(key_col, (F.col("d") + F.col("lag")).alias("d2"), "devq", "lag")
    prods = lags.join(
        dev.select(key_col, F.col("d").alias("d2"), F.col("devq").alias("devq2")),
        [key_col, "d2"],
    ).groupBy(key_col, "lag").agg(
        F.sum(F.col("devq").cast(dec19) * F.col("devq2").cast(dec19)).alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    scored = prods.join(den, key_col).select(
        key_col,
        "lag",
        "n_pairs",
        "n_days",
        (
            F.floor(
                (F.col("num").cast("double") / F.col("den").cast("double"))
                * F.lit(1e9)
            )
            / F.lit(1e9)
        ).alias("acf"),
    )
    wr = Window.partitionBy(key_col).orderBy(F.col("acf").desc(), F.col("lag"))
    return (
        scored.withColumn("r", F.row_number().over(wr))
        .where(F.col("r") == 1)
        .select(
            key_col,
            F.col("lag").alias("best_lag"),
            "acf",
            "n_pairs",
            "n_days",
        )
        .orderBy(key_col)
    )


def diff_in_diff(
    df: DataFrame, ts_col: str, type_col: str, value_col: str,
    treat: str, control: str,
) -> DataFrame:
    """C79 — difference-in-differences estimate: split the range at
    the global mid-day, compare the treated series' pre→post mean
    shift against the control's. The causal-inference workhorse for
    "did the launch move the metric beyond the ambient trend".

    Exactness: the split is integer arithmetic; the four cell means
    fold through DECIMAL(18,8); the estimate subtracts identical
    doubles.

    Plan: one conditional aggregate to 4 cells (map-side combined) —
    the split day rides a 1-row broadcast.
    """
    days = df.where(F.col(type_col).isin([treat, control])).select(
        F.col(type_col).alias("grp"),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.col(value_col).alias("x"),
    )
    mid = days.agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    cells = (
        days.crossJoin(F.broadcast(mid))
        .select(
            "grp",
            F.when(F.col("d") <= F.col("mid"), F.lit("pre"))
            .otherwise(F.lit("post"))
            .alias("period"),
            "x",
        )
        .groupBy("grp", "period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("x").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_x"),
        )
    )
    pick = lambda g, p: F.max(  # noqa: E731
        F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_x"))
    )
    return cells.groupBy().agg(
        pick(treat, "pre").alias("treat_pre"),
        pick(treat, "post").alias("treat_post"),
        pick(control, "pre").alias("control_pre"),
        pick(control, "post").alias("control_post"),
    ).select(
        "treat_pre",
        "treat_post",
        "control_pre",
        "control_post",
        (
            (F.col("treat_post") - F.col("treat_pre"))
            - (F.col("control_post") - F.col("control_pre"))
        ).alias("did_estimate"),
    )


def multitouch_attribution(
    df: DataFrame, ts_col: str, user_col: str, type_col: str,
    conversion: str = "purchase", touch_types: tuple = ("view", "click"),
    window_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """C81 — linear multi-touch attribution: each conversion splits
    one unit of credit equally across the user's touch events in the
    preceding window; per touch type, the credited total. The
    marketing-mix complement to C30's last-touch attribution — last
    touch systematically starves upper-funnel channels.

    Exactness: per-touch credit quantizes to floor(1e12/n) integer
    picocredits, so sums are exact and the per-conversion remainder
    (< n·1e-12) is deterministic too.

    Plan: conversions join touches on the user key (co-partitioned,
    one exchange) with the window predicate; a per-conversion count
    window on the same exchange; one |touch types|-row aggregate.
    """
    base = df.select(
        F.col(user_col).alias("user"),
        _us(ts_col).alias("tus"),
        F.col(type_col).alias("et"),
        F.col("event_id"),
    )
    conv = base.where(F.col("et") == conversion).select(
        "user",
        F.col("tus").alias("conv_t"),
        F.col("event_id").alias("conv_id"),
    )
    touch = base.where(F.col("et").isin(list(touch_types))).select(
        "user",
        F.col("tus").alias("touch_t"),
        F.col("et").alias("touch_type"),
        F.col("event_id").alias("touch_id"),
    )
    j = conv.join(touch, "user").where(
        (F.col("touch_t") < F.col("conv_t"))
        & (F.col("touch_t") >= F.col("conv_t") - F.lit(window_us))
    )
    wc = Window.partitionBy("conv_id")
    credited = j.withColumn(
        "credit_pico",
        F.floor(F.lit(1e12) / F.count(F.lit(1)).over(wc)).cast("bigint"),
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            (F.sum("credit_pico").cast("double") / F.lit(1e12)).alias(
                "credited_conversions"
            ),
        )
        .orderBy("touch_type")
    )


def markov_accuracy(
    df: DataFrame, ts_col: str, user_col: str, type_col: str
) -> DataFrame:
    """C82 — next-event prediction accuracy of the first-order Markov
    model: transition counts fit on the early half (by global
    mid-day), argmax prediction evaluated on late-half transitions.
    The honesty check on C21's transition matrix — a pretty heatmap
    that predicts at chance level is decoration.

    Exactness: the argmax breaks count ties lexicographically; all
    counts and the split are exact integers; accuracy divides them.

    Plan: ONE pass over the user-key exchange (lead window) collapses
    straight to a ≤2·|types|²-row (cur, to, is_train) count table
    (checkpointed — it is model-sized and both the model and the
    score read it); the model argmax and the accuracy fold both run
    on that tiny frame, so the corpus-grain window is never evaluated
    twice (guide §2.3/§2.4 — the pre-r9 shape ran separate train and
    test passes over the same window). The global mid-day is an
    AGGREGATE broadcast back (map-side partial min/max) — the old
    unbounded global window shipped every row through one task (r8
    funnel sweep).
    """
    days = df.select(
        F.col(user_col).alias("user"),
        _us(ts_col).alias("tus"),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.col(type_col).alias("et"),
        F.col("event_id"),
    )
    wu = Window.partitionBy("user").orderBy("tus", "event_id")
    bounds = days.agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    seq = days.crossJoin(F.broadcast(bounds)).withColumn(
        "nxt", F.lead("et", 1).over(wu)
    ).withColumn(
        "nxt_d", F.lead("d", 1).over(wu)
    ).where(F.col("nxt").isNotNull())
    trans = (
        seq.groupBy(
            F.col("et").alias("cur"),
            F.col("nxt").alias("to"),
            (F.col("nxt_d") <= F.col("mid")).alias("is_train"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(materialize)
    )
    train = trans.where(F.col("is_train"))
    wr = Window.partitionBy("cur").orderBy(F.col("c").desc(), F.col("to"))
    model = (
        train.withColumn("r", F.row_number().over(wr))
        .where(F.col("r") == 1)
        .select("cur", F.col("to").alias("pred"))
    )
    test = trans.where(~F.col("is_train")).select("cur", "to", "c")
    scored = test.join(F.broadcast(model), "cur", "left")
    return (
        scored.groupBy("cur")
        .agg(
            F.sum("c").cast("bigint").alias("n_transitions"),
            F.max("pred").alias("predicted_next"),
            F.sum(
                F.when(F.col("to") == F.col("pred"), F.col("c")).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
        .select(
            F.col("cur").alias("event_type"),
            "predicted_next",
            "n_transitions",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_transitions").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("event_type")
    )


def haar_energy(
    df: DataFrame, ts_col: str, key_col: str, value_col: str,
    n_days: int = 32,
) -> DataFrame:
    """C83 — Haar wavelet energy decomposition per key: the first 32
    days' totals run through 3 Haar detail levels (pairwise
    differences of successive approximations — pure integer
    adds/subs, no trig), reporting each level's share of total detail
    energy. Level-1-heavy = day-to-day noise; level-3-heavy =
    week-scale swings. The multi-resolution complement to C36/C42's
    fixed-period seasonality.

    Exactness: Haar on micro-int daily totals stays integer at every
    level (unnormalized transform); energies fold in DECIMAL(38,0)
    and shares quantize to a 1e-9 grid.

    Plan: one (key, day) aggregate, a day-rank window, one
    pair-index aggregate per level stacked on the same key exchange,
    and a 3-row-per-key share projection.
    """
    days = (
        df.select(
            F.col(key_col),
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            # centi (not micro) quantization keeps level-3 squared
            # coefficients inside exact BIGINT range — int64->double
            # casts are correctly rounded in both engines, the
            # decimal/int128 path is not
            F.floor(F.col(value_col) * F.lit(100.0)).cast("bigint").alias("qv"),
        )
        .groupBy(key_col, "d")
        .agg(F.sum("qv").alias("x"))
    )
    wd = Window.partitionBy(key_col).orderBy("d")
    cur = days.select(
        key_col,
        (F.row_number().over(wd) - 1).alias("i"),
        "x",
    ).where(F.col("i") < n_days)
    # bounded (≤ n_days rows per key) and re-derived by every Haar
    # level below — checkpoint so the corpus scan + (key, day)
    # aggregate run once instead of once per level (guide §5)
    cur = cur.transform(materialize)
    energies = []
    for level in range(1, 4):
        paired = (
            cur.select(
                key_col,
                F.floor(F.col("i") / 2).cast("bigint").alias("pi"),
                (F.col("i") % 2).alias("par"),
                "x",
            )
            .groupBy(key_col, "pi")
            .agg(
                F.sum(F.when(F.col("par") == 0, F.col("x")).otherwise(0))
                .alias("x0"),
                F.sum(F.when(F.col("par") == 1, F.col("x")).otherwise(0))
                .alias("x1"),
                F.count(F.lit(1)).alias("n_in_pair"),
            )
            .where(F.col("n_in_pair") == 2)
            .withColumnRenamed("pi", "i")
        )
        detail = paired.select(
            key_col, "i", (F.col("x0") - F.col("x1")).alias("dcoef")
        )
        energies.append(
            detail.groupBy(key_col).agg(
                F.sum(F.col("dcoef") * F.col("dcoef"))
                .cast("bigint")
                .alias("e"),
                F.lit(level).alias("level"),
            ).select(key_col, "level", "e")
        )
        cur = paired.select(
            key_col, "i", (F.col("x0") + F.col("x1")).alias("x")
        )
    lv = energies[0].unionAll(energies[1]).unionAll(energies[2])
    wk = Window.partitionBy(key_col)
    tot = lv.withColumn("te", F.sum("e").over(wk))
    return tot.select(
        key_col,
        "level",
        (F.col("e").cast("double") / F.lit(1e4)).alias("energy"),
        (
            F.floor(
                (F.col("e").cast("double") / F.col("te").cast("double"))
                * F.lit(1e9)
            )
            / F.lit(1e9)
        ).alias("energy_share"),
    ).orderBy(key_col, "level")


def value_at_risk(
    df: DataFrame, key_col: str, value_col: str, alpha_pct: int = 5
) -> DataFrame:
    """C84 — historical Value-at-Risk and Expected Shortfall per key:
    the α-percentile worst value (discrete, no interpolation) and the
    exact mean of the tail at or below it. The risk-desk pair every
    monitoring stack quotes; ES is the coherent one (VaR ignores how
    bad the tail is).

    Exactness: the VaR cut is integer rank selection over
    micro-quantized values; ES folds the tail in exact integers.

    Plan: one (key, distinct-value) count aggregate, a per-key
    cumulative window on that vocab-sized frame, one tail aggregate.
    """
    pts = (
        df.select(
            F.col(key_col),
            F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint").alias("x"),
        )
        .groupBy(key_col, "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wp = Window.partitionBy(key_col)
    wo = wp.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        key_col,
        "x",
        "c",
        F.sum("c").over(wo).alias("cum"),
        F.sum("c").over(wp).alias("n"),
    )
    # rank of the alpha-percentile: ceil(alpha * n / 100)
    cut = F.floor(
        (F.lit(alpha_pct) * F.col("n") + F.lit(99)) / F.lit(100)
    )
    var_row = (
        cum.where(F.col("cum") >= cut)
        .groupBy(key_col)
        .agg(F.min("x").alias("var_q"))
    )
    tail = (
        cum.join(var_row, key_col)
        .where(F.col("x") <= F.col("var_q"))
        .groupBy(key_col)
        .agg(
            F.max("n").alias("n"),
            F.max("var_q").alias("var_q"),
            F.sum("c").cast("bigint").alias("n_tail"),
            F.sum(F.col("x") * F.col("c")).alias("tail_sum"),
        )
    )
    return tail.select(
        key_col,
        F.col("n").cast("bigint").alias("n_samples"),
        (F.col("var_q").cast("double") / F.lit(1e6)).alias("var_value"),
        "n_tail",
        (
            F.col("tail_sum").cast("double")
            / F.col("n_tail").cast("double")
            / F.lit(1e6)
        ).alias("expected_shortfall"),
    ).orderBy(key_col)


def ljung_box(
    daily: DataFrame, idx_col: str, value_col: str, max_lag: int = 7
) -> DataFrame:
    """C87 — Ljung-Box portmanteau test on a regular series: full-
    sample autocorrelations rho_k at lags 1..max_lag and the
    cumulative Q statistic Q_m = n(n+2) * sum_{k<=m} rho_k^2/(n-k).
    THE standard "is there ANY autocorrelation left" gate run on
    forecast residuals before a model ships (compare Q against a
    chi-square_m quantile).

    Cross-engine exactness: values quantize to floor(x*1e6) BIGINT;
    residuals center as floor((n*q - S)/n) (exact — magnitudes stay
    << 2^53); covariance/variance moments fold in DECIMAL(38,0)
    (DuckDB HUGEINT twin); each Q term quantizes to nano-units
    BEFORE the cumulative sum so the running total is an exact
    integer fold, order-free.

    Plan: daily series is calendar-bounded (<=365 rows/year at ANY
    corpus size), so the lag pairing broadcasts; moments are one
    max_lag-group partial agg; the final window runs on max_lag
    rows. Nothing here grows with raw-event volume — the rollup
    before this operator does the heavy lifting.
    """
    q = F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint")
    base = daily.select(F.col(idx_col).alias("i"), q.alias("qx"))
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").alias("s"),
    )
    cen = base.crossJoin(F.broadcast(tot)).select(
        "i",
        "n",
        F.floor(
            (F.col("qx") * F.col("n") - F.col("s")).cast("double")
            / F.col("n").cast("double")
        )
        .cast("bigint")
        .alias("e"),
    # calendar-bounded (≤365 rows/year) and referenced by the lag
    # pairing, the broadcast prev side AND the variance fold —
    # checkpoint so the daily rollup + centering run once (guide §5)
    ).transform(materialize)
    lags = cen.select(
        "i", "e", F.explode(F.expr(f"sequence(1, {max_lag})")).alias("lag")
    )
    prev = cen.select(F.col("i").alias("ip"), F.col("e").alias("ep"))
    num = (
        lags.join(F.broadcast(prev), F.col("i") - F.col("lag") == F.col("ip"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("e").cast("decimal(38,0)") * F.col("ep")).alias("cnum"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    den = cen.groupBy().agg(
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e")).alias("cden"),
        F.max("n").alias("n"),
    )
    j = num.crossJoin(F.broadcast(den))
    nd = F.col("n").cast("double")
    rho = F.col("cnum").cast("double") / F.col("cden").cast("double")
    term_q = F.floor(
        nd * (nd + F.lit(2.0)) * rho * rho
        / (nd - F.col("lag").cast("double"))
        * F.lit(1e9)
    ).cast("bigint")
    wl = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return (
        j.select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            (F.floor(rho * F.lit(1e9)) / F.lit(1e9)).alias("rho"),
            term_q.alias("tq"),
        )
        .withColumn(
            "q_stat", F.sum("tq").over(wl).cast("double") / F.lit(1e9)
        )
        .drop("tq")
        .orderBy("lag")
    )


def runs_test(daily: DataFrame, idx_col: str, value_col: str) -> DataFrame:
    """C88 — Wald-Wolfowitz runs test on a daily integer series:
    classify each day above/below the (disc) median, count sign
    runs, and z-score the count against the random expectation
    E[R] = 1 + 2 n1 n2/(n1+n2). The nonparametric "is this series
    random or regime-y" gate that needs no distributional
    assumptions — the complement to ljung_box's linear-correlation
    view.

    Exactness: the median is the element at row ceil(n/2) of the
    (value, day) total order (no interpolation); run/level counts
    are exact integers; E and z evaluate on exact-integer ratios
    and snap to a 1e-9 grid.

    Plan: the series is calendar-bounded, so the rank/lag windows
    run on a frame that stays tiny at any corpus size; everything
    upstream (the daily rollup) partial-aggregates before shuffling.
    """
    base = daily.select(F.col(idx_col).alias("i"), F.col(value_col).alias("v"))
    wr = Window.orderBy("v", "i")
    cw = Window.partitionBy()
    med = (
        base.select(
            "v",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(cw).alias("n"),
        )
        .where(F.col("rn") == F.ceil(F.col("n") * F.lit(0.5)))
        .select(F.col("v").alias("med"))
    )
    cls = (
        base.crossJoin(F.broadcast(med))
        .where(F.col("v") != F.col("med"))
        .select("i", (F.col("v") > F.col("med")).alias("above"))
    )
    wi = Window.orderBy("i")
    flagged = cls.select(
        "above",
        F.when(
            F.lag("above").over(wi).isNull()
            | (F.col("above") != F.lag("above").over(wi)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("above").cast("bigint")).cast("bigint").alias("n_above"),
        F.sum((~F.col("above")).cast("bigint")).cast("bigint").alias("n_below"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    r = F.col("n_runs").cast("double")
    e = F.lit(1.0) + F.lit(2.0) * n1 * n2 / (n1 + n2)
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    grid = lambda c: F.floor(c * F.lit(1e9)) / F.lit(1e9)  # noqa: E731
    return agg.select(
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        grid(e).alias("expected_runs"),
        grid((r - e) / F.sqrt(var)).alias("z_score"),
    )


def turning_points(daily: DataFrame, idx_col: str, value_col: str) -> DataFrame:
    """C89 — turning-point randomness test: count strict local peaks
    and troughs in a daily integer series and z-score against the
    i.i.d. expectation E[T] = 2(n-2)/3, Var[T] = (16n-29)/90. The
    quickest "is there structure at all" screen (runs_test's
    derivative-sign sibling): too few turns = trend, too many =
    oscillation.

    Exactness: strict integer comparisons (ties are non-turning by
    definition); E is one exact ratio; z snaps to a 1e-9 grid.

    Plan: one lag/lead window over the calendar-bounded series —
    cost flat in corpus size once the daily rollup lands.
    """
    w = Window.orderBy(idx_col)
    v = F.col(value_col)
    tp = (
        daily.select(
            v.alias("v"),
            F.lag(value_col).over(w).alias("pv"),
            F.lead(value_col).over(w).alias("nv"),
        )
        .where(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            (
                ((F.col("v") > F.col("pv")) & (F.col("v") > F.col("nv")))
                | ((F.col("v") < F.col("pv")) & (F.col("v") < F.col("nv")))
            )
            .cast("int")
            .alias("turn")
        )
    )
    agg = tp.agg(
        (F.count(F.lit(1)) + 2).cast("bigint").alias("n_days"),
        F.sum("turn").cast("bigint").alias("n_turning"),
    )
    nd = F.col("n_days").cast("double")
    e = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    var = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    grid = lambda c: F.floor(c * F.lit(1e9)) / F.lit(1e9)  # noqa: E731
    return agg.select(
        "n_days",
        "n_turning",
        grid(e).alias("expected_turning"),
        grid((F.col("n_turning").cast("double") - e) / F.sqrt(var)).alias(
            "z_score"
        ),
    )


def drawdown_durations(
    daily: DataFrame, idx_col: str, value_col: str
) -> DataFrame:
    """C90 — drawdown-episode profile of a daily integer series:
    consecutive runs of days strictly below the running maximum,
    reporting episode count, longest and mean duration, and the
    deepest shortfall. C60's max_drawdown gives the single worst
    fall; this gives the regime picture (how often, how long, how
    deep) that capacity planning actually consumes.

    Exactness: run-max, episode boundaries and depths are exact
    integer comparisons; the mean duration is one single division.

    Plan: two ordered windows over the calendar-bounded daily frame
    (running max, then gaps-and-islands episode ids) — flat cost at
    any corpus size after the daily rollup.
    """
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    wi = Window.orderBy("i")
    base = daily.select(
        F.col(idx_col).alias("i"), F.col(value_col).alias("v")
    ).withColumn("runmax", F.max("v").over(w))
    dd = base.withColumn("in_dd", (F.col("v") < F.col("runmax")).cast("int"))
    ep = dd.withColumn(
        "ep_start",
        F.when(
            (F.col("in_dd") == 1)
            & (F.coalesce(F.lag("in_dd").over(wi), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    ).withColumn(
        "ep_id",
        F.sum("ep_start").over(
            Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    eps = (
        ep.where(F.col("in_dd") == 1)
        .groupBy("ep_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dur"),
            F.max(F.col("runmax") - F.col("v")).alias("depth"),
        )
    )
    return eps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
        F.max("dur").cast("bigint").alias("longest_days"),
        (
            F.sum("dur").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_duration_days"),
        (F.max("depth").cast("double") / F.lit(1e2)).alias("max_depth"),
    )


_HURST_SIZES = {8: 2079441541, 16: 2772588722, 32: 3465735902, 64: 4158883083}


def hurst_rs(daily: DataFrame, idx_col: str, value_col: str) -> DataFrame:
    """C93 — rescaled-range (R/S) Hurst exponent of a daily integer
    series over block sizes 8/16/32/64: per complete block, R =
    range of cumulative mean-deviations and S = population std;
    H = OLS slope of ln(mean R/S) on ln(block size). H ~ 0.5 is a
    random walk, > 0.5 long-memory persistence, < 0.5 mean
    reversion — the classic long-range-dependence diagnostic
    (Hurst 1951, Mandelbrot's R/S analysis).

    Exactness: deviations scale by the block size so every
    cumulative term is an exact BIGINT; R/S divides an exact int by
    the sqrt of an exact int (identical doubles); per-size means
    fold nano-quantized R/S values; the regression runs on
    nano-quantized (ln B, ln mean) integer moments (ln B pinned as
    integer literals) with one final single division, snapped 1e-9.

    Plan: blocks form with one rank window over the calendar-bounded
    series, then per-(size, block) aggregates and a 4-row readout —
    flat cost at any corpus size.
    """
    sizes = F.array(*[F.lit(b) for b in _HURST_SIZES])
    wr = Window.orderBy(idx_col)
    base = daily.select(
        F.col(value_col).alias("x"),
        (F.row_number().over(wr) - 1).alias("rn"),
    ).select("x", "rn", F.explode(sizes).alias("bs"))
    blk = base.select(
        "bs", "x", "rn",
        F.floor(F.col("rn") / F.col("bs")).cast("bigint").alias("blk"),
        (F.col("rn") % F.col("bs")).alias("pos"),
    )
    per = blk.groupBy("bs", "blk").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("x").alias("sb"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("ssb"),
    )
    full = per.where(F.col("nb") == F.col("bs"))
    wcum = (
        Window.partitionBy("bs", "blk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = (
        blk.join(full.select("bs", "blk", "sb", "ssb"), ["bs", "blk"])
        .withColumn(
            "cum",
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("bs") - F.col("sb")
            ).over(wcum),
        )
    )
    rs = (
        dev.groupBy("bs", "blk", "sb", "ssb")
        .agg(
            (F.max("cum") - F.min("cum")).cast("double").alias("r_scaled")
        )
        .select(
            "bs",
            F.floor(
                F.col("r_scaled")
                / F.sqrt(
                    (
                        F.col("ssb").cast("double") * F.col("bs").cast("double")
                        - F.col("sb").cast("double") * F.col("sb").cast("double")
                    )
                )
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("qrs"),
        )
    )
    per_size = rs.groupBy("bs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("qrs").alias("sqrs"),
    ).select(
        "bs",
        "n_blocks",
        (
            F.col("sqrs").cast("double")
            / (F.col("n_blocks").cast("double") * F.lit(1e9))
        ).alias("mean_rs"),
    )
    lnb = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in _HURST_SIZES]),
            F.array(*[F.lit(v) for v in _HURST_SIZES.values()]),
        ),
        F.col("bs"),
    )
    pts = per_size.select(
        "bs", "n_blocks", "mean_rs",
        lnb.alias("qx"),
        F.floor(F.log(F.col("mean_rs")) * F.lit(1e9)).cast("bigint").alias(
            "qy"
        ),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qx")).alias("sxx"),
    )
    h = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    hrow = mom.select(
        (F.floor(h * F.lit(1e9)) / F.lit(1e9)).alias("hurst")
    )
    return pts.select(
        F.col("bs").cast("int").alias("block_size"), "n_blocks", "mean_rs"
    ).crossJoin(F.broadcast(hrow)).orderBy("block_size")


def ccf(
    daily: DataFrame,
    idx_col: str,
    a_col: str,
    b_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """C94 — cross-correlation function between two aligned regular
    series at lags -max_lag..max_lag: Pearson r between (a_t,
    b_{t+lag}) over all aligned index pairs. Positive-lag peaks mean
    series `a` LEADS `b` (a's moves show up in b `lag` steps later)
    — the lead/lag dependence diagnostic behind demand-transfer,
    marketing-response, and sensor-alignment analyses; the
    two-series generalization of C40's ACF.

    Cross-engine exactness: identical to acf — values quantize to
    floor(x*1e6) BIGINTs, cross/square moments fold as exact
    decimal(38,0) integer products, and the Pearson formula runs the
    same double-op sequence in both engines.

    Plan: the lagged pairing equi-joins the calendar-bounded daily
    frame against itself shifted by an exploded lag array (broadcast
    — the daily frame stays a few hundred rows at any corpus size);
    moments are one partial-agg shuffle of 2*max_lag+1 groups.
    """
    base = daily.select(
        F.col(idx_col).alias("i"),
        F.floor(F.col(a_col) * F.lit(1e6)).cast("bigint").alias("qa"),
        F.floor(F.col(b_col) * F.lit(1e6)).cast("bigint").alias("qb"),
    )
    lags = base.select(
        "i",
        "qa",
        F.explode(F.expr(f"sequence({-max_lag}, {max_lag})")).alias("lag"),
    )
    other = base.select(F.col("i").alias("i_b"), F.col("qb").alias("qbs"))
    pairs = lags.join(
        F.broadcast(other), F.col("i") + F.col("lag") == F.col("i_b")
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qa").alias("sx"),
        F.sum("qbs").alias("sy"),
        F.sum(F.col("qa").cast("decimal(38,0)") * F.col("qbs")).alias("sxy"),
        F.sum(F.col("qa").cast("decimal(38,0)") * F.col("qa")).alias("sxx"),
        F.sum(F.col("qbs").cast("decimal(38,0)") * F.col("qbs")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    syy = F.col("syy").cast("double") / F.lit(1e12)
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return mom.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        r.alias("ccf"),
    )


def spectral_entropy(
    daily: DataFrame, idx_col: str, value_col: str, max_period: int = 16
) -> DataFrame:
    """C95 — trig-free folded-phase spectrum + spectral entropy of a
    regular series: for each candidate period p in 2..max_period,
    fold the series by t mod p and take the between-phase sum of
    squares (the ANOVA numerator — high when the series really
    repeats every p steps); normalize the 15 powers to weights and
    report their Shannon entropy. Low entropy = one dominant cycle
    (strong periodicity), high = broadband/noise — the signal-
    texture diagnostic complementing C78's ACF-argmax period pick,
    without cos/sin (whose ulp behavior differs across engines).

    Exactness: per-(p, phase) counts/sums are exact ints; each
    phase's contribution quantizes to floor(n_k*(m_k-gm)^2*1e6)
    before the order-free integer fold; weights are exact-int
    divisions; entropy folds floor(w*ln(w)*1e9) micro-nats.

    Plan: one explode by the 15-period array, one (p, phase)
    partial-agg shuffle (partitions bounded by p*max_period), and
    two broadcast 1-row joins for the normalizers. The daily frame
    is calendar-bounded, so every stage is flat-cost at any corpus
    size.
    """
    q = F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint")
    base = daily.select(F.col(idx_col).alias("i"), q.alias("q"))
    folded = base.select(
        "i", "q", F.explode(F.expr(f"sequence(2, {max_period})")).alias("p")
    ).select("p", (F.col("i") % F.col("p")).alias("k"), "q")
    phases = folded.groupBy("p", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("q").alias("sk"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("q").alias("ss"),
    )
    mk = F.col("sk").cast("double") / F.lit(1e6) / F.col("nk").cast("double")
    gm = F.col("ss").cast("double") / F.lit(1e6) / F.col("nn").cast("double")
    qk = F.floor(
        F.col("nk").cast("double") * ((mk - gm) * (mk - gm)) * F.lit(1e6)
    ).cast("bigint")
    perp = (
        phases.join(F.broadcast(tot))
        .select("p", qk.alias("qk"))
        .groupBy("p")
        .agg(F.sum("qk").alias("v"))
    )
    wsum = perp.agg(F.sum("v").alias("w_all"))
    w = F.col("v").cast("double") / F.col("w_all").cast("double")
    weighted = perp.join(F.broadcast(wsum)).select(
        "p",
        (F.col("v").cast("double") / F.lit(1e6)).alias("between_var"),
        w.alias("weight"),
        F.when(
            F.col("v") > 0, F.floor(w * F.log(w) * F.lit(1e9)).cast("bigint")
        )
        .otherwise(F.lit(0))
        .alias("qe"),
    )
    ent = weighted.agg(
        (-F.sum("qe").cast("double") / F.lit(1e9)).alias("entropy")
    )
    return (
        weighted.join(F.broadcast(ent))
        .select(
            F.col("p").cast("int").alias("period"),
            "between_var",
            "weight",
            "entropy",
        )
        .orderBy("period")
    )


def ar1_halflife(
    daily: DataFrame, idx_col: str, key_col: str, value_col: str
) -> DataFrame:
    """C96 — per-key AR(1) persistence fit on a daily series: phi is
    the lag-1 OLS slope (x_t on x_{t-1}), and the mean-reversion
    half-life is -ln(2)/ln(phi) for 0 < phi < 1 (NULL otherwise —
    random-walk or oscillating series have no finite half-life).
    The Ornstein-Uhlenbeck-style "how fast does a shock decay"
    readout used for inventory smoothing and anomaly decay windows;
    complements C93's Hurst (long memory) with short-memory decay.

    Exactness: moments fold quantized floor(x*1e6) ints with exact
    decimal(38,0) cross-products; phi is one fixed-order double
    expression; the half-life snaps to 1e-6 after the ln ratio to
    absorb last-ulp libm divergence.

    Plan: per-key daily frames are calendar-bounded; the lag pairing
    is a broadcast self-join on (key, day+1); moments are a |keys|-
    group partial agg.
    """
    q = F.floor(F.col(value_col) * F.lit(1e6)).cast("bigint")
    base = daily.select(
        F.col(key_col).alias("k"), F.col(idx_col).alias("i"), q.alias("qx")
    )
    nxt = base.select(
        F.col("k").alias("k2"),
        F.col("i").alias("i2"),
        F.col("qx").alias("qy"),
    )
    pairs = base.join(
        F.broadcast(nxt),
        (F.col("k") == F.col("k2")) & (F.col("i") + 1 == F.col("i2")),
    )
    mom = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qx")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    phi = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    out = mom.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n_pairs"),
        phi.alias("phi"),
    )
    hl = F.floor(
        -F.log(F.lit(2.0)) / F.log(F.col("phi")) * F.lit(1e6)
    ) / F.lit(1e6)
    return out.select(
        key_col,
        "n_pairs",
        "phi",
        F.when(
            (F.col("phi") > 0) & (F.col("phi") < 1), hl
        ).alias("halflife_days"),
    )


def burstiness_index(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str = "event_id",
    min_gaps: int = 5,
) -> DataFrame:
    """C100 — Goh-Barabasi burstiness of per-key interarrival times:
    B = (sigma - mu)/(sigma + mu) over the gaps between consecutive
    events. B ~ -1 is a metronome (schedulers, heartbeats), B ~ 0 a
    Poisson process (organic traffic), B -> 1 heavy bursts (humans,
    incidents, scrapers). Separates WHO is bursty — complements
    C41's WHEN (hour flags) and C26's single-gap screen.

    Exactness: gaps quantize to whole seconds (keeps the square
    fold far below 2^53 — see parity.py trap #2); moments are exact
    ints; mu/sigma/B are one fixed-order double chain.

    Plan: one key-window shuffle for the lag, one per-key aggregate.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    gaps = (
        df.select(
            F.col(key_col),
            F.floor(
                (_us(ts_col) - F.lag(_us(ts_col)).over(w)) / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    mom = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").alias("sx"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("sxx"),
    ).where(F.col("n") >= min_gaps)
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / n
    sig = F.sqrt(n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")) / n
    return mom.select(
        key_col,
        F.col("n").alias("n_gaps"),
        mu.alias("mean_gap_s"),
        sig.alias("std_gap_s"),
        ((sig - mu) / (sig + mu)).alias("burstiness"),
    )
