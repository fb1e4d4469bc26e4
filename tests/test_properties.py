"""Property-based tests (hypothesis): operator semantics vs
brute-force reference implementations on adversarial generated data —
duplicate timestamps, empty sides, single-key pileups, gap extremes.
Complements the oracle tests, which only see the fixed testdata
distributions."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icecube_spark.operators.asof import asof_join
from icecube_spark.operators.pipeline import connected_components
from icecube_spark.operators.timeseries import sessionize

# small domains force collisions (same key, same ts) so ties and
# dense groups are exercised, not just sparse random data
_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=20)

_events = st.lists(st.tuples(_keys, _ts), min_size=0, max_size=25)
_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    ),
    min_size=1,
    max_size=20,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_asof(
    left: pd.DataFrame,
    right: pd.DataFrame,
    direction: str = "backward",
    tolerance: int | None = None,
) -> list:
    out = []
    for _, lr in left.iterrows():
        cand = right[right.k == lr.k]
        if direction == "backward":
            cand = cand[cand.t <= lr.t]
        elif direction == "forward":
            cand = cand[cand.t >= lr.t]
        if tolerance is not None:
            cand = cand[(cand.t - lr.t).abs() <= tolerance]
        if len(cand):
            if direction == "nearest":
                # min distance, prefer backward, then LARGEST rv
                cand = cand.assign(
                    dist=(cand.t - lr.t).abs(), back=(cand.t <= lr.t).astype(int)
                )
                cand = cand[cand.dist == cand.dist.min()]
                cand = cand[cand.back == cand.back.max()]
                best = cand.sort_values("rv").iloc[-1]
            else:
                best = cand.sort_values(["t", "rv"]).iloc[
                    -1 if direction == "backward" else 0
                ]
                if direction == "forward":
                    at_min = cand[cand.t == cand.t.min()]
                    best = at_min.sort_values("rv").iloc[-1]
            out.append((lr.k, lr.t, lr.lv, best.rv))
        else:
            out.append((lr.k, lr.t, lr.lv, None))
    return sorted(out, key=lambda x: (x[0], x[1], x[2]))


@given(left=_events, right=_events, mode=st.sampled_from(
    [("backward", None), ("forward", None), ("nearest", None), ("nearest", 3),
     ("backward", 2), ("forward", 2)]
))
@_slow
def test_asof_join_matches_bruteforce(spark, left, right, mode):
    direction, tolerance = mode
    lpdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lv"]
    )
    rpdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], columns=["k", "t", "rv"]
    )
    ldf = spark.createDataFrame(lpdf) if len(lpdf) else spark.createDataFrame(
        [], "k long, t long, lv long"
    )
    rdf = spark.createDataFrame(rpdf) if len(rpdf) else spark.createDataFrame(
        [], "k long, t long, rv long"
    )
    got = asof_join(
        ldf, rdf, "t", "t", "k", "k", tiebreak="rv",
        direction=direction, tolerance=tolerance,
    ).toPandas()
    got_rows = sorted(
        (r.k, r.t, r.lv, None if pd.isna(r.rv) else int(r.rv))
        for r in got.itertuples()
    )
    want = [
        (k, t, lv, None if rv is None else int(rv))
        for k, t, lv, rv in _brute_asof(lpdf, rpdf, direction, tolerance)
    ]
    assert got_rows == want


def _brute_components(edges: list) -> dict:
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}

    def find(n):
        while label[n] != n:
            label[n] = label[label[n]]
            n = label[n]
        return n

    for a, b in edges:
        ra, rb = find(a), find(b)
        label[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@given(edges=_edges)
@_slow
def test_connected_components_matches_unionfind(spark, edges):
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).drop_duplicates()
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == _brute_components(edges)


def _brute_sessions(rows: list, gap: int) -> list:
    """session count + sizes per user for gap-threshold sessionization."""
    out = []
    by_user: dict = {}
    for k, t in rows:
        by_user.setdefault(k, []).append(t)
    for k, ts in by_user.items():
        ts.sort()
        n_sessions = 1
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > gap:
                n_sessions += 1
        out.append((k, n_sessions))
    return sorted(out)


@given(rows=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=25))
@_slow
def test_sessionize_session_count_matches_bruteforce(spark, rows):
    gap_min = 5
    pdf = pd.DataFrame(
        [(k, pd.Timestamp(t * 60, unit="s")) for k, t in rows],
        columns=["user_id", "ts"],
    )
    df = spark.createDataFrame(pdf)
    got = (
        sessionize(df, "ts", "user_id", gap_minutes=gap_min)
        .groupBy("user_id")
        .agg({"session_id": "max"})
        .collect()
    )
    got_counts = sorted((r[0], r[1]) for r in got)  # session_id is 1-based
    assert got_counts == _brute_sessions(rows, gap_min)


@given(
    words=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e f"]), min_size=1, max_size=12
    )
)
@_slow
def test_repetition_top_gram_matches_counter(spark, words):
    from collections import Counter

    from icecube_spark.operators.text import repetition_stats

    text = " ".join(words)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    got = repetition_stats(df, "doc_id", "text").collect()[0]
    # brute force on the same normalization (lowercase, single-space)
    toks = text.lower().split()
    grams = (
        [" ".join(toks)]
        if len(toks) < 2
        else [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    )
    assert got.top_2gram_n == max(Counter(grams).values())
    assert got.n_words == len(toks)


_states = st.sampled_from(["a", "b", "c"])
_stream = st.lists(
    st.tuples(_keys, _ts, _states), min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1])
)
_probes = st.lists(st.tuples(_keys, _ts), min_size=1, max_size=15)


@given(stream=_stream, probes=_probes)
@_slow
def test_pit_join_matches_bruteforce(spark, stream, probes):
    """Point-in-time join == per-probe linear scan over the key's
    SCD2 intervals, including open intervals and uncovered probes."""
    from pyspark.sql import functions as F

    from icecube_spark.operators.timeseries import pit_join, scd2_intervals

    from datetime import datetime, timezone

    ev = spark.createDataFrame(
        [
            (k, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), s, i)
            for i, (k, t, s) in enumerate(stream)
        ],
        "k long, ts timestamp, state string, eid long",
    )
    iv = scd2_intervals(ev, "k", "ts", "state", "eid")
    pr = spark.createDataFrame(
        [(k, t * 1_000_000, i) for i, (k, t) in enumerate(probes)],
        "k long, t_us long, pid long",
    )
    got = {
        r["pid"]: r["state"]
        for r in pit_join(
            pr, iv.withColumnRenamed("k", "ivk"), "k", "t_us", "ivk"
        ).collect()
    }

    ivs = iv.collect()
    for i, (k, t) in enumerate(probes):
        t_us = t * 1_000_000
        want = None
        for r in ivs:
            if (
                r["k"] == k
                and r["valid_from_us"] <= t_us
                and (r["valid_to_us"] is None or t_us < r["valid_to_us"])
            ):
                want = r["state"]
        assert got[i] == want, (i, k, t, got[i], want)


@given(rows=st.lists(st.tuples(_ts, st.integers(0, 100)), min_size=2, max_size=30, unique_by=lambda r: r[0]))
@_slow
def test_m4_bucket_invariants(spark, rows):
    """M4: every bucket's min<=first/last<=max; bucket point counts sum
    to the input count; min/max match a pandas groupby."""
    import numpy as np

    from icecube_spark.operators.timeseries import m4_downsample

    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [
            ("k", i, float(v), datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None))
            for i, (t, v) in enumerate(rows)
        ],
        "key string, eid long, value double, ts timestamp",
    )
    out = m4_downsample(df, "ts", "key", "value", "eid", n_buckets=5).collect()
    assert sum(r["n_points"] for r in out) == len(rows)
    for r in out:
        assert r["min_value"] <= r["first_value"] <= r["max_value"]
        assert r["min_value"] <= r["last_value"] <= r["max_value"]
    ts = np.array([t for t, _ in rows], dtype=np.int64) * 1_000_000
    vs = np.array([v for _, v in rows], dtype=float)
    t0, t1 = ts.min(), ts.max()
    bucket = np.minimum(4, np.floor((ts - t0) * 5 / (t1 - t0 + 1))).astype(int)
    for r in out:
        mask = bucket == r["bucket"]
        assert mask.sum() == r["n_points"]
        assert vs[mask].min() == r["min_value"]
        assert vs[mask].max() == r["max_value"]


_parts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),   # price (small domain → ties)
        st.integers(min_value=0, max_value=10),   # size
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_parts)
@_slow
def test_skyline_matches_brute_force(spark, rows):
    """B35: the two-stage prefix-max sweep equals the quadratic
    dominance definition on adversarial data (price ties, duplicate
    points, single-row frames)."""
    from icecube_spark.queries.analytics import _skyline_prune
    from pyspark.sql import functions as F2

    pdf = pd.DataFrame(
        [
            {"p_partkey": i, "p_name": f"p{i}", "p_retailprice": p, "p_size": s}
            for i, (p, s) in enumerate(rows)
        ]
    )
    df = spark.createDataFrame(pdf)
    local = _skyline_prune(
        df.withColumn("bucket", F2.pmod(F2.hash("p_partkey"), F2.lit(4)).cast("int")),
        "bucket",
    ).drop("bucket")
    got = sorted(_skyline_prune(local).toPandas()["p_partkey"])

    want = []
    for i, (p, s) in enumerate(rows):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for q, t in rows
        )
        if not dominated:
            want.append(i)
    assert got == sorted(want)


_vals = st.lists(
    st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)


@given(vals=_vals)
@_slow
def test_depth_cuts_match_brute_force(spark, vals):
    """P34: the distributed-prefix-sum decile cuts equal the direct
    sorted-scan definition cut_d = min v with running count >=
    ceil(d*N/10), including heavy duplicate pileups."""
    from icecube_spark.operators.pipeline import distributed_depth_cuts

    pdf = pd.DataFrame({"v": vals})
    df = spark.createDataFrame(pdf)
    got = distributed_depth_cuts(df, "v", n_bins=10).collect()[0]["cut_list"]

    import math

    s = sorted(vals)
    n = len(s)
    want = []
    for d in range(1, 10):
        target = math.ceil(d * n / 10)
        want.append(s[target - 1])
    assert list(got) == sorted(want)


_users = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # user
        st.integers(min_value=0, max_value=15),   # day
        st.booleans(),                            # is purchase event
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_users)
@_slow
def test_kaplan_meier_structural_properties(spark, rows):
    """C53: on arbitrary event layouts the KM output is structurally
    sound — neg-log survival is non-negative and non-decreasing in t,
    at-risk counts are non-increasing, and every reported day has at
    least one event."""
    from icecube_spark.operators.timeseries import kaplan_meier
    from pyspark.sql import functions as F2

    pdf = pd.DataFrame(
        [
            {
                "user_id": u,
                "day": d,
                "event_type": "purchase" if p else "view",
            }
            for u, d, p in rows
        ]
    )
    df = spark.createDataFrame(pdf).select(
        "user_id",
        "event_type",
        F2.to_timestamp(
            F2.date_add(
                F2.lit("2024-01-01").cast("date"), F2.col("day").cast("int")
            )
        ).alias("ts"),
    )
    out = kaplan_meier(
        df, "ts", "user_id", F2.col("event_type") == "purchase"
    ).toPandas()
    if len(out) == 0:
        return
    assert (out["n_events"] >= 1).all()
    assert (out["neg_log_survival"] >= 0).all()
    assert out["t_days"].is_monotonic_increasing
    assert out["neg_log_survival"].is_monotonic_increasing
    assert out["n_at_risk"].is_monotonic_decreasing


_li = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # order
        st.integers(min_value=0, max_value=6),   # part
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_li)
@_slow
def test_triangle_census_matches_brute_force(spark, rows):
    """B36: the oriented-join triangle count equals a brute-force
    enumeration of the support-2 co-purchase graph on adversarial
    order/part layouts (dense repeats, singleton orders)."""
    from itertools import combinations

    from icecube_spark.queries.analytics import part_triangles

    pdf = pd.DataFrame(
        [{"l_orderkey": o, "l_partkey": p} for o, p in rows]
    )
    # write a tiny parquet dir shaped like the catalog's lineitem
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(f"{d}/lineitem.parquet")
        # part_triangles only reads lineitem; satisfy catalog.load
        got = part_triangles(spark, d).collect()[0]

    li = {(o, p) for o, p in rows}
    from collections import Counter

    pair_orders = Counter()
    by_order: dict = {}
    for o, p in li:
        by_order.setdefault(o, set()).add(p)
    for o, parts in by_order.items():
        for a, b in combinations(sorted(parts), 2):
            pair_orders[(a, b)] += 1
    edges = {e for e, n in pair_orders.items() if n >= 2}
    nodes = {x for e in edges for x in e}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(v * (v - 1) // 2 for v in deg.values())
    tris = 0
    for a, b, c in combinations(sorted(nodes), 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            tris += 1
    assert got["n_nodes"] == len(nodes)
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tris


_docs_gen = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.sampled_from(["s1", "s2", "s3", "s4"]),
    ),
    min_size=2,
    max_size=40,
)


@given(rows=_docs_gen)
@_slow
def test_mutual_information_structure(spark, rows):
    """F19: quantized MI contributions sum to >= -(cells * 1e-6)
    (true MI is non-negative; floor quantization can only push each
    cell down by < 1e-6 of its mass) and cell counts reproduce the
    input exactly."""
    from icecube_spark.operators.text import mutual_information

    pdf = pd.DataFrame([{"lang": a, "source": b} for a, b in rows])
    out = mutual_information(
        spark.createDataFrame(pdf), "lang", "source"
    ).toPandas()
    assert int(out["n"].sum()) == len(rows)
    assert out["mi_contrib"].sum() >= -len(out) * 1e-6


@given(
    vals=st.lists(
        st.sampled_from([1.0, 1.0, 1.0, 2.5, 7.0]), min_size=1, max_size=20
    )
)
@_slow
def test_feature_binning_degenerate_inputs(spark, vals):
    """P34: constant columns and heavy pileups must not produce NaN
    or NULL bins — every row lands in a bin, totals reconcile, and a
    constant column collapses to bin 0 for both methods."""
    from icecube_spark.operators.pipeline import feature_binning

    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = feature_binning(df, "v", n_bins=10).toPandas()
    assert out["bin"].notna().all()
    for method in ("width", "depth"):
        sub = out[out["method"] == method]
        assert int(sub["n"].sum()) == len(vals)
    if len(set(vals)) == 1:
        assert set(out["bin"]) == {0}
