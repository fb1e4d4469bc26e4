"""Headline benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (harness-proof by construction):

- stdout, one line per completed query, flushed immediately:
  ``{"q": name, "sec": warm_latency}``  (progress stream; a harness
  that kills the process mid-run still has every completed timing on
  stdout and in BENCH_FULL.json).
- stdout, LAST line: ONE compact JSON summary
  ``{"metric": ..., "value": total_sec, "unit": "sec", "queries":
  {<slowest keys, trimmed to fit>}, "sf": ...}`` kept under ~1900
  chars so a harness that stores only the tail of the output can still
  parse the whole line (the r1-r4 drivers stored a 2000-char tail and
  never managed to parse the old 15 KB line).
- ``BENCH_FULL.json`` in the repo root: the complete result — every
  per-query warm latency, every error, both pass totals. Rewritten
  incrementally every 20 queries and on SIGTERM, so a timeout cannot
  lose more than a few seconds of signal.

Two passes measure two different things:
- sequential warm pass (FIRST, after a small JVM warmup): per-query
  steady-state latency, JMH-style — this is the signal BASELINE.md
  tracks per key, so it runs before anything can time out.
- concurrent pass (8 driver threads): wall-clock for the whole
  workload submitted at once — engine throughput, how a cluster runs
  independent queries. Skipped (with totals preserved) if the
  time budget is nearly spent.

Every query runs inside its own try/except in both passes; failures
land in an "errors" map and never zero out the round's perf signal.
"""

from __future__ import annotations

import json
import os
import signal
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

FULL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
# Stay under the harness kill window (r4 ran 836 s total and survived;
# the SIGTERM salvage path emits whatever completed if we misjudge).
# Sequential (the per-key signal) runs first and is never truncated
# while budget remains; concurrent only starts with >90 s to spare.
TIME_BUDGET = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "820"))
_T_START = time.monotonic()

result: dict = {
    "metric": "icecube_spark_total_query_wall",
    "value": None,
    "unit": "sec",
    "queries": {},
    "errors": {},
    "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
}


def _write_full() -> None:
    try:
        tmp = FULL_PATH + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(result, fh, indent=0)
        os.replace(tmp, FULL_PATH)
    except OSError:
        pass  # read-only checkout must not kill the bench


def _budget_left() -> float:
    return TIME_BUDGET - (time.monotonic() - _T_START)


def main() -> None:
    sf_dir = result["sf"]
    import __spark_entry__ as entry_mod
    from icecube_spark.session import get_spark

    spark = get_spark("icecube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    result["n_queries"] = len(qs)
    errors: dict[str, str] = result["errors"]
    timings: dict[str, float] = result["queries"]

    # Freshness rotation: a truncated run must refresh the STALEST
    # readings, not the same head every round. The previous
    # BENCH_FULL.json carries a per-key last_timed run counter; keys
    # are timed least-recently-timed-first and untimed keys inherit
    # their previous reading (the "carried" set), so every key always
    # has a timing with bounded staleness.
    prev: dict = {}
    try:
        with open(FULL_PATH) as fh:
            prev = json.load(fh)
    except Exception:
        prev = {}
    if prev.get("sf") != result["sf"]:
        # a different scale factor's timings are not comparable —
        # start the rotation fresh rather than carrying them
        prev = {}
    prev_timings: dict[str, float] = {
        k: v for k, v in (prev.get("queries") or {}).items() if k in qs
    }
    prev_last: dict[str, int] = {
        k: v for k, v in (prev.get("last_timed") or {}).items() if k in qs
    }
    # Legacy BENCH_FULL (pre-rotation): a key with a timing was timed
    # in run 0; keys with neither lead the rotation at -1.
    for k in prev_timings:
        prev_last.setdefault(k, 0)
    run_seq = int(prev.get("run_seq") or 0) + 1
    result["run_seq"] = run_seq
    result["last_timed"] = dict(prev_last)
    # per-key best (min) reading across runs: the spike detector
    # compares against this, not the last reading, so a stored spike
    # can't poison its own baseline
    best: dict[str, float] = {
        k: v for k, v in (prev.get("best") or prev_timings).items() if k in qs
    }
    for k, v in prev_timings.items():
        best[k] = min(best.get(k, v), v)
    result["best"] = best
    carried = set(prev_timings)
    timings.update(prev_timings)

    # noop sink everywhere: materializes every column of every row,
    # no driver collect.
    def run_once(name, fn) -> float | None:
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # record, never re-raise
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return None
        # a success clears any earlier transient failure (warmup shot,
        # prior pass) so a key with a valid timing is never branded an
        # error / evicted from the concurrent pass
        errors.pop(name, None)
        return round(time.perf_counter() - t0, 3)

    # Least-recently-timed first (never-timed keys lead), name as the
    # deterministic tiebreak — EXCEPT keys whose carried reading sits
    # far above their cross-run best (a contention spike the in-run
    # re-measure budget didn't reach): those retime FIRST so a bad
    # reading never survives a whole rotation cycle.
    def _stale_spike(name: str) -> bool:
        v, b = timings.get(name), best.get(name)
        return (
            v is not None and b is not None and v > 3 * b and v - b > 1.5
        )

    items = sorted(
        qs.items(),
        key=lambda kv: (
            not _stale_spike(kv[0]), prev_last.get(kv[0], -1), kv[0]
        ),
    )

    # JVM/codegen/parquet-footer warmup on three FIXED staging-free
    # queries so the first measured latencies don't fold in one-time
    # Janino work. Fixed, not the rotation head: a staging-dependent
    # warmup key would build the staged tables here and silently zero
    # the staging_s timers BASELINE.md uses as host-factor controls.
    for name in ("q1_pricing_summary", "source_mix", "sar_band_math"):
        if name in qs:
            run_once(name, qs[name])
    # Iterative-plan codegen prewarm: one tiny-SF pagerank compiles the
    # same generated classes the sf0.1 key reuses, so its single
    # measured shot stops carrying 5 iterations of Janino first-touch.
    # Same treatment for the IVF probe curve (r9): its flat-codegen
    # distance folds are the largest generated methods in the registry
    # and its isolated warmup-vs-steady gap is ~4x pure compile.
    # Their cost is timed into staging_s (r9 VERDICT item 7) so every
    # warm-up the bench pays is visible in the one-line JSON.
    prewarm_s: dict[str, float] = {}

    def _prewarm(pname, run) -> None:
        t0 = time.perf_counter()
        try:
            run()
            prewarm_s[f"prewarm_{pname}"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            errors[f"warmup:{pname}"] = f"{type(exc).__name__}: {exc}"[:200]

    tiny = "/root/testdata/sf0.001"

    def _pagerank_prewarm() -> None:
        from icecube_spark.queries import pipeline_queries as _pq
        from icecube_spark.queries.analytics import (
            release_copurchase_staging as _rel_cp,
        )

        _pq.part_pagerank(spark, tiny).write.format("noop").mode(
            "overwrite"
        ).save()
        _rel_cp(tiny)

    def _probe_curve_prewarm() -> None:
        from icecube_spark.queries import llm_queries as _lqw

        _lqw.ivf_probe_curve(spark, tiny).write.format("noop").mode(
            "overwrite"
        ).save()
        _lqw.release_staging(tiny)

    _prewarm("pagerank", _pagerank_prewarm)
    _prewarm("probe_curve", _probe_curve_prewarm)

    # Pre-build the session-staged artifacts a real deployment
    # materializes before the query campaign (IVF index, dedup pair
    # tables). Their cost is reported separately in staging_s so the
    # per-key numbers reflect steady state instead of charging the
    # whole one-time build to whichever key touches it first.
    staging: dict[str, float] = dict(prewarm_s)
    t_stage = time.perf_counter() - sum(prewarm_s.values())
    try:
        from icecube_spark.queries import llm_queries as _lq

        def _stage(sname, build) -> None:
            t0 = time.perf_counter()
            try:
                build()
                staging[sname] = round(time.perf_counter() - t0, 3)
            except Exception as exc:
                errors[f"staging:{sname}"] = f"{type(exc).__name__}: {exc}"[:200]

        _stage("corpus", lambda: [d.count() for d in _lq.staged_corpus(spark, sf_dir)])
        _stage("collapse", lambda: [d.count() for d in _lq.staged_collapse(spark, sf_dir)])
        _stage("candidates", lambda: _lq.staged_candidates(spark, sf_dir).count())
        _stage("minhash_pairs", lambda: _lq.staged_minhash_pairs(spark, sf_dir).count())
        _stage("jaccard_pairs", lambda: _lq.staged_jaccard_pairs(spark, sf_dir, 0.3).count())
        _stage("ivf_index", lambda: _lq.staged_ivf_index(spark, sf_dir)[0].count())
        _stage("tfidf_fit", lambda: _lq.staged_tfidf_fit(spark, sf_dir))

        from icecube_spark.queries import analytics as _an

        _stage(
            "copurchase",
            lambda: [d.count() for d in _an.staged_copurchase(spark, sf_dir)],
        )
    except Exception as exc:  # staging must never kill the bench
        errors["staging"] = f"{type(exc).__name__}: {exc}"[:200]
    result["staging_s"] = staging
    result["staging_total"] = round(time.perf_counter() - t_stage, 3)

    # Cache ownership for the measurement pass: each key's DataFrames
    # die when run_once returns, but reference cycles keep their py4j
    # handles (and so the JVM-side persisted/checkpoint blocks) alive
    # until a full Python GC. A per-key gc.collect() releases them so
    # Spark's ContextCleaner unpersists leaked blocks through its own
    # throttled async path — staged tables stay cached because the
    # staging stores hold live references. (Tried and reverted:
    # force-unpersisting every non-staged RDD id after each key —
    # the synchronous block-removal storm contended with the Arrow
    # worker keys and cost more than the leaks did.)
    def sweep_cache() -> None:
        try:
            import gc as _gc

            _gc.collect()
        except Exception:
            pass

    # --- pass 1 (the per-key signal BASELINE.md tracks): sequential warm ---
    # Reserve enough tail budget that the concurrent pass still runs on
    # a ~1.5x-slow host: sequential truncation just means more carried
    # readings (refreshed next round by the LRU rotation above).
    conc_reserve = float(os.environ.get("SPARK_GRAFT_CONC_RESERVE", "200"))
    # Single-shot spikes (GC shadow / scheduler contention, r6:
    # dedup_ngram_jaccard 23.5 s vs 2.6 s isolated) get ONE re-measure
    # after a cache sweep; bounded total so a genuinely slow host
    # cannot burn the budget re-measuring everything.
    respike_budget = float(
        os.environ.get("SPARK_GRAFT_RESPIKE_BUDGET", "60")
    )
    n_respiked = 0
    t_seq = time.perf_counter()
    for i, (name, fn) in enumerate(items):
        if _budget_left() < conc_reserve + 15:
            result["seq_truncated_at"] = i
            break
        sec = run_once(name, fn)
        if sec is not None:
            prevv = best.get(name)
            spiked = (
                (prevv is not None and sec > 3 * prevv and sec - prevv > 1.5)
                # no baseline yet: anything this slow warrants one
                # confirmation shot before it becomes the baseline
                or (prevv is None and sec > 8)
            )
            if (
                spiked
                and respike_budget > 0
                and _budget_left() > conc_reserve + 30 + sec
            ):
                sweep_cache()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                second = run_once(name, fn)
                if second is not None:
                    respike_budget -= second
                    n_respiked += 1
                    sec = min(sec, second)
                else:
                    # first shot succeeded and stands: a failed
                    # confirmation shot must not brand the key an
                    # error (or evict it from the concurrent pass)
                    errors.pop(name, None)
            timings[name] = sec
            best[name] = min(best.get(name, sec), sec)
            result["last_timed"][name] = run_seq
            carried.discard(name)
            print(json.dumps({"q": name, "sec": sec}), flush=True)
        elif name in carried:
            # a carried reading must not survive a failed re-measure:
            # this run produced no measurement, so the key reports as
            # an error — not as a stale timing the n_timed/n_carried
            # split would misclassify. The prior reading is parked
            # under stale_errored (with the run it was last timed in)
            # so one transient host failure doesn't erase a previously
            # valid measurement from the record entirely.
            carried.discard(name)
            old = timings.pop(name, None)
            old_seq = result["last_timed"].pop(name, None)
            if old is not None:
                result.setdefault("stale_errored", {})[name] = {
                    "sec": old, "last_timed": old_seq,
                }
        sweep_cache()
        if i % 20 == 19:
            result["carried"] = sorted(carried)
            _write_full()
            # periodic full JVM GC on top of the per-key Python GC:
            # clears heap-pressure shadows on tail-of-registry keys
            # (the r5 part_triangles artifact)
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    result["sequential_total"] = round(time.perf_counter() - t_seq, 3)
    result["carried"] = sorted(carried)
    result["n_respiked"] = n_respiked
    _write_full()

    # --- pass 2: throughput (all queries submitted concurrently) ---
    if _budget_left() > 90:
        def run_conc(item) -> None:
            name, fn = item
            if name not in errors:
                run_once(name, fn)

        t_all = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(run_conc, items))
        result["value"] = round(time.perf_counter() - t_all, 3)
    else:
        result["concurrent_skipped"] = "time budget"
        result["value"] = result["sequential_total"]
    result["n_errors"] = len(errors)
    result["mode"] = (
        "queries = per-query warm sequential latency (full map in"
        " BENCH_FULL.json; keys in 'carried' inherit their previous"
        " run's reading, freshness in 'last_timed'); value = wall for"
        " all queries submitted concurrently (8 threads, shared"
        " scheduler)"
    )
    _write_full()
    spark.stop()


def _summary_line() -> str:
    """One compact JSON line that survives tail-window truncation.

    Headline scalars plus as many of the slowest per-query timings as
    fit in ~1900 chars; the complete map lives in BENCH_FULL.json.
    """
    scalars = {
        k: v
        for k, v in result.items()
        if k not in ("queries", "errors", "last_timed", "carried", "best")
    }
    scalars["queries_full"] = "BENCH_FULL.json"
    n_carried = len(result.get("carried") or ())
    scalars["n_timed"] = len(result["queries"]) - n_carried
    scalars["n_carried"] = n_carried
    if result["errors"]:
        scalars["error_keys"] = sorted(result["errors"])[:10]
    ranked = sorted(result["queries"].items(), key=lambda kv: -kv[1])
    out = dict(scalars)
    out["queries"] = {}
    line = json.dumps(out)
    for name, sec in ranked:
        trial = dict(out["queries"])
        trial[name] = sec
        cand = dict(scalars)
        cand["queries"] = trial
        s = json.dumps(cand)
        if len(s) > 1900:
            break
        out["queries"] = trial
        line = s
    return line


_emitted = False


def _emit() -> None:
    global _emitted
    if _emitted:
        return
    _emitted = True
    if result.get("value") is None:
        # killed before the concurrent pass finished: the summary line
        # must still carry a number — fall back to the sequential wall
        # (or elapsed time if even that is missing)
        seq = result.get("sequential_total")
        if seq:
            result["value"] = seq
            result["value_fallback"] = "sequential_total"
        else:
            result["value"] = round(time.monotonic() - _T_START, 3)
            result["value_fallback"] = "elapsed"
    # carried is only refreshed every 20 keys in the loop — recompute
    # here so a mid-stride SIGTERM doesn't report freshly-timed keys
    # as carried (last_timed is already per-key correct)
    try:
        lt, rs = result.get("last_timed") or {}, result.get("run_seq")
        result["carried"] = sorted(
            k for k in result["queries"] if lt.get(k) != rs
        )
    except Exception:
        pass
    _write_full()
    print(_summary_line(), flush=True)


def _on_term(signum, frame):  # noqa: ANN001
    # A harness timeout must still yield the round's perf signal:
    # everything completed so far is already on stdout and in
    # BENCH_FULL.json; emit the summary line and exit.
    result["partial"] = True
    _emit()
    os._exit(0)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_term)
    try:
        main()
    except Exception:
        result["fatal"] = traceback.format_exc()[-2000:]
    finally:
        _emit()
