"""Headline benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}.

Two passes measure two different things, both reported:
- value (headline): wall-clock to run ALL queries submitted
  concurrently (8 driver threads, Spark's scheduler interleaves
  stages across the 32 cores). This is engine throughput — how a
  cluster actually runs a workload of independent queries.
- queries: per-query steady-state latency from a sequential pass run
  after the JVM/codegen is warm (JMH-style: excludes one-time Janino
  compilation, measures the plan).

Crash-proof by construction: every query runs inside its own
try/except in both passes and failures land in an "errors" map; the
JSON line is printed unconditionally (one broken query must never
zero out the round's perf signal).
"""

from __future__ import annotations

import json
import os
import signal
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

_concurrent_times: dict[str, float] = {}

result: dict = {
    "metric": "icecube_spark_total_query_wall",
    "value": None,
    "unit": "sec",
    "queries": {},
    "errors": {},
    "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
}


def main() -> None:
    sf_dir = result["sf"]
    import __spark_entry__ as entry_mod
    from icecube_spark.session import get_spark

    spark = get_spark("icecube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    errors: dict[str, str] = result["errors"]

    # noop sink everywhere: materializes every column of every row,
    # no driver collect.
    def run(item: tuple) -> None:
        name, fn = item
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # contended wall time — only ever surfaces as the SIGTERM
            # salvage fallback when the sequential pass never ran
            _concurrent_times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, never re-raise
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # warm the JVM + parquet footers once so the throughput pass doesn't
    # fold first-touch classloading into query time.
    if qs:
        run(next(iter(qs.items())))

    t_all = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(run, qs.items()))
    result["value"] = round(time.perf_counter() - t_all, 3)

    timings: dict[str, float] = result["queries"]
    t_seq = time.perf_counter()
    for name, fn in qs.items():
        if name in errors:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    result["sequential_total"] = round(time.perf_counter() - t_seq, 3)
    result["n_queries"] = len(qs)
    result["n_errors"] = len(errors)
    result["mode"] = (
        "value = wall for all queries submitted concurrently"
        " (8 threads, shared scheduler); queries = per-query"
        " warm sequential latency"
    )
    spark.stop()


def _emit() -> None:
    # Key order matters (see below); shared by the normal exit path and
    # the SIGTERM salvage path.
    bulky = {"queries", "errors"}
    out = {k: result[k] for k in result if k in bulky}
    out.update({k: result[k] for k in result if k not in bulky})
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):  # noqa: ANN001
    # A harness timeout must still yield the round's perf signal:
    # whatever completed so far is printed as a partial result. If the
    # warm sequential pass never ran, fall back to the contended
    # concurrent-pass walls rather than an empty map.
    result["partial"] = True
    if not result["queries"] and _concurrent_times:
        result["queries"] = dict(_concurrent_times)
        result["queries_are_contended_walls"] = True
    _emit()
    # skip the finally-block emit (ONE json line is the contract)
    os._exit(0)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_term)
    try:
        main()
    except Exception:
        result["fatal"] = traceback.format_exc()[-2000:]
    finally:
        # Key order matters: harnesses that keep only the tail of the
        # output line must still see the headline scalars, so the big
        # per-query map goes first and every summary field goes last.
        bulky = {"queries", "errors"}
        out = {k: result[k] for k in result if k in bulky}
        out.update({k: result[k] for k in result if k not in bulky})
        print(json.dumps(out))
