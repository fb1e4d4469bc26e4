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
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entry_mod
from icecube_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("icecube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # warm the JVM + parquet footers once so the throughput pass doesn't
    # fold first-touch classloading into query time.
    if qs:
        next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # noop sink everywhere: materializes every column of every row,
    # no driver collect.
    def run(item: tuple) -> None:
        _, fn = item
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    t_all = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(run, qs.items()))
    total_concurrent = round(time.perf_counter() - t_all, 3)

    timings: dict[str, float] = {}
    t_seq = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total_sequential = round(time.perf_counter() - t_seq, 3)

    print(
        json.dumps(
            {
                "metric": "icecube_spark_total_query_wall",
                "value": total_concurrent,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "mode": (
                    "value = wall for all queries submitted concurrently"
                    " (8 threads, shared scheduler); queries = per-query"
                    " warm sequential latency"
                ),
                "sequential_total": total_sequential,
                "n_queries": len(qs),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
