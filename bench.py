"""Headline benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}.
"""

from __future__ import annotations

import json
import os
import time

import __spark_entry__ as entry_mod
from icecube_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("icecube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not first-touch classloading.
    if qs:
        next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        # noop sink: materializes every column of every row, no driver collect
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "icecube_spark_total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
