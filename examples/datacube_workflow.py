"""End-to-end datacube workflow — the Spark twin of the reference's
documented usage (docs/examples: CubeConfig → IceyeProcessGenerateCube
→ inspect → labels → save).

Run: python examples/datacube_workflow.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from icecube_spark import catalog
from icecube_spark.config import CubeConfig
from icecube_spark.cube import Datacube, build_cube
from icecube_spark.operators import temporal
from icecube_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("datacube-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. user config (reference: CubeConfig().load_config(json))
    cfg = CubeConfig.from_dict(
        {
            "start_date": 20240101,
            "end_date": 20240131,
            "min_incidence_angle": 5.0,
            "max_incidence_angle": 95.0,
            "temporal_overlap": False,  # keep latest acquisition per date
        }
    )

    # 2. build the cube from the acquisition catalog
    events = catalog.load(spark, sf_dir, "events")
    cube = build_cube(
        events, cfg, key_col="user_id", ts_col="ts", angle_col="value",
        band_cols=["event_type", "value"],
    )
    print("data variables:", cube.get_data_variables())
    print("dimensions:", cube.get_dimensions())
    print("metadata:", cube.get_metadata())

    # 3. resample onto a 3-day grid with explicit gap layers
    grid = temporal.resample_to_grid(
        cube.df, ts_col="ts", key_col="user_id",
        start="2024-01-01", end="2024-01-30", step_days=3,
        aggs={"n_acq": F.count(F.lit(1))},
    )
    gaps = grid.where(F.col("description") == "temporal_gap").count()
    print(f"grid slots: {grid.count()}, temporal gaps: {gaps}")

    # 4. align labels (reference: labels cube keyed by product_file)
    labels = (
        catalog.load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderpriority")
        .dropDuplicates(["user_id"])
    )
    labeled = cube.df.join(F.broadcast(labels), "user_id", "left").withColumn(
        "label", F.coalesce("o_orderpriority", F.lit("NA"))
    )
    print("labeled layers:", labeled.where(F.col("label") != "NA").count())

    # 5. merge with a second cube, first wins on conflict
    other = Datacube(
        events.where(F.col("value") < 50), "user_id", "ts", ["event_type", "value"]
    )
    merged = cube.merge(other)
    print("merged layers:", merged.df.count())

    # 6. persist as a time-partitioned parquet cube
    with tempfile.TemporaryDirectory() as td:
        cube.to_parquet(f"{td}/cube")
        back = spark.read.parquet(f"{td}/cube")
        print("round-trip rows:", back.count())

    spark.stop()


if __name__ == "__main__":
    main()
