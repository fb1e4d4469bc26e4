"""Raster analytics walkthrough — the A20-A25 family composed as one
campaign over the synthesized pixel grid: per-zone statistics, an
overview pyramid, smoothing, gradients, coregistration and contrast
equalization, all as lazy DataFrame plans sharing one SparkSession.

Run: python examples/raster_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from icecube_spark.queries import datacube_queries as dq
from icecube_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("raster-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== zonal statistics (per-AOI summaries)")
    dq.zonal_stats(spark, sf_dir).show(5)

    print("== overview pyramid (COG levels 1 and 2)")
    dq.cube_downsample(spark, sf_dir).groupBy("level").count().show()

    print("== focal mean (3x3 speckle smoothing), sample")
    dq.focal_mean(spark, sf_dir).show(5)

    print("== gradient magnitude (edges), sample")
    dq.cube_gradient(spark, sf_dir).orderBy(
        "grad_mag", ascending=False
    ).show(5)

    print("== coregistration shift candidates (best first)")
    dq.cube_coregister(spark, sf_dir).show(5)

    print("== histogram equalization, sample")
    dq.cube_hist_equalize(spark, sf_dir).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
