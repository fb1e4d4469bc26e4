"""Datacube parity queries (SURVEY §2 group A).

Each query re-expresses one reference behavior on the driver's
tabular testdata: `events` plays the acquisition catalog (ts =
acquisition time, user_id = stack id, value = incidence angle,
event_type = product type), `orders`/`part`/`lineitem` play
labels/fact tables. Reference citations on each function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icecube_spark import catalog
from icecube_spark.config import CubeConfig
from icecube_spark.functions.parity import davg, dsum
from icecube_spark.functions.materialize import materialize
from icecube_spark.operators import spatial, temporal

START = "2024-01-01"
END = "2024-01-31"


def metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — metadata crawl → catalog stats table.

    Reference: metadata_crawler (icecube/utils/metadata_crawler.py:20-38)
    builds a one-row-per-image metadata table; this is its groupwise
    summary over the acquisition catalog.
    """
    ev = catalog.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_products"),
            F.min("ts").alias("first_acq"),
            F.max("ts").alias("last_acq"),
            davg("value").alias("avg_value"),
            F.countDistinct("user_id").alias("n_stacks"),
        )
        .orderBy("event_type")
    )


def cube_config_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — config-driven date + angle filtering.

    Reference: select_requested_dates + select_requested_angles
    (sar_datacube_metadata.py:168-186). Both filters land in the
    parquet scan as pushed range predicates.
    """
    cfg = CubeConfig.from_dict(
        {
            "start_date": 20240108,
            "end_date": 20240122,
            "min_incidence_angle": 20.0,
            "max_incidence_angle": 80.0,
        }
    )
    ev = catalog.load(spark, sf_dir, "events")
    ev = temporal.date_range_filter(ev, "ts", cfg.start_date, cfg.end_date)
    ev = temporal.value_range_filter(
        ev, "value", cfg.min_incidence_angle, cfg.max_incidence_angle
    )
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


def cube_temporal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — temporal_overlap=False: keep latest acquisition per date.

    Reference: prune_temporal_overlap (sar_datacube_metadata.py:188-205).
    """
    ev = catalog.load(spark, sf_dir, "events")
    out = temporal.latest_per_period(ev, "ts", ["user_id"], tiebreak=["event_id"])
    return out.select(
        "user_id",
        F.to_date("ts").cast("timestamp").alias("acq_date"),
        "event_id",
        "event_type",
        "value",
    )


def cube_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — temporal_resolution: N-day grid with dummy gap layers.

    Reference: set_temporal_resolution (sar_datacube_metadata.py:226-255)
    + dummy layers (sar_datacube.py:118-121, get_dummy_data:283-288).
    """
    ev = catalog.load(spark, sf_dir, "events")
    return (
        temporal.resample_to_grid(
            ev,
            ts_col="ts",
            key_col="user_id",
            start=START,
            end="2024-01-30",
            step_days=3,
            aggs={"n_acq": F.count(F.lit(1)), "sum_value": dsum("value")},
        )
        .select(
            "user_id",
            "bucket_start",
            F.coalesce("n_acq", F.lit(0)).alias("n_acq"),
            "sum_value",
            "description",
        )
        .orderBy("user_id", "bucket_start")
    )


def cube_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4b — per-stack coverage report over the configured grid: how
    many slots the cube has, how many carry acquisitions vs dummy gap
    layers, and the fill ratio. The reference surfaces this implicitly
    (dummy layers inserted by set_temporal_resolution,
    sar_datacube_metadata.py:226-255 + sar_datacube.py:118-121); at
    100 TB it's the per-stack data-quality gate run before training.
    Composes the A4 resample plan with one more tiny aggregate on the
    already-shuffled key."""
    ev = catalog.load(spark, sf_dir, "events")
    grid = temporal.resample_to_grid(
        ev,
        ts_col="ts",
        key_col="user_id",
        start=START,
        end="2024-01-30",
        step_days=3,
        aggs={"n_acq": F.count(F.lit(1))},
    )
    filled = (F.col("n_acq").isNotNull()).cast("bigint")
    return (
        grid.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.sum(filled).alias("n_filled"),
        )
        .select(
            "user_id",
            "n_slots",
            "n_filled",
            (F.col("n_slots") - F.col("n_filled")).alias("n_gaps"),
            (F.col("n_filled") / F.col("n_slots")).alias("fill_ratio"),
        )
        .orderBy("user_id")
    )


def cube_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — cube assembly: stack bands along the date axis.

    Reference: create_by_metadata xr.concat along Band=acquisition_date
    (sar_datacube.py:108-160). Tabular cube = day × band matrix.
    Pivot values are enumerated so Spark skips the discovery pass.
    """
    ev = catalog.load(spark, sf_dir, "events")
    bands = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("acq_date", F.to_date("ts").cast("timestamp"))
        .groupBy("acq_date")
        .pivot("event_type", bands)
        .agg(davg("value"))
        .orderBy("acq_date")
    )


def metadata_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-layer metadata concatenation.

    Reference: concat_metadata (sar_datacube.py:162-188) folds each
    layer's metadata dict into superset-of-keys lists. Tabular analog:
    per stack, the sorted distinct set of band types plus coverage.
    """
    ev = catalog.load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "band_types"
            ),
            F.countDistinct(F.to_date("ts")).alias("n_dates"),
            F.count(F.lit(1)).alias("n_layers"),
        )
        .orderBy("user_id")
    )


def spatial_overlap_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — space_overlap: keep rasters intersecting the earliest one.

    Reference: select_overlapping_rasters
    (sar_datacube_metadata.py:207-224). Extents here are 1-D price
    intervals [0.9*p, 1.1*p]; the primary is the earliest order.
    """
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        (F.col("o_totalprice") * 0.9).alias("ext_lo"),
        (F.col("o_totalprice") * 1.1).alias("ext_hi"),
    )
    out = spatial.overlap_with_primary_1d(
        orders, "ext_lo", "ext_hi", order_cols=["o_orderdate", "o_orderkey"]
    )
    return out.select("o_orderkey", "o_orderdate", "o_totalprice")


def labels_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — labels cube: align labels to layers, dummy where unlabeled.

    Reference: LabelsDatacube.create_by_metadata + dummy labels for
    bands without annotations (labels_cube/labels_datacube.py:60-100,
    vector_labels.py:36-42). Labels = part names for parts with
    p_size > 25; lineitem layers without one get the 'NA' dummy.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    labels = (
        catalog.load(spark, sf_dir, "part")
        .where(F.col("p_size") > 25)
        .select("p_partkey", "p_name")
    )
    return (
        li.join(F.broadcast(labels), li.l_partkey == labels.p_partkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.coalesce("p_name", F.lit("NA")).alias("label"),
            F.when(F.col("p_name").isNull(), F.lit("unlabeled"))
            .otherwise(F.lit("labeled"))
            .alias("description"),
        )
    )


def cube_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — merge two cubes, first-cube-wins on conflicts.

    Reference: Datacube.merge_xrdatasets with
    combine_attrs='drop_conflicts' (icecube/bin/datacube.py:176-199).
    Two overlapping event cubes union; conflicting layers (same
    event_id) resolve to the first cube's row.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cube1 = ev.where(F.col("value") >= 40).withColumn("src", F.lit(1))
    cube2 = ev.where(F.col("value") < 60).withColumn("src", F.lit(2))
    w = Window.partitionBy("event_id").orderBy("src")
    return (
        cube1.unionByName(cube2)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("event_id", "user_id", "event_type", "value", "src")
    )


def sar_band_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — SLC band derivation: Real/Imag → Amplitude/Intensity.

    Reference: SLC cubes carry Real + Complex bands
    (slc_datacube.py:25-40); amplitude/intensity derive from them
    (analytics_IO.py:113-160). Here Re/Im = first two embedding
    components; all math is per-row IEEE (+,*,sqrt) so it stays
    bit-exact vs the oracle. Phase (atan2) and dB (log10) live in
    functions/sar.py — libm rounding differs across engines, so they
    are tested with tolerance instead of hashed.
    """
    emb = catalog.load(spark, sf_dir, "embeddings")
    re = F.element_at("embedding", 1)
    im = F.element_at("embedding", 2)
    intensity = re * re + im * im
    return emb.select(
        "vec_id",
        re.alias("re"),
        im.alias("im"),
        F.sqrt(intensity).alias("amplitude"),
        intensity.alias("intensity"),
    )


def labels_vector_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8b — vector-labels cube: per-product JSON label objects
    (class + bbox) parsed, exploded, and profiled; dummy stats for
    unlabeled products.

    Reference: vector labels arrive as a JSON file of
    [{product_file, labels: {objects: [{class, bbox{xmin,ymin,xmax,
    ymax}}]}}] and attach along the Band axis with dummies for
    unlabeled bands (labels_cube/vector_labels.py,
    tests/vector_labels_datacube_test.py). Here the labels "file" is
    built deterministically from event ids (every 3rd product gets 1-2
    objects), serialized with to_json, then goes through the REAL
    from_json -> explode_outer parse path a user's labels would take.
    All bbox math is integer, so stats hash-match the oracle.
    """
    ev = catalog.load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    obj = (
        "transform(sequence(0, cast(event_id % 2 as int)), i -> named_struct("
        " 'class', concat('class_', cast((event_id + i) % 5 as string)),"
        " 'bbox', named_struct("
        "   'xmin', cast((event_id + i) % 7 as int),"
        "   'ymin', cast((event_id + 2*i) % 11 as int),"
        "   'xmax', cast((event_id + i) % 7 + 1 + (event_id + i) % 13 as int),"
        "   'ymax', cast((event_id + 2*i) % 11 + 1 + (event_id + 3*i) % 17 as int))))"
    )
    labels_file = (
        ev.where(F.col("event_id") % 3 == 0)
        .select(
            F.col("event_id").alias("product_id"),
            F.to_json(F.struct(F.expr(obj).alias("objects"))).alias("labels_json"),
        )
    )
    schema = (
        "struct<objects: array<struct<class: string,"
        " bbox: struct<xmin: int, ymin: int, xmax: int, ymax: int>>>>"
    )
    parsed = (
        ev.join(F.broadcast(labels_file), ev.event_id == labels_file.product_id, "left")
        .select(
            "event_id",
            F.from_json("labels_json", schema).alias("lab"),
        )
        .select("event_id", F.explode_outer("lab.objects").alias("o"))
    )
    area = (F.col("o.bbox.xmax") - F.col("o.bbox.xmin")) * (
        F.col("o.bbox.ymax") - F.col("o.bbox.ymin")
    )
    return (
        parsed.groupBy("event_id")
        .agg(
            F.count("o.class").alias("n_objects"),
            F.coalesce(
                F.nullif(
                    F.array_join(F.array_sort(F.collect_set("o.class")), ","), F.lit("")
                ),
                F.lit("NA"),
            ).alias("classes"),
            F.coalesce(F.sum(area), F.lit(0)).cast("bigint").alias("total_area"),
        )
        .orderBy("event_id")
    )


def cube_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4c — A4's 3-day grid with temporal gaps linearly interpolated
    between neighbouring acquisitions (edge gaps stay null). The
    TimescaleDB interpolate() twin of the reference's NaN dummy layers
    (sar_datacube_metadata.py:226-255): at training time a gap slot
    carries the straight-line estimate instead of a hole.
    Plan: the A4 resample (two shuffles) + ONE more exchange for the
    per-user ordered carries."""
    ev = catalog.load(spark, sf_dir, "events")
    grid = temporal.resample_to_grid(
        ev,
        ts_col="ts",
        key_col="user_id",
        start=START,
        end="2024-01-30",
        step_days=3,
        aggs={"mean_value": dsum("value") / F.count(F.lit(1))},
    ).withColumn(
        "x", F.datediff(F.col("bucket_start"), F.lit(START).cast("date"))
    )
    out = temporal.interpolate_grid(grid, "user_id", "x", "mean_value")
    return out.select(
        "user_id",
        "bucket_start",
        "mean_value",
        "filled_value",
        "fill_kind",
    ).orderBy("user_id", "bucket_start")


def spatial_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — all-pairs raster-extent intersection
    (sar_datacube_metadata.py:207-224 select_overlapping_rasters
    generalized to all-pairs co-registration candidates). Extents are
    synthesized as integer boxes from supplier keys — the same
    formula both engines evaluate — and joined via grid-cell
    bucketing with reference-point dedup (operators/spatial.py).
    """
    from icecube_spark.operators.spatial import bbox_join_grid

    supp = catalog.load(spark, sf_dir, "supplier")
    boxes = supp.select(
        F.col("s_suppkey").alias("raster_id"),
        ((F.col("s_suppkey") * 7919) % 1000).alias("xmin"),
        ((F.col("s_suppkey") * 104729) % 1000).alias("ymin"),
    ).select(
        "raster_id",
        "xmin",
        "ymin",
        (F.col("xmin") + 50 + F.col("raster_id") % 50).alias("xmax"),
        (F.col("ymin") + 50 + (F.col("raster_id") * 13) % 50).alias("ymax"),
    )
    return bbox_join_grid(boxes, "raster_id", cell=100).orderBy(
        "raster_id_a", "raster_id_b"
    )


def spatial_overlap_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — TRUE polygon-intersection join: rotated-quad footprints
    (the reference's actual SAR-extent semantics — shapely
    .intersects() in select_overlapping_rasters,
    sar_datacube_metadata.py:207-224) matched all-pairs via bbox grid
    bucketing + an exact convex orientation-test predicate, entirely
    in codegen arithmetic (operators/spatial.py:quad_intersect_sql).
    The oracle evaluates the IDENTICAL expressions, so results are
    bit-equal without any geometry library on either side."""
    from icecube_spark.operators.spatial import polygon_join_grid, quad_footprints

    part = catalog.load(spark, sf_dir, "part")
    polys = quad_footprints(
        part.select(F.col("p_partkey").alias("raster_id")), "raster_id"
    )
    return (
        polygon_join_grid(polys, "raster_id")
        .select(
            F.col("a_raster_id").alias("raster_id_a"),
            F.col("b_raster_id").alias("raster_id_b"),
        )
        .orderBy("raster_id_a", "raster_id_b")
    )


def cube_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — SAR-style change detection along the time axis: the ratio
    of each acquisition's value to the previous acquisition of the
    same key, flagged when it moves more than 50% either way. The
    ratio detector is the standard SAR amplitude-change test (the
    log-ratio thresholded), expressed on the tabular cube.

    Plan: one shuffle on the key for the lag; the ratio and flag are
    codegen column math. The division is one IEEE double op on
    identical inputs — bit-equal in any engine (values are > 0 in
    this dataset; a NULL previous row yields NULL ratio, flag false).
    """
    ev = catalog.load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
    )
    # guard the zero divisor explicitly (ANSI mode throws, and engines
    # disagree on x/0 semantics — NULL ratio / false flag is the
    # portable contract); larger SFs do contain value = 0 rows
    ratio = F.when(
        F.col("prev_value") != 0, F.col("value") / F.col("prev_value")
    )
    return lagged.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        "prev_value",
        ratio.alias("ratio"),
        F.coalesce(
            (ratio > 1.5) | (ratio * 1.5 < 1.0), F.lit(False)
        ).alias("changed"),
    ).orderBy("user_id", "ts", "event_id")


def cube_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 — mosaic assignment: the coordinate space is cut into grid
    cells and every cell covered by at least one footprint bbox is
    assigned its most recent raster (max id = latest acquisition
    proxy) — the standard best-pixel mosaic/compositing step after
    footprint overlap analysis (reference stacks overlapping rasters;
    a mosaic picks one winner per cell).

    Plan: bounded bbox->cell explode (constant density per A14's
    sqrt(n) space), then ONE partial-agg shuffle on the cell key —
    max and count combine map-side. Output is |covered cells| rows.
    """
    from icecube_spark.operators.spatial import quad_footprints

    part = catalog.load(spark, sf_dir, "part")
    polys = quad_footprints(
        part.select(F.col("p_partkey").alias("raster_id")), "raster_id"
    )
    cell = 128
    cells = polys.select(
        "raster_id",
        F.explode(
            F.sequence(
                F.floor(F.col("xmin") / cell), F.floor(F.col("xmax") / cell)
            )
        ).alias("cx"),
        "ymin",
        "ymax",
    ).select(
        "raster_id",
        "cx",
        F.explode(
            F.sequence(
                F.floor(F.col("ymin") / cell), F.floor(F.col("ymax") / cell)
            )
        ).alias("cy"),
    )
    return (
        cells.groupBy("cx", "cy")
        .agg(
            F.max("raster_id").alias("raster_id"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .orderBy("cx", "cy")
    )


def cube_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19 — temporal composite per (stack, band): mean / std / min /
    max of the band value across all acquisitions of a stack — the
    mean-composite / std-composite products every EO time-series
    pipeline derives from a filled cube (the tabular form of
    reducing the reference's time axis, sar_datacube.py:108-160,
    with a statistic instead of selection).

    Plan: single partial-agg shuffle on (stack, band); std from
    exact integer moments (floor(x·1e6) quantization) so both
    engines evaluate the same sqrt argument.
    """
    ev = catalog.load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    mom = ev.groupBy(
        F.col("user_id").alias("stack_id"),
        F.col("event_type").alias("band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scenes"),
        F.sum(q).alias("sq"),
        F.sum(q.cast("decimal(38,0)") * q).alias("sq2"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    n = F.col("n_scenes").cast("double")
    s = F.col("sq").cast("double") / F.lit(1e6)
    s2 = F.col("sq2").cast("double") / F.lit(1e12)
    return mom.select(
        "stack_id",
        "band",
        "n_scenes",
        (s / n).alias("mean_value"),
        F.sqrt((n * s2 - s * s) / (n * n)).alias("std_value"),
        "min_value",
        "max_value",
    ).orderBy("stack_id", "band")


def zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 — zonal statistics: per-zone count/mean/min/max of raster
    pixel values, zones being irregular bboxes (the classic raster
    analytics op — per-AOI SAR backscatter summaries; reference cubes
    slice by label regions, labels_cube/*). Pixels are synthesized
    from events (deterministic integer formula both engines
    evaluate), zones are the supplier extents of spatial_bbox_join.

    Plan: grid-cell bucketed containment join, never all-pairs — each
    pixel lands in exactly ONE 100x100 cell, each zone explodes to
    the <= 4 cells it spans, the equi-join on cell meets every
    (pixel, zone) pair exactly once (no post-join dedup), and the
    per-zone aggregate partial-combines map-side. At 100 TB pixels
    shuffle once by cell and zones are a broadcast-scale side.
    """
    ev = catalog.load(spark, sf_dir, "events")
    px = ev.select(
        ((F.col("event_id") * 37) % 1000).alias("x"),
        ((F.col("event_id") * 61) % 1000).alias("y"),
        F.col("value"),
    ).withColumn("cell", (F.col("x") / 100).cast("int") * 10
                 + (F.col("y") / 100).cast("int"))
    supp = catalog.load(spark, sf_dir, "supplier")
    zones = supp.select(
        F.col("s_suppkey").alias("zone_id"),
        ((F.col("s_suppkey") * 7919) % 1000).alias("xmin"),
        ((F.col("s_suppkey") * 104729) % 1000).alias("ymin"),
    ).select(
        "zone_id",
        "xmin",
        "ymin",
        (F.col("xmin") + 50 + F.col("zone_id") % 50).alias("xmax"),
        (F.col("ymin") + 50 + (F.col("zone_id") * 13) % 50).alias("ymax"),
    )
    zcells = zones.select(
        "zone_id", "xmin", "ymin", "xmax", "ymax",
        F.explode(
            F.expr(
                "flatten(transform(sequence(CAST(xmin/100 AS INT), "
                "CAST(xmax/100 AS INT)), cx -> "
                "transform(sequence(CAST(ymin/100 AS INT), "
                "CAST(ymax/100 AS INT)), cy -> cx*10 + cy)))"
            )
        ).alias("cell"),
    )
    hits = px.join(F.broadcast(zcells), "cell").where(
        (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))
    )
    return (
        hits.groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pixels"),
            davg("value").alias("mean_value"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("zone_id")
    )


def cube_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21 — overview-pyramid downsampling (COG/overview levels):
    block means at 4x4 (level 1) and 16x16 (level 2), level 2 ROLLED
    UP from level 1's exact partial sums, never rescanning pixels —
    the one-pass pyramid shape real tilers use.

    Exactness: sums stay DECIMAL(18,8) through the rollup (decimal
    addition associates), cast to double only in the final mean — so
    level 2 from level 1 is bit-identical to level 2 from scratch,
    which is what the oracle computes.

    Plan: one map-side-combinable shuffle for level 1; level 2 is a
    second tiny shuffle over level-1 blocks (256x fewer rows). At
    100 TB each pyramid level costs 1/256 of the previous — the total
    is a geometric series dominated by the base scan.
    """
    ev = catalog.load(spark, sf_dir, "events")
    px = ev.select(
        ((F.col("event_id") * 37) % 1000).alias("x"),
        ((F.col("event_id") * 61) % 1000).alias("y"),
        F.col("value"),
    )
    l1 = (
        px.groupBy(
            (F.col("x") / 4).cast("int").alias("bx"),
            (F.col("y") / 4).cast("int").alias("by"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pixels"),
            F.sum(F.col("value").cast("decimal(18,8)")).alias("dsum"),
        )
    )
    l2 = (
        l1.groupBy(
            (F.col("bx") / 4).cast("int").alias("bx2"),
            (F.col("by") / 4).cast("int").alias("by2"),
        )
        .agg(
            F.sum("n_pixels").cast("bigint").alias("n_pixels"),
            F.sum("dsum").alias("dsum"),
        )
        .select(
            F.lit(2).alias("level"),
            F.col("bx2").alias("bx"),
            F.col("by2").alias("by"),
            "n_pixels",
            (F.col("dsum").cast("double") / F.col("n_pixels")).alias(
                "mean_value"
            ),
        )
    )
    out1 = l1.select(
        F.lit(1).alias("level"),
        "bx",
        "by",
        "n_pixels",
        (F.col("dsum").cast("double") / F.col("n_pixels")).alias("mean_value"),
    )
    return out1.unionAll(l2).orderBy("level", "bx", "by")


def focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22 — 3×3 focal (neighborhood) mean filter over the sparse
    pixel grid: the raster convolution/smoothing primitive (speckle
    filtering is the canonical SAR use). Output at observed pixel
    locations only; missing neighbors simply don't contribute
    (sparse-raster semantics).

    Plan: cell-aggregate first (one map-side-combinable shuffle
    collapses events to distinct pixels), then each CELL — not each
    event — explodes to the 9 targets it contributes to; the target
    aggregate and the pixel-location semi-join reuse one (x, y)
    partitioning under AQE. Fanout is exactly 9 regardless of data;
    at 100 TB this is the standard sparse stencil: shuffle volume =
    9 × distinct cells, never 9 × raw events.
    """
    ev = catalog.load(spark, sf_dir, "events")
    # independent coordinate digits (x = id mod 1000, y = next digit):
    # deriving both axes from the same residue puts every pixel on a
    # 1-D lattice and the stencil never finds a neighbor
    cells = (
        ev.select(
            (F.col("event_id") % 1000).alias("x"),
            ((F.col("event_id") / 1000).cast("bigint") % 1000).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum(F.col("value").cast("decimal(18,8)")).alias("cell_sum"),
        )
    )
    contrib = (
        cells.select(
            "x", "y", "cell_sum", "n_obs",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
        )
        .select(
            "x", "y", "cell_sum", "n_obs", "dx",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
        )
        .select(
            (F.col("x") + F.col("dx")).alias("tx"),
            (F.col("y") + F.col("dy")).alias("ty"),
            "cell_sum",
            "n_obs",
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    focal = contrib.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n_obs").cast("bigint").alias("n_obs"),
        F.sum("cell_sum").alias("fsum"),
    )
    return (
        focal.join(
            cells.select(F.col("x").alias("tx"), F.col("y").alias("ty")),
            ["tx", "ty"],
        )
        .select(
            F.col("tx").alias("x"),
            F.col("ty").alias("y"),
            "n_cells",
            "n_obs",
            (F.col("fsum").cast("double") / F.col("n_obs")).alias("focal_mean"),
        )
        .orderBy("x", "y")
    )


def cube_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 — central-difference gradient on the sparse pixel grid:
    gx = (E − W)/2, gy = (N − S)/2 and the gradient magnitude, at
    interior cells where all four neighbors are observed (terrain
    slope / edge detection — the derivative complement of
    focal_mean's smoothing).

    Plan: same stencil discipline as focal_mean — cells aggregate
    first, then each CELL emits 4 directed (role, target)
    contributions; one groupBy on the target pivots the roles back
    into columns (max of a when() per role — never a self-join per
    direction), and the center join reuses the (x, y) partitioning.
    Shuffle volume is 4 × distinct cells at any scale. All math is
    fixed-shape IEEE over decimal-fold means, so rows hash exactly.
    (Grid is 50×50 — denser than focal_mean's — because a central
    difference needs ALL four neighbors observed; on a barely-filled
    grid the interior set is empty at small SFs.)
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(davg("value").alias("v"))
    )
    roles = F.array(
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("west").alias("role")),
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("east").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                 F.lit("south").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                 F.lit("north").alias("role")),
    )
    contrib = (
        cells.select("x", "y", "v", F.explode(roles).alias("r"))
        .select(
            (F.col("x") + F.col("r.dx")).alias("tx"),
            (F.col("y") + F.col("r.dy")).alias("ty"),
            F.col("r.role").alias("role"),
            "v",
        )
    )
    nb = contrib.groupBy("tx", "ty").agg(
        F.max(F.when(F.col("role") == "west", F.col("v"))).alias("w"),
        F.max(F.when(F.col("role") == "east", F.col("v"))).alias("e"),
        F.max(F.when(F.col("role") == "south", F.col("v"))).alias("s"),
        F.max(F.when(F.col("role") == "north", F.col("v"))).alias("n"),
    )
    gx = (F.col("e") - F.col("w")) / F.lit(2.0)
    gy = (F.col("n") - F.col("s")) / F.lit(2.0)
    return (
        cells.join(
            nb,
            (F.col("x") == F.col("tx")) & (F.col("y") == F.col("ty")),
        )
        .where(
            F.col("w").isNotNull() & F.col("e").isNotNull()
            & F.col("s").isNotNull() & F.col("n").isNotNull()
        )
        .select(
            "x",
            "y",
            F.col("v").alias("center"),
            gx.alias("gx"),
            gy.alias("gy"),
            F.sqrt(gx * gx + gy * gy).alias("grad_mag"),
        )
        .orderBy("x", "y")
    )


def cube_coregister(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24 — coregistration shift estimation: cross-correlate two
    acquisition epochs of the raster over a 5×5 integer shift window
    and rank the candidate (dx, dy) offsets — the estimation step
    behind the reference's `coregistered` config flag (config.py:
    cubes assume pre-coregistered rasters; this measures the residual
    misalignment). Epoch A = first half of January, epoch B = rest.

    Exactness: per-cell products quantize at 1e-6 into BIGINT sums;
    the per-shift mean product is one exact division; ranking
    compares (mean desc, dx, dy) — deterministic in both engines.

    Plan: per-epoch cell means first (two partial-agg shuffles of the
    same scan shape), then epoch A explodes over the 25 candidate
    shifts map-side and equi-joins epoch B on the shifted
    coordinates — a bounded 25× stencil fanout on cell-count rows,
    never on raw events; the per-shift aggregate is 25 rows. At
    100 TB the window would tile per scene, keeping the stencil local
    to each tile's cells.
    """
    ev = catalog.load(spark, sf_dir, "events")
    px = ev.select(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.col("value"),
        (F.col("ts").cast("timestamp") < F.lit("2024-01-16").cast("timestamp"))
        .alias("is_a"),
    )
    cells = lambda flag: (
        px.where(F.col("is_a") == flag)
        .groupBy("x", "y")
        .agg(davg("value").alias("v"))
    )
    a, b = cells(True), cells(False)
    shifts = F.expr(
        "explode(flatten(transform(sequence(-2, 2), dx ->"
        " transform(sequence(-2, 2), dy -> struct(dx, dy)))))"
    )
    a_sh = a.select("x", "y", F.col("v").alias("va"), shifts.alias("s")).select(
        (F.col("x") + F.col("s.dx")).alias("bx"),
        (F.col("y") + F.col("s.dy")).alias("by"),
        F.col("s.dx").alias("dx"),
        F.col("s.dy").alias("dy"),
        "va",
    )
    j = a_sh.join(
        b.select(F.col("x").alias("bx"), F.col("y").alias("by"),
                 F.col("v").alias("vb")),
        ["bx", "by"],
    )
    scored = (
        j.groupBy("dx", "dy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
            F.sum(
                F.floor(F.col("va") * F.col("vb") * F.lit(1e6)).cast("bigint")
            ).alias("qxcorr"),
        )
        .withColumn(
            "mean_xcorr",
            F.col("qxcorr").cast("double") / F.col("n_overlap").cast("double")
            / F.lit(1e6),
        )
    )
    w = Window.partitionBy().orderBy(
        F.desc("mean_xcorr"), F.asc("dx"), F.asc("dy")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "dx", "dy", "n_overlap", "mean_xcorr")
        .orderBy("rank")
    )


def cube_hist_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 — per-stack histogram equalization: remap each acquisition
    value to its empirical CDF position within its stack (the
    contrast-normalization step before cross-stack band math; SAR
    pipelines equalize per scene so thresholds transfer).

    Exactness: equalized = (rank − 1)/(n − 1) with a total order
    (value, event_id) — exact integer division, no interpolation.

    Plan: ONE exchange on the stack key feeds the ordered rank
    window, the unordered count window, and nothing else — the
    canonical shared-partitioning shape. At 100 TB the per-stack
    sort parallelizes across stacks and spills cleanly.
    """
    ev = catalog.load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = wp.orderBy("value", "event_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.select(
        "user_id",
        "event_id",
        "value",
        F.when(
            F.col("n") > 1,
            (F.col("rn") - 1).cast("double") / (F.col("n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("equalized"),
    ).orderBy("user_id", "event_id")


def cube_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26 — normalized-difference band index per (stack, day):
    (A − B)/(A + B) between two bands' daily means — the NDVI/NDWI
    family, THE derived-index op of raster analytics (for SAR:
    normalized backscatter difference between polarizations). Bands
    here are the 'click' and 'view' product types.

    Exactness: band means are decimal folds; the index is one
    fixed-shape double expression; A+B = 0 yields a NULL index (no
    data), mirrored in the oracle.

    Plan: one (stack, day) shuffle computes BOTH band means as
    conditional aggregates in the same pass — never two scans or a
    self-join; the index is pure projection.
    """
    ev = catalog.load(spark, sf_dir, "events")
    day = F.to_date(F.col("ts").cast("timestamp")).cast("timestamp")
    dec = "decimal(18,8)"
    daily = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", day.alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", F.col("value")).cast(dec)
            ).alias("sa"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("na"),
            F.sum(
                F.when(F.col("event_type") == "view", F.col("value")).cast(dec)
            ).alias("sb"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("nb"),
        )
        .where((F.col("na") > 0) & (F.col("nb") > 0))
    )
    a = F.col("sa").cast("double") / F.col("na")
    b = F.col("sb").cast("double") / F.col("nb")
    return daily.select(
        "user_id",
        "day",
        a.alias("band_a"),
        b.alias("band_b"),
        F.when(a + b != 0, (a - b) / (a + b)).alias("nd_index"),
    ).orderBy("user_id", "day")


def cube_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27 — temporal coherence matrix of the tabular cube: Pearson
    correlation between consecutive daily layers over their shared
    pixels (user ids as pixel index, days as acquisitions). The
    SAR interferometric-coherence analog — the reference's SLC stack
    exists to support exactly this kind of acquisition-pair quality
    measure — expressed on the tabular cube so it scales by
    shuffling (pixel, layer) keys, never dense arrays.

    Exactness: daily pixel values quantize to micro-units once; all
    moments fold in DECIMAL(38,0) exact integers; r lands on a 1e-9
    grid (the >2^53 cast guard).

    Plan: one (pixel, day) aggregate, a self-join on (pixel, day+1)
    — 1:1 per pixel, co-partitioned — then a per-day-pair moment
    aggregate. Calendar-bounded output rows.
    """
    from pyspark.sql import functions as F

    from icecube_spark.functions.parity import dsum

    ev = catalog.load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("user_id").alias("px"),
            F.datediff(
                F.to_date(F.col("ts").cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
            "value",
        )
        .groupBy("px", "d")
        .agg(
            F.floor(dsum("value") * F.lit(1e6)).cast("bigint").alias("q")
        )
    )
    a = daily.select("px", F.col("d").alias("day_a"), F.col("q").alias("qa"))
    b = daily.select(
        "px", (F.col("d") - 1).alias("day_a"), F.col("q").alias("qb")
    )
    dec = "decimal(38,0)"
    m = (
        a.join(b, ["px", "day_a"])
        .groupBy("day_a")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("qa").cast(dec)).alias("sa"),
            F.sum(F.col("qb").cast(dec)).alias("sb"),
            F.sum(F.col("qa").cast(dec) * F.col("qa")).alias("saa"),
            F.sum(F.col("qb").cast(dec) * F.col("qb")).alias("sbb"),
            F.sum(F.col("qa").cast(dec) * F.col("qb")).alias("sab"),
        )
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa, sbb, sab = (
        F.col("saa").cast("double"),
        F.col("sbb").cast("double"),
        F.col("sab").cast("double"),
    )
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    raw = (n * sab - sa * sb) / (F.sqrt(va) * F.sqrt(vb))
    r = F.floor(raw * F.lit(1e9)).cast("bigint").cast("double") / F.lit(1e9)
    return (
        m.where((va > 0) & (vb > 0) & (F.col("n") >= 2))
        .select(
            F.col("day_a").cast("bigint").alias("day_a"),
            (F.col("day_a") + 1).cast("bigint").alias("day_b"),
            F.col("n").cast("bigint").alias("n_shared_pixels"),
            r.alias("coherence"),
        )
        .orderBy("day_a")
    )


def _pixel_cells(ev: DataFrame) -> DataFrame:
    """Distinct sparse-grid cells with exact micro-quantized mean.

    x/y derive from independent event_id digit groups (the focal_mean
    lattice); the cell mean folds through DECIMAL(18,8) then
    quantizes to integer micro-units so every downstream moment is
    exact integer math.

    Eagerly checkpointed: the frame is grid-bounded (≤1000×1000 cells
    by construction, at ANY corpus size) and every stencil/moment
    consumer references it several times — global-moment branch,
    neighbor explode, center join — so without the checkpoint the
    events scan + cell aggregate re-run once per reference
    (guide §5: cache a tiny reused intermediate, cut the lineage).
    """
    return (
        ev.select(
            (F.col("event_id") % 1000).alias("x"),
            ((F.col("event_id") / 1000).cast("bigint") % 1000).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum(F.col("value").cast("decimal(18,8)")).alias("cell_sum"),
        )
        .withColumn(
            "qv",
            F.floor(
                (F.col("cell_sum").cast("double") / F.col("n_obs").cast("double"))
                * F.lit(1e6)
            ).cast("bigint"),
        )
        .transform(materialize)
    )


def cube_lee_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30 — Lee adaptive speckle filter over the sparse pixel grid:
    per pixel, the 3×3 focal mean/variance pick the weight
    w = σ²/(σ² + σ_n²), and the filtered value is mean + w·(center −
    mean). THE standard SAR despeckle (additive-noise Lee 1980 form);
    reference SAR cubes apply it per GRD band before band math.

    Exactness: cell means quantize to micro-units once, focal moments
    (Σq, Σq²) fold in exact BIGINTs; the weight/filter arithmetic is
    shape-mirrored double math, and the output quantizes to a 1e-9
    grid (corr_matrix guard).

    Plan: identical stencil shape to focal_mean (A22): cells collapse
    first, each CELL explodes to its 9 targets, one target aggregate,
    center semi-join. Shuffle volume = 9 × distinct cells at any
    corpus size — never 9 × raw events.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev)
    contrib = (
        cells.select(
            "x", "y", "qv",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
        )
        .select(
            "x", "y", "qv", "dx",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
        )
        .select(
            (F.col("x") + F.col("dx")).alias("tx"),
            (F.col("y") + F.col("dy")).alias("ty"),
            "qv",
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    focal = contrib.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("qv").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).alias("ss"),
    )
    j = focal.join(
        cells.select(
            F.col("x").alias("tx"), F.col("y").alias("ty"), "qv", "n_obs"
        ),
        ["tx", "ty"],
    )
    nd = F.col("n_cells").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    mean_f = sd / nd / F.lit(1e6)
    var_f = (ssd - sd * sd / nd) / nd / F.lit(1e12)
    center = F.col("qv").cast("double") / F.lit(1e6)
    w = var_f / (var_f + F.lit(2500.0))
    lee = mean_f + w * (center - mean_f)
    return j.select(
        F.col("tx").alias("x"),
        F.col("ty").alias("y"),
        "n_cells",
        "n_obs",
        (F.floor(lee * F.lit(1e9)) / F.lit(1e9)).alias("lee_value"),
    ).orderBy("x", "y")


def cube_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A31 — per-layer Otsu threshold: 64-bin histogram of pixel
    values per product type, threshold at the argmax of between-class
    variance w0·w1·(μ0−μ1)². The classical automatic land/water
    segmentation cut for SAR backscatter (flood mapping's first
    step).

    Exactness: histogram counts and micro-quantized bin sums are
    exact integers; σ_b² folds from those ints in shape-mirrored
    double math and quantizes to a 1e-9 grid before the argmax; ties
    break to the lowest bin.

    Plan: one (layer, bin) aggregate — 64 rows per layer — then
    cumulative windows and the argmax run on that tiny frame. A
    single corpus-sized shuffle at any scale.
    """
    ev = catalog.load(spark, sf_dir, "events")
    binned = ev.select(
        F.col("event_type").alias("layer"),
        F.least(F.lit(63), F.floor(F.col("value") / 8).cast("int")).alias("bin"),
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("qv"),
    )
    hist = binned.groupBy("layer", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("qv").alias("s_b"),
    )
    wcum = (
        Window.partitionBy("layer")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("layer")
    cum = hist.select(
        "layer",
        "bin",
        F.sum("n_b").over(wcum).alias("n0"),
        F.sum("s_b").over(wcum).alias("s0"),
        F.sum("n_b").over(wall).alias("nt"),
        F.sum("s_b").over(wall).alias("st"),
    ).where(F.col("n0") < F.col("nt"))
    n0 = F.col("n0").cast("double")
    s0 = F.col("s0").cast("double")
    nt = F.col("nt").cast("double")
    st = F.col("st").cast("double")
    mu0 = s0 / n0 / F.lit(1e6)
    mu1 = (st - s0) / (nt - n0) / F.lit(1e6)
    sb = (n0 / nt) * ((nt - n0) / nt) * (mu0 - mu1) * (mu0 - mu1)
    scored = cum.select(
        "layer",
        "bin",
        F.col("n0").alias("n_below"),
        (F.col("nt") - F.col("n0")).alias("n_above"),
        (F.floor(sb * F.lit(1e9)) / F.lit(1e9)).alias("sigma_b"),
    )
    wr = Window.partitionBy("layer").orderBy(
        F.col("sigma_b").desc(), F.col("bin")
    )
    return (
        scored.withColumn("r", F.row_number().over(wr))
        .where(F.col("r") == 1)
        .select(
            "layer",
            F.col("bin").alias("threshold_bin"),
            ((F.col("bin") + 1) * F.lit(8.0)).alias("threshold_value"),
            "n_below",
            "n_above",
            "sigma_b",
        )
        .orderBy("layer")
    )


def cube_morph_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A32 — binary morphological opening (erode → dilate, 3×3
    structuring element) of the thresholded pixel mask: the despeckle
    step that removes isolated false positives from a flood/change
    mask while preserving connected regions. Opening ⊆ mask, so the
    output reports each mask pixel with its eroded/opened flags.

    Exactness: pure integer set logic — no floats anywhere.

    Plan: two stencil passes, each shuffling 9 × mask cells
    (cell-collapsed first); the dilate pass runs over the (much
    smaller) eroded set only. Sparse-raster semantics: out-of-mask
    neighbors are simply absent.
    """
    ev = catalog.load(spark, sf_dir, "events")
    mask = _pixel_cells(ev).where(F.col("qv") >= 50_000_000).select("x", "y")

    def stencil(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "x", "y",
                F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
            )
            .select(
                "x", "y", "dx",
                F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
            )
            .select(
                (F.col("x") + F.col("dx")).alias("tx"),
                (F.col("y") + F.col("dy")).alias("ty"),
            )
            .where(
                (F.col("tx") >= 0) & (F.col("tx") < 1000)
                & (F.col("ty") >= 0) & (F.col("ty") < 1000)
            )
        )

    neigh = stencil(mask).groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neigh")
    )
    eroded = (
        mask.join(
            neigh.select(F.col("tx").alias("x"), F.col("ty").alias("y"), "n_neigh"),
            ["x", "y"],
        )
        .where(F.col("n_neigh") == 9)
        .select("x", "y")
    )
    opened = (
        stencil(eroded)
        .select(F.col("tx").alias("x"), F.col("ty").alias("y"))
        .distinct()
        .withColumn("op", F.lit(1))
    )
    er = eroded.withColumn("er", F.lit(1))
    return (
        mask.join(er, ["x", "y"], "left")
        .join(opened, ["x", "y"], "left")
        .select(
            "x",
            "y",
            F.coalesce(F.col("er"), F.lit(0)).cast("int").alias("eroded"),
            F.coalesce(F.col("op"), F.lit(0)).cast("int").alias("opened"),
        )
        .orderBy("x", "y")
    )


def cube_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A33 — local Moran's I (Anselin LISA) hot-spot statistic per
    pixel: I_i = (x_i − μ)·mean_neighbors(x_j − μ)/σ², computed over
    the 8-neighbor stencil. Positive I with positive deviation =
    backscatter hot spot; the spatial-autocorrelation complement to
    the purely local focal/gradient ops.

    Exactness: deviations stay in exact integers scaled by N
    (devq = qv·N − S avoids the mean division), the global second
    moment folds in DECIMAL(38,0), and the final statistic —
    shape-mirrored double math — quantizes to a 1e-9 grid
    (corr_matrix guard for wide-int casts).

    Plan: cell collapse, one tiny global-moment window, the
    focal_mean 9-target stencil for the neighbor sum, one center
    join. Shuffle volume = 9 × distinct cells at any scale.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev)
    # global moments as an aggregate broadcast back onto the cells —
    # the old keyless window funneled the (bounded) cell frame
    # through one task and, over the checkpointed cells, hid its
    # boundedness proof from the funnel sweep (guide §2.4)
    gm = cells.agg(
        F.count(F.lit(1)).alias("__nt"), F.sum("qv").alias("__s")
    )
    dev = cells.crossJoin(F.broadcast(gm)).select(
        "x",
        "y",
        (F.col("qv") * F.col("__nt") - F.col("__s")).alias("devq"),
        F.col("__nt").cast("bigint").alias("n_cells_total"),
    )
    m2 = dev.groupBy().agg(
        F.sum(
            F.col("devq").cast("decimal(19,0)")
            * F.col("devq").cast("decimal(19,0)")
        ).alias("m2q"),
        F.max("n_cells_total").alias("nt"),
    )
    contrib = (
        dev.select(
            "x", "y", "devq",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
        )
        .select(
            "x", "y", "devq", "dx",
            F.explode(F.array([F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
        )
        .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("x") + F.col("dx")).alias("tx"),
            (F.col("y") + F.col("dy")).alias("ty"),
            "devq",
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    nsum = contrib.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neigh"),
        F.sum("devq").alias("ndevq"),
    )
    j = (
        dev.select(
            F.col("x").alias("tx"), F.col("y").alias("ty"), "devq"
        )
        .join(nsum, ["tx", "ty"])
        .crossJoin(F.broadcast(m2))
    )
    ntd = F.col("nt").cast("double")
    scale = ntd * F.lit(1e6)
    devd = F.col("devq").cast("double") / scale
    nbar = F.col("ndevq").cast("double") / scale / F.col("n_neigh").cast("double")
    var = F.col("m2q").cast("double") / (scale * scale) / ntd
    moran = devd * nbar / var
    return j.select(
        F.col("tx").alias("x"),
        F.col("ty").alias("y"),
        "n_neigh",
        (F.floor(moran * F.lit(1e9)) / F.lit(1e9)).alias("local_moran"),
    ).orderBy("x", "y")


def cube_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A34 — analytical hillshade from the central-difference
    gradient: illumination = (−gx·lx − gy·ly + lz)/√(gx²+gy²+1) for a
    fixed light vector — the terrain-visualization companion of
    cube_gradient (A23), formulated WITHOUT trig (cos/sin/atan2 are
    not identically rounded across engines; the dot-product form
    needs only IEEE mul/add/sqrt/div, which are).

    Plan: identical 4-role stencil to A23 (cell collapse → 4 directed
    contributions → one role pivot → center join); shuffle = 4 ×
    distinct cells at any scale.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(davg("value").alias("v"))
    )
    roles = F.array(
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("west").alias("role")),
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("east").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                 F.lit("south").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                 F.lit("north").alias("role")),
    )
    contrib = (
        cells.select("x", "y", "v", F.explode(roles).alias("r"))
        .select(
            (F.col("x") + F.col("r.dx")).alias("tx"),
            (F.col("y") + F.col("r.dy")).alias("ty"),
            F.col("r.role").alias("role"),
            "v",
        )
    )
    nb = contrib.groupBy("tx", "ty").agg(
        F.max(F.when(F.col("role") == "west", F.col("v"))).alias("w"),
        F.max(F.when(F.col("role") == "east", F.col("v"))).alias("e"),
        F.max(F.when(F.col("role") == "south", F.col("v"))).alias("s"),
        F.max(F.when(F.col("role") == "north", F.col("v"))).alias("n"),
    )
    gx = (F.col("e") - F.col("w")) / F.lit(2.0)
    gy = (F.col("n") - F.col("s")) / F.lit(2.0)
    lx, ly, lz = F.lit(0.5), F.lit(0.5), F.lit(0.707)
    illum = (-gx * lx - gy * ly + lz) / F.sqrt(gx * gx + gy * gy + F.lit(1.0))
    return (
        cells.join(
            nb,
            (F.col("x") == F.col("tx")) & (F.col("y") == F.col("ty")),
        )
        .where(
            F.col("w").isNotNull() & F.col("e").isNotNull()
            & F.col("s").isNotNull() & F.col("n").isNotNull()
        )
        .select(
            "x", "y",
            gx.alias("gx"),
            gy.alias("gy"),
            illum.alias("hillshade"),
        )
        .orderBy("x", "y")
    )


def cube_mask_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A35 — connected components of the thresholded pixel mask
    (8-connectivity): per flood/change blob, its size and bounding
    box, labeled by the min cell key. The region-labeling step every
    SAR flood-extent product runs after thresholding (A31/A32).

    Exactness: pure integer set/graph logic; the component label is
    the min node key (deterministic).

    Plan: ONE mask aggregate feeds everything — adjacency comes from
    the explode-scatter stencil (each cell scatters to its 9 targets;
    a groupBy on the target recovers "both endpoints present" without
    a mask self-join), then single-batch union-find CC
    (connected_components_bounded): the mask graph has a HARD
    structural bound — grid cells are fixed by sensor geometry, so
    labeling is per-scene-bounded work that at 100 TB parallelizes
    ACROSS scenes, not within one. The summary is a |components|-row
    aggregate. The oracle replays the same labeling with a recursive
    CTE.
    """
    from icecube_spark.operators import pipeline as pipeline_ops

    ev = catalog.load(spark, sf_dir, "events")
    mask = _pixel_cells(ev).where(F.col("qv") >= 50_000_000).select("x", "y")
    offsets = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    scatter = (
        mask.select("x", "y", F.explode(F.array(*offsets)).alias("o"))
        .select(
            (F.col("x") + F.col("o.dx")).alias("tx"),
            (F.col("y") + F.col("o.dy")).alias("ty"),
            (F.col("x") * 1000 + F.col("y")).alias("origin"),
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    hood = scatter.groupBy("tx", "ty").agg(
        F.collect_list("origin").alias("ns"),
        F.max(
            F.when(
                F.col("origin") == F.col("tx") * 1000 + F.col("ty"), 1
            ).otherwise(0)
        ).alias("present"),
    ).where(F.col("present") == 1)
    nodes = hood.select(
        (F.col("tx") * 1000 + F.col("ty")).alias("node"),
        F.col("tx").alias("x"),
        F.col("ty").alias("y"),
    )
    edges = (
        hood.select(
            (F.col("tx") * 1000 + F.col("ty")).alias("a"),
            F.explode("ns").alias("b"),
        )
        .where(F.col("a") < F.col("b"))
    )
    labels = pipeline_ops.connected_components_bounded(edges, "a", "b")
    labeled = nodes.join(
        labels.select(
            F.col("doc_id").alias("node"), F.col("cluster_id").alias("comp")
        ),
        "node",
        "left",
    ).select(
        "x", "y", F.coalesce(F.col("comp"), F.col("node")).alias("component_id")
    )
    return (
        labeled.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("component_id")
    )


def cube_baseline_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A36 — InSAR pair selection: per stack, acquisition pairs whose
    temporal baseline is ≤ 12 days and incidence-angle difference is
    ≤ 5° — the interferogram candidate graph every InSAR processor
    builds before coregistration (reference stacks pair SLCs exactly
    this way).

    Exactness: day baselines are integer date arithmetic; the angle
    difference subtracts identical doubles (deterministic IEEE).

    Plan: day-bucketed self-join — the earlier side emits its own
    12-day bucket and the next, so the equality join sees each true
    pair exactly once and candidate fanout is bucket-bounded (never
    a per-stack cross join). Co-partitioned on (stack, bucket).
    """
    ev = catalog.load(spark, sf_dir, "events")
    acq = ev.select(
        "user_id",
        "event_id",
        F.datediff(
            F.to_date(F.col("ts").cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        "value",
    )
    a = acq.select(
        F.col("user_id"),
        F.col("event_id").alias("event_a"),
        F.col("d").alias("da"),
        F.col("value").alias("va"),
        F.explode(
            F.array(
                F.floor(F.col("d") / 12),
                F.floor(F.col("d") / 12) + 1,
            )
        ).alias("bkt"),
    )
    b = acq.select(
        F.col("user_id"),
        F.col("event_id").alias("event_b"),
        F.col("d").alias("db"),
        F.col("value").alias("vb"),
        F.floor(F.col("d") / 12).alias("bkt"),
    )
    pairs = (
        a.join(b, ["user_id", "bkt"])
        .where(
            (
                (F.col("db") > F.col("da"))
                | ((F.col("db") == F.col("da")) & (F.col("event_b") > F.col("event_a")))
            )
            & (F.col("db") - F.col("da") <= 12)
            & (F.abs(F.col("vb") - F.col("va")) <= 5.0)
        )
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.col("db") - F.col("da")).cast("bigint").alias("temporal_baseline_days"),
            F.abs(F.col("vb") - F.col("va")).alias("angle_diff"),
        )
        .distinct()
    )
    return pairs.orderBy("user_id", "event_a", "event_b")


def cube_rgb_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A37 — multi-temporal RGB composite: three acquisition dates
    become the R/G/B channels per stack, each channel min-max
    stretched to 0-255 across its own date (the standard
    change-visualization product: colored pixels = change between
    dates, gray = stable).

    Exactness: channel means fold through decimals; the stretch is
    floor((v − min)·255/(max − min)) over identical doubles —
    shape-mirrored, integer output.

    Plan: one (stack, date) aggregate pivoted over THREE enumerated
    dates (no discovery pass), global per-date extrema via windows
    over the stack-bounded frame.
    """
    ev = catalog.load(spark, sf_dir, "events")
    dates = ["2024-01-05", "2024-01-15", "2024-01-25"]
    day = F.to_date(F.col("ts").cast("timestamp"))
    g = (
        ev.where(day.isin(dates))
        .groupBy(F.col("user_id").alias("stack_id"), day.alias("d"))
        .agg(davg("value").alias("v"))
        .groupBy("stack_id")
        .pivot("d", dates)
        .agg(F.first("v"))
        .withColumnRenamed(dates[0], "r_raw")
        .withColumnRenamed(dates[1], "g_raw")
        .withColumnRenamed(dates[2], "b_raw")
        .where(
            F.col("r_raw").isNotNull()
            & F.col("g_raw").isNotNull()
            & F.col("b_raw").isNotNull()
        )
    )
    wall = Window.partitionBy()

    def stretch(c: str) -> F.Column:
        mn = F.min(c).over(wall)
        mx = F.max(c).over(wall)
        return F.when(
            mx > mn,
            F.floor((F.col(c) - mn) * F.lit(255.0) / (mx - mn)).cast("int"),
        ).otherwise(F.lit(0))

    return g.select(
        "stack_id",
        stretch("r_raw").alias("r"),
        stretch("g_raw").alias("g"),
        stretch("b_raw").alias("b"),
    ).orderBy("stack_id")


def cube_hist_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A38 — histogram matching: remap the 'view' band's values onto
    the 'click' band's empirical distribution at the same quantile —
    the radiometric normalization step that makes two acquisitions
    comparable before change detection (A25 equalizes one layer
    against itself; this matches one layer TO another).

    Exactness: ranks and the pooled inverse-CDF lookup are integer
    arithmetic over micro-quantized values (discrete, no
    interpolation).

    Plan: the source layer's rank comes from the keyless
    distributed_rank (range-partition + broadcast offsets — the old
    global rank window funneled every source pixel through one task;
    r8 funnel sweep); the reference layer's CDF is
    DISTINCT-value-sized and broadcasts for the between-join — the
    P51 quantile-normalization shape applied to pixels.
    """
    from icecube_spark.operators.pipeline import distributed_rank

    ev = catalog.load(spark, sf_dir, "events")
    src = ev.where(F.col("event_type") == "view").select(
        "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("qv"),
    )
    ref = ev.where(F.col("event_type") == "click").select(
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("qv")
    )
    ranked = distributed_rank(
        src, ["qv", "event_id"], rank_col="__r", n_col="ns"
    ).select(
        "event_id",
        "qv",
        F.col("__r").cast("bigint").alias("r"),
        "ns",
    )
    cdf = (
        ref.groupBy("qv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("qv").alias("ref_qv"),
            F.sum("c")
            .over(
                Window.partitionBy().orderBy("qv")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum_hi"),
            F.coalesce(
                F.lag(F.sum("c").over(
                    Window.partitionBy().orderBy("qv")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ), 1).over(Window.partitionBy().orderBy("qv")),
                F.lit(0),
            ).alias("cum_lo"),
        )
    )
    nref = ref.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("nr"))
    target = ranked.crossJoin(F.broadcast(nref)).withColumn(
        "rk", F.expr("(r * nr + ns - 1) div ns")
    )
    from icecube_spark.operators.pipeline import cdf_between_lookup

    out = cdf_between_lookup(target, "rk", cdf)
    return out.select(
        "event_id",
        (F.col("qv").cast("double") / F.lit(1e6)).alias("value"),
        (F.col("ref_qv").cast("double") / F.lit(1e6)).alias("matched_value"),
    ).orderBy("event_id")


def cube_enl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A39 — Equivalent Number of Looks per (stack, band): ENL =
    mean²/variance of the band's amplitude values — THE standard SAR
    speckle-level metric (multilooked products quote it on the
    datasheet; despeckle filters are judged by how much they raise
    it, cf. A30's Lee filter).

    Exactness: moments fold from micro-quantized integers (the A19
    scheme); ENL quantizes to a 1e-9 grid (wide-int cast guard).

    Plan: one map-side-combined (stack, band) aggregate; the ENL
    arithmetic runs on dimension-bounded rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
    mom = ev.groupBy(
        F.col("user_id").alias("stack_id"),
        F.col("event_type").alias("band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_looks_raw"),
        F.sum(q).alias("sq"),
        F.sum(q.cast("decimal(38,0)") * q).alias("sq2"),
    )
    n = F.col("n_looks_raw").cast("double")
    s = F.col("sq").cast("double")
    s2 = F.col("sq2").cast("double")
    mean = s / n
    var = (s2 - s * s / n) / n
    enl = mean * mean / var
    return (
        mom.where(F.col("n_looks_raw") > 1)
        .select(
            "stack_id",
            "band",
            F.col("n_looks_raw").alias("n_samples"),
            (F.floor(enl * F.lit(1e9)) / F.lit(1e9)).alias("enl"),
        )
        .orderBy("stack_id", "band")
    )


def cube_cfar_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A40 — CA-CFAR (cell-averaging constant-false-alarm-rate)
    point-target detection on the sparse pixel grid: a cell is a
    detection when its value exceeds k× the mean of its clutter ring
    (Chebyshev distance exactly 2 — the 16 cells of the 5×5 window
    minus the 3×3 guard). This is the classic SAR ship/bright-target
    detector the reference's analytics stack feeds (slc_datacube.py
    intensity bands are CFAR's canonical input).

    Plan: same sparse-stencil discipline as focal_mean — cells
    aggregate once (map-side combine), each CELL emits exactly 16
    ring contributions, one groupBy on the target, one (x, y)
    co-partitioned join back to centers under AQE. Shuffle volume is
    16 × distinct cells at any scale, never 16 × raw events; at
    100 TB the grid is tiled per stack and the plan is unchanged.

    Exactness: ring values quantize to micro-units (floor(v·1e6) into
    BIGINT) before summing, so the ring mean and the k·mean compare
    are fixed-shape IEEE on both engines.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(davg("value").alias("v"))
    )
    ring = [
        (dx, dy)
        for dx in range(-2, 3)
        for dy in range(-2, 3)
        if max(abs(dx), abs(dy)) == 2
    ]
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ring
        ]
    )
    contrib = cells.select(
        "x", "y", "v", F.explode(offsets).alias("o")
    ).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        F.floor(F.col("v") * F.lit(1e6)).cast("bigint").alias("qv"),
    )
    rings = contrib.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ring"),
        F.sum("qv").alias("qsum"),
    )
    ring_mean = (
        F.col("qsum").cast("double") / F.col("n_ring").cast("double") / F.lit(1e6)
    )
    return (
        cells.join(
            rings,
            (F.col("x") == F.col("tx")) & (F.col("y") == F.col("ty")),
        )
        .where(F.col("n_ring") >= 12)
        .select(
            "x",
            "y",
            F.col("v").alias("center"),
            "n_ring",
            ring_mean.alias("ring_mean"),
            (F.col("v") > F.lit(1.5) * ring_mean).alias("is_detect"),
        )
        .orderBy("x", "y")
    )


def cube_aspect_octant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A41 — terrain aspect octants: the central-difference gradient
    (A23's stencil) classified into the 8 compass sectors by SIGN and
    |gx| vs |gy| comparisons only — the downhill-facing-direction
    layer of every terrain analysis (hillshade A34's discrete twin),
    with per-octant cell counts and mean gradient magnitude. Octant
    boundaries sit on the 45° diagonals, so classification is pure
    comparisons — no atan2, hence no transcendental parity hazard.

    Plan: the A23 4-offset stencil (shuffle = 4 × distinct cells),
    then an 8-row aggregate; magnitude means fold through floor(·1e6)
    BIGINT sums so the report hashes exactly.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(davg("value").alias("v"))
    )
    roles = F.array(
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("west").alias("role")),
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("east").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                 F.lit("south").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                 F.lit("north").alias("role")),
    )
    contrib = (
        cells.select("x", "y", "v", F.explode(roles).alias("r"))
        .select(
            (F.col("x") + F.col("r.dx")).alias("tx"),
            (F.col("y") + F.col("r.dy")).alias("ty"),
            F.col("r.role").alias("role"),
            "v",
        )
    )
    nb = contrib.groupBy("tx", "ty").agg(
        F.max(F.when(F.col("role") == "west", F.col("v"))).alias("w"),
        F.max(F.when(F.col("role") == "east", F.col("v"))).alias("e"),
        F.max(F.when(F.col("role") == "south", F.col("v"))).alias("s"),
        F.max(F.when(F.col("role") == "north", F.col("v"))).alias("n"),
    )
    gx = F.col("e") - F.col("w")
    gy = F.col("n") - F.col("s")
    ax, ay = F.abs(gx), F.abs(gy)
    # sector boundaries at 22.5° multiples: |gx| <= tan(22.5°)·|gy|
    # puts the vector within 22.5° of the N-S axis, and symmetrically
    # for E-W; everything else is a diagonal sector by sign pair
    c = F.lit(0.4142135623730951)
    octant = (
        F.when((gx == 0) & (gy == 0), F.lit("flat"))
        .when((ax <= c * ay) & (gy > 0), F.lit("N"))
        .when((ax <= c * ay) & (gy < 0), F.lit("S"))
        .when((ay <= c * ax) & (gx > 0), F.lit("E"))
        .when((ay <= c * ax) & (gx < 0), F.lit("W"))
        .when((gx > 0) & (gy > 0), F.lit("NE"))
        .when((gx > 0) & (gy < 0), F.lit("SE"))
        .when((gx < 0) & (gy > 0), F.lit("NW"))
        .otherwise(F.lit("SW"))
    )
    mag = F.sqrt(gx * gx / F.lit(4.0) + gy * gy / F.lit(4.0))
    interior = (
        cells.join(
            nb,
            (F.col("x") == F.col("tx")) & (F.col("y") == F.col("ty")),
        )
        .where(
            F.col("w").isNotNull() & F.col("e").isNotNull()
            & F.col("s").isNotNull() & F.col("n").isNotNull()
        )
        .select(octant.alias("octant"),
                F.floor(mag * F.lit(1e6)).cast("bigint").alias("qmag"))
    )
    return (
        interior.groupBy("octant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            (F.sum("qmag").cast("double")
             / F.count(F.lit(1)).cast("double") / F.lit(1e6)).alias("mean_mag"),
        )
        .orderBy("octant")
    )


def cube_glcm_texture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A42 — gray-level co-occurrence matrix (GLCM, offset (1,0))
    over the sparse pixel grid: quantize cell means to 8 gray
    levels, count horizontal neighbor pairs per (g1, g2), and emit
    the per-entry probability plus its contrast and homogeneity
    contributions. Haralick texture — the classic SAR land-cover
    discriminator (smooth water vs rough urban) the reference's GRD
    band-math users compute off-platform today.

    Exactness: gray levels are exact integer bin math on the
    micro-quantized cell means; pair counts are exact; p = cnt/total
    divides exact ints (both < 2^53) so every derived term is the
    same IEEE double in both engines — no snapping needed.

    Plan: the neighbor pairing is ONE equi-join of the cell grid
    against itself shifted by (1,0) (shuffle on (x,y) — co-located
    if the cube is written bucketed by tile); the GLCM itself is a
    64-row aggregate. Scales with distinct CELLS, not raw events.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev)
    ext = cells.agg(F.min("qv").alias("lo"), F.max("qv").alias("hi"))
    g = cells.crossJoin(F.broadcast(ext)).select(
        "x",
        "y",
        F.floor(
            ((F.col("qv") - F.col("lo")) * F.lit(8)).cast("double")
            / (F.col("hi") - F.col("lo") + 1).cast("double")
        )
        .cast("int")
        .alias("g"),
    )
    nb = g.select((F.col("x") - 1).alias("x"), F.col("y"), F.col("g").alias("g2"))
    pairs = g.join(nb, ["x", "y"]).select(F.col("g").alias("g1"), "g2")
    hist = pairs.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    tot = hist.agg(F.sum("n_pairs").alias("t"))
    p = F.col("n_pairs").cast("double") / F.col("t").cast("double")
    d = F.col("g1") - F.col("g2")
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("g1").cast("int").alias("g1"),
            F.col("g2").cast("int").alias("g2"),
            "n_pairs",
            p.alias("p"),
            (p * d * d).alias("contrast_term"),
            (p / (F.lit(1.0) + F.abs(d))).alias("homogeneity_term"),
        )
        .orderBy("g1", "g2")
    )


def cube_variogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A43 — empirical semivariogram along x at lags h=1..5:
    gamma(h) = sum (z(x+h,y) - z(x,y))^2 / (2 N_h) over the sparse
    pixel grid. THE geostatistics structure function (range/sill/
    nugget read-off) — the spatial-correlation profile a SAR analyst
    fits before kriging or choosing a speckle-filter window.

    Exactness: micro-quantized cell values; squared diffs fold in
    DECIMAL(38,0) (DuckDB HUGEINT twin); one final exact-integer →
    double division chain, identical in both engines.

    Plan: explode 5 lags, ONE (x+h, y) equi-join against the cell
    grid (shuffle keyed on the target cell — co-located under tile
    bucketing), then a 5-group aggregate. Cost scales with cells x
    lags, never with raw events.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev).select("x", "y", "qv")
    lagged = cells.select(
        "x", "y", "qv", F.explode(F.expr("sequence(1, 5)")).alias("h")
    ).select((F.col("x") + F.col("h")).alias("tx"), "y", "h", "qv")
    nb = cells.select(
        F.col("x").alias("tx"), F.col("y").alias("y"), F.col("qv").alias("qv2")
    )
    d = F.col("qv") - F.col("qv2")
    agg = (
        lagged.join(nb, ["tx", "y"])
        .select("h", (d.cast("decimal(38,0)") * d).alias("d2"))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("d2").alias("sd2"),
        )
    )
    gamma = (
        F.col("sd2").cast("double")
        / (F.lit(2.0) * F.col("n_pairs").cast("double"))
        / F.lit(1e12)
    )
    # 1e-9 snap: engines associate the division chain differently
    # (~1e-13 relative drift); the grid makes the rendering identical.
    return agg.select(
        F.col("h").cast("int").alias("lag"),
        "n_pairs",
        (F.floor(gamma * F.lit(1e9)) / F.lit(1e9)).alias("semivariance"),
    ).orderBy("lag")


def cube_median_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A44 — 3x3 median despeckle over the sparse pixel grid: each
    cell's filtered value is the (disc lower) median of its present
    3x3 neighbors. The rank-filter complement to A30's Lee filter —
    medians kill salt-and-pepper outliers that mean-based filters
    smear; SAR ops run one of the two before any thresholding.

    Exactness: the median is element ceil(n/2) of the SORTED
    micro-quantized neighbor list (n <= 9) — pure integer selection,
    one single-division readout to value units.

    Plan: the same bounded stencil-gather as A30 (9 contributions
    per cell, one (x,y) shuffle); the sort is over <= 9 elements per
    group. Scales with distinct cells only.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev).select("x", "y", "qv")
    offs = F.expr("explode(sequence(-1, 1))")
    contrib = (
        cells.select("x", "y", "qv", offs.alias("dx"))
        .select("x", "y", "qv", "dx", F.expr("explode(sequence(-1, 1))").alias("dy"))
        .select(
            (F.col("x") + F.col("dx")).alias("tx"),
            (F.col("y") + F.col("dy")).alias("ty"),
            "qv",
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    med = (
        contrib.groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sort_array(F.collect_list("qv")).alias("vals"),
        )
        .join(
            cells.select(F.col("x").alias("tx"), F.col("y").alias("ty")),
            ["tx", "ty"],
        )
    )
    pick = F.element_at(
        "vals", F.ceil(F.col("n_cells") / F.lit(2.0)).cast("int")
    )
    return med.select(
        F.col("tx").alias("x"),
        F.col("ty").alias("y"),
        "n_cells",
        (pick.cast("double") / F.lit(1e6)).alias("median_value"),
    ).orderBy("x", "y")


def cube_ring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A45 — radial ring profile from the grid center: cells band by
    floor(sqrt((x-500)^2+(y-500)^2)/50) and each ring reports count
    and mean/min/max value. The range-profile readout (antenna
    pattern falloff, incidence-angle banding, vignette checks) SAR
    calibration teams pull from every scene.

    Exactness: r^2 is exact integer math; sqrt of an exact int is
    the identical correctly-rounded double in both engines, so the
    band floor agrees; ring moments are exact-int folds with
    single-division readouts.

    Plan: band assignment is map-side; one <=15-group aggregate.
    Scales with cells; no shuffle beyond the ring rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev).select("x", "y", "qv")
    r2 = (
        (F.col("x") - F.lit(500)) * (F.col("x") - F.lit(500))
        + (F.col("y") - F.lit(500)) * (F.col("y") - F.lit(500))
    )
    banded = cells.select(
        F.floor(F.sqrt(r2.cast("double")) / F.lit(50.0)).cast("int").alias(
            "ring"
        ),
        "qv",
    )
    agg = banded.groupBy("ring").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("qv").alias("s"),
        F.min("qv").alias("mn"),
        F.max("qv").alias("mx"),
    )
    return agg.select(
        "ring",
        "n_cells",
        (
            F.col("s").cast("double")
            / (F.col("n_cells").cast("double") * F.lit(1e6))
        ).alias("mean_value"),
        (F.col("mn").cast("double") / F.lit(1e6)).alias("min_value"),
        (F.col("mx").cast("double") / F.lit(1e6)).alias("max_value"),
    ).orderBy("ring")


def cube_ruggedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A46 — terrain ruggedness index (TRI, Riley 1999 mean-|diff|
    form): per cell, the mean absolute value difference to its
    present 8-neighbors. The terrain-complexity layer between A22's
    smoothing view and A23's directional gradient — flat vs rugged
    classification for layover/shadow masking.

    Exactness: absolute diffs of micro-quantized values are exact
    BIGINTs; the per-cell mean is one single-division readout.

    Plan: the A30-shaped bounded stencil (8 contributions per cell,
    one (x,y) shuffle), then a per-cell aggregate. Scales with
    distinct cells.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = _pixel_cells(ev).select("x", "y", "qv")
    contrib = (
        cells.select("x", "y", "qv", F.expr("explode(sequence(-1, 1))").alias("dx"))
        .select("x", "y", "qv", "dx", F.expr("explode(sequence(-1, 1))").alias("dy"))
        .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("x") + F.col("dx")).alias("tx"),
            (F.col("y") + F.col("dy")).alias("ty"),
            F.col("qv").alias("nqv"),
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 1000)
            & (F.col("ty") >= 0) & (F.col("ty") < 1000)
        )
    )
    center = cells.select(
        F.col("x").alias("tx"), F.col("y").alias("ty"), F.col("qv")
    )
    gathered = contrib.join(center, ["tx", "ty"]).select(
        "tx", "ty", F.abs(F.col("qv") - F.col("nqv")).alias("ad")
    )
    agg = gathered.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        F.sum("ad").alias("sad"),
    )
    return agg.select(
        F.col("tx").alias("x"),
        F.col("ty").alias("y"),
        "n_neighbors",
        (
            F.col("sad").cast("double")
            / (F.col("n_neighbors").cast("double") * F.lit(1e6))
        ).alias("tri"),
    ).orderBy("x", "y")


def cube_layover_shadow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A47 — layover/shadow candidate masking from the A23
    central-difference gradient on the 50x50 dense grid: a cell
    whose east-west twice-gradient exceeds +4.0 value units leans
    toward the (+x-looking) sensor — layover candidate; below -4.0
    it faces away — shadow candidate. The geometry pre-mask every
    SAR terrain pipeline applies before radiometric use.

    Exactness: classification happens on EXACT integer
    twice-gradients (E-W in micro-units — no /2, no floats); the
    reported gradient is one single-division readout.

    Plan: A23's 2-offset stencil (E/W contributions only), one
    (x,y) shuffle, map-side classify. Scales with cells.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
    # grid-bounded (≤50×50) and multi-referenced: checkpoint so the
        # events scan + cell aggregate run once (guide §5)
        .transform(materialize)
    )
    east = cells.select(
        (F.col("x") - 1).alias("x"), "y", F.col("qv").alias("e")
    )
    west = cells.select(
        (F.col("x") + 1).alias("x"), "y", F.col("qv").alias("w")
    )
    g = cells.join(east, ["x", "y"]).join(west, ["x", "y"]).select(
        "x", "y", (F.col("e") - F.col("w")).alias("g2")
    )
    cls = (
        F.when(F.col("g2") > 4_000_000, F.lit("layover"))
        .when(F.col("g2") < -4_000_000, F.lit("shadow"))
        .otherwise(F.lit("ok"))
    )
    return g.select(
        "x",
        "y",
        (F.col("g2").cast("double") / F.lit(2e6)).alias("gx"),
        cls.alias("mask_class"),
    ).orderBy("x", "y")


def cube_integral_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A48 — summed-area table (integral image) over the 50x50 dense
    grid: sat(x,y) = sum of cell values over x'<=x, y'<=y, plus the
    O(1) rectangle-mean readout it enables. The precomputation behind
    constant-time box filters, adaptive thresholding, and Haar
    features on rasters (Crow 1984; Viola-Jones 2001).

    Exactness: cell values quantize to micro-unit BIGINTs before the
    two prefix passes (integer sums, order-free); sat and rect_mean
    are single-division readouts of the exact integer.

    Plan: separable prefix sums — one window partitioned by raster
    row then one by column, each partition bounded by the grid edge
    (never corpus-sized), no global sort. Prefix sums run over the
    OBSERVED cells (sparse grids skip absent cells identically in
    both engines; the test grids are dense).
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
    # grid-bounded (≤50×50) and multi-referenced: checkpoint so the
        # events scan + cell aggregate run once (guide §5)
        .transform(materialize)
    )
    wrow = (
        Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rowp = cells.select("x", "y", F.sum("qv").over(wrow).alias("rq"))
    wcol = (
        Window.partitionBy("x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sat = rowp.select("x", "y", F.sum("rq").over(wcol).alias("qsat"))
    return sat.select(
        "x",
        "y",
        (F.col("qsat").cast("double") / F.lit(1e6)).alias("sat"),
        (
            F.col("qsat").cast("double")
            / ((F.col("x") + 1) * (F.col("y") + 1)).cast("double")
            / F.lit(1e6)
        ).alias("rect_mean"),
    ).orderBy("x", "y")


def cube_flow_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A49 — D8 flow direction over the 50x50 dense grid: each cell
    drains to the steepest-descent neighbor among its 8 (drop/
    distance, diagonal distance sqrt2), ESRI direction codes E=1,
    SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128, 0 = pit/flat (no
    downhill neighbor). The first step of every hydrological
    routing / watershed-delineation pipeline (O'Callaghan & Mark
    1984).

    Exactness: steepness compares EXACT scaled integers — cardinal
    drops x1414214, diagonal x1000000 (the sqrt2 ratio pinned as
    integer literals) — and ties break to the smallest code via
    min_by/arg_min; the reported drop is a single-division readout.

    Plan: the 8-neighbor stencil is a union of 8 shifted projections
    of the cell table joined on (x, y) — one bounded-fanout shuffle,
    no window over the corpus; argmax + tie-break are per-cell aggs.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
    # grid-bounded (≤50×50) and multi-referenced: checkpoint so the
        # events scan + cell aggregate run once (guide §5)
        .transform(materialize)
    )
    offs = [
        (1, 0, 1, 1414214), (1, 1, 2, 1000000), (0, 1, 4, 1414214),
        (-1, 1, 8, 1000000), (-1, 0, 16, 1414214), (-1, -1, 32, 1000000),
        (0, -1, 64, 1414214), (1, -1, 128, 1000000),
    ]
    # explode-scatter: ONE pass over cells fans out the 8 offsets
    # (a union of 8 shifted projections re-runs the cell aggregate
    # per branch - 9 scans and 6x the wall time at sf0.1).
    off_arr = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(code).alias("code"),
                F.lit(fac).cast("bigint").alias("fac"),
            )
            for dx, dy, code, fac in offs
        ]
    )
    nbrs = cells.select(
        "x", "y", "qv", F.explode(off_arr).alias("o")
    ).select(
        (F.col("x") - F.col("o.dx")).alias("x"),
        (F.col("y") - F.col("o.dy")).alias("y"),
        F.col("qv").alias("nbqv"),
        F.col("o.code").alias("code"),
        F.col("o.fac").alias("fac"),
    )
    # every frame here is grid-bounded (<=50x50 cells, x8 stencil
    # fanout) at ANY corpus scale, but cells is a materialized
    # ExistingRDD whose stats default to "huge" and the joins fall
    # back to SortMergeJoin without explicit broadcasts
    cand = nbrs.join(F.broadcast(cells), ["x", "y"]).select(
        "x",
        "y",
        "code",
        ((F.col("qv") - F.col("nbqv")) * F.col("fac")).alias("score"),
        (F.col("qv") - F.col("nbqv")).alias("dq"),
    )
    down = cand.where(F.col("score") > 0)
    best = down.groupBy("x", "y").agg(F.max("score").alias("ms"))
    chosen = (
        down.join(F.broadcast(best), ["x", "y"])
        .where(F.col("score") == F.col("ms"))
        .groupBy("x", "y")
        .agg(
            F.min("code").alias("dir"),
            F.min_by("dq", "code").alias("dqb"),
        )
    )
    return (
        cells.join(F.broadcast(chosen), ["x", "y"], "left")
        .select(
            "x",
            "y",
            F.coalesce(F.col("dir"), F.lit(0)).cast("int").alias("dir"),
            F.coalesce(
                F.col("dqb").cast("double") / F.lit(1e6), F.lit(0.0)
            ).alias("drop"),
        )
        .orderBy("x", "y")
    )


def cube_contour_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A50 — contour-band extraction over the 50x50 dense grid: cells
    classify into 5-unit elevation bands and a cell is a CONTOUR
    (boundary) cell when any 4-neighbor lies in a different band.
    Per band: cell count, boundary count, boundary share — the
    vectorize-isolines precursor and a terrain-complexity readout
    per elevation slice.

    Exactness: band ids are exact integer floors of the micro-unit
    cell values; boundary detection compares exact ints; the share
    is one division.

    Plan: a 4-shifted-projection stencil join (bounded fanout, one
    (x,y) shuffle) then a bands-bounded aggregate. Edge cells
    compare only their PRESENT neighbors — identical rule in both
    engines.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
    # grid-bounded (≤50×50) and multi-referenced: checkpoint so the
        # events scan + cell aggregate run once (guide §5)
        .transform(materialize)
    ).withColumn("band", F.floor(F.col("qv") / F.lit(5_000_000)).cast("bigint"))
    off_arr = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in [(1, 0), (-1, 0), (0, 1), (0, -1)]
        ]
    )
    nbrs = cells.select(
        "x", "y", "band", F.explode(off_arr).alias("o")
    ).select(
        (F.col("x") - F.col("o.dx")).alias("x"),
        (F.col("y") - F.col("o.dy")).alias("y"),
        F.col("band").alias("nb_band"),
    )
    flags = (
        cells.join(nbrs, ["x", "y"])
        .groupBy("x", "y", "band")
        .agg(
            F.max(
                F.when(F.col("nb_band") != F.col("band"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("is_boundary")
        )
    )
    return (
        flags.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("is_boundary").cast("bigint").alias("n_boundary"),
        )
        .select(
            "band",
            (F.col("band").cast("double") * F.lit(5.0)).alias("band_floor"),
            "n_cells",
            "n_boundary",
            (
                F.col("n_boundary").cast("double")
                / F.col("n_cells").cast("double")
            ).alias("boundary_share"),
        )
        .orderBy("band")
    )


def cube_swath_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A51 — acquisition-coverage timeline over the 50x50 grid: per
    day, observations, distinct cells touched, NEWLY covered cells
    (first-ever observation) and the cumulative coverage share of
    the full grid. The swath-planning readout every tasking/
    monitoring constellation dashboard leads with — "when did we
    first see everything?".

    Exactness: pure integer counting (first-seen via min(day), the
    cumulative via an ordered-window integer sum); shares are single
    divisions.

    Plan: one (cell) aggregate for first-seen days, one (day)
    aggregate for activity, a broadcast join of the two day-bounded
    frames and a calendar-bounded running-sum window (single
    partition of ~hundreds of day rows — flat at any corpus size).
    """
    ev = catalog.load(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_num"),
    )
    per_day = obs.groupBy("day_num").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.countDistinct("x", "y").cast("bigint").alias("n_cells"),
    )
    first_seen = obs.groupBy("x", "y").agg(F.min("day_num").alias("fd"))
    grid_n = first_seen.agg(
        F.count(F.lit(1)).cast("bigint").alias("grid_cells")
    )
    new_per_day = first_seen.groupBy(F.col("fd").alias("day_num")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        per_day.join(F.broadcast(new_per_day), "day_num", "left")
        .select(
            "day_num",
            "n_obs",
            "n_cells",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_cells", F.sum("n_new").over(w))
    )
    return (
        joined.join(F.broadcast(grid_n))
        .select(
            "day_num",
            "n_obs",
            "n_cells",
            "n_new",
            "cum_cells",
            (
                F.col("cum_cells").cast("double")
                / F.col("grid_cells").cast("double")
            ).alias("coverage_share"),
        )
        .orderBy("day_num")
    )


def cube_lbp_texture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A52 — local-binary-pattern texture histogram over the 50x50
    dense grid: each interior cell gets an 8-bit code (bit set when
    the neighbor in E,SE,S,SW,W,NW,N,NE order is >= the center) and
    the grid reports the code histogram. The classic rotation-
    sensitive micro-texture fingerprint (Ojala et al. 2002) — the
    pixel-level complement of A44's GLCM co-occurrence stats, used
    to separate speckle, ridges and flats before any SAR classifier.

    Exactness: bit decisions compare exact micro-unit ints; the
    histogram is pure integer counting with one share division.

    Plan: one 8-shifted stencil join (bounded fanout), a per-cell
    8-row aggregate folding bits into the code, then a <=256-row
    histogram agg.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .groupBy("x", "y")
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
    # grid-bounded (≤50×50) and multi-referenced: checkpoint so the
        # events scan + cell aggregate run once (guide §5)
        .transform(materialize)
    )
    offs = [
        (1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
        (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128),
    ]
    off_arr = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(bit).alias("bit"),
            )
            for dx, dy, bit in offs
        ]
    )
    nbrs = cells.select(
        "x", "y", "qv", F.explode(off_arr).alias("o")
    ).select(
        (F.col("x") - F.col("o.dx")).alias("x"),
        (F.col("y") - F.col("o.dy")).alias("y"),
        F.col("qv").alias("nbqv"),
        F.col("o.bit").alias("bit"),
    )
    codes = (
        cells.join(nbrs, ["x", "y"])
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_nb"),
            F.sum(
                F.when(F.col("nbqv") >= F.col("qv"), F.col("bit")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("code"),
        )
        .where(F.col("n_nb") == 8)
    )
    tot = codes.agg(F.count(F.lit(1)).cast("bigint").alias("n_interior"))
    return (
        codes.groupBy("code")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
        .join(F.broadcast(tot))
        .select(
            F.col("code").cast("int").alias("lbp_code"),
            "n_cells",
            (
                F.col("n_cells").cast("double")
                / F.col("n_interior").cast("double")
            ).alias("share"),
        )
        .orderBy("lbp_code")
    )


def cube_revisit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A53 — per-cell revisit cadence over the 50x50 grid: for each
    cell, the number of distinct observation days and the mean/max
    gap between consecutive revisits. The constellation-tasking SLA
    readout ("every cell revisited within N days?") that A51's
    corpus-level coverage timeline can't answer — this is the
    per-target view.

    Exactness: day numbers and gaps are exact ints; the mean gap is
    one division.

    Plan: one (cell, day) distinct aggregate, a lag window whose
    partitions are single cells (calendar-bounded), then a per-cell
    aggregate. No corpus-wide window.
    """
    ev = catalog.load(spark, sf_dir, "events")
    obs = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
        )
        .groupBy("x", "y", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    w = Window.partitionBy("x", "y").orderBy("d")
    gaps = obs.select(
        "x",
        "y",
        "n_obs",
        (F.col("d") - F.lag("d").over(w)).alias("gap"),
    )
    return (
        gaps.groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("n_obs").cast("bigint").alias("n_obs"),
            F.sum("gap").cast("bigint").alias("gap_sum"),
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.max("gap").cast("bigint").alias("max_gap_days"),
        )
        .select(
            "x",
            "y",
            "n_days",
            "n_obs",
            F.when(
                F.col("n_gaps") > 0,
                F.col("gap_sum").cast("double")
                / F.col("n_gaps").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_gap_days"),
            F.coalesce(F.col("max_gap_days"), F.lit(0)).alias("max_gap_days"),
        )
        .orderBy("x", "y")
    )


def cube_class_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A54 — land-cover-style class-transition matrix: classify each
    cell into 5-unit value bands in the first and second calendar
    half, then count band-to-band transitions (diagonal = stable).
    The bi-temporal change-detection summary (A16 flags per-cell
    change magnitude; this is the FROM->TO accounting every change
    report tabulates).

    Exactness: per-half cell means quantize to micro-units before
    integer band floors; transition counts and shares are exact.

    Plan: one (cell, half) aggregate, a self-join on the cell key
    (grid-bounded), a <=bands^2 transition aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    base = ev.select(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.col("value"),
    )
    mid = base.agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    halves = (
        base.crossJoin(F.broadcast(mid))
        .groupBy("x", "y", (F.col("d") <= F.col("mid")).alias("h1"))
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("qv")
        )
        .withColumn(
            "band", F.floor(F.col("qv") / F.lit(5_000_000)).cast("bigint")
        )
        # grid-bounded (≤2·50×50 rows) and read twice by the from/to
        # self-join: checkpoint so the events scan + half aggregate
        # run once (guide §5)
        .transform(materialize)
    )
    a = halves.where(F.col("h1")).select(
        "x", "y", F.col("band").alias("from_band")
    )
    b = halves.where(~F.col("h1")).select(
        "x", "y", F.col("band").alias("to_band")
    )
    trans = a.join(b, ["x", "y"]).groupBy("from_band", "to_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells")
    )
    wf = Window.partitionBy("from_band")
    return trans.select(
        "from_band",
        "to_band",
        "n_cells",
        (
            F.col("n_cells").cast("double")
            / F.sum("n_cells").over(wf).cast("double")
        ).alias("row_share"),
    ).orderBy("from_band", "to_band")


def cube_temporal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A55 — per-cell temporal anomaly accounting: z-score each cell's
    daily mean against that cell's own day-to-day history, then
    report per day how much of the grid is anomalous (|z| > 2) and
    how hot it runs on average. A16 compares two fixed epochs; C11
    z-scores one aggregate series — this is the per-layer spatial
    roll-up of per-cell temporal z-scores that a change-monitoring
    dashboard plots as a timeline (reference stack-screening over
    sar_datacube.py temporal stacks).

    Exactness: daily cell means are decimal-summed then
    micro-quantized to integers; per-cell moments fold those integers
    exactly; |z| is re-quantized before the per-day mean so the
    final fold is integer-exact.

    Plan: one (cell, day) aggregate, per-cell moments on the
    calendar-bounded frame (grid-bounded rows), one day aggregate
    over <= n_cells rows per layer.
    """
    ev = catalog.load(spark, sf_dir, "events")
    monthly = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q")
    )
    mom = monthly.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sx"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / F.lit(1e6) / n
    sig = (
        F.sqrt(
            F.greatest(
                n * (F.col("sxx").cast("double") / F.lit(1e12))
                - (F.col("sx").cast("double") / F.lit(1e6))
                * (F.col("sx").cast("double") / F.lit(1e6)),
                F.lit(0.0),
            )
        )
        / n
    )
    scored = monthly.join(
        mom.select("x", "y", mu.alias("mu"), sig.alias("sig")), ["x", "y"]
    ).where(F.col("sig") > 0)
    absz = F.abs(
        (F.col("q").cast("double") / F.lit(1e6) - F.col("mu")) / F.col("sig")
    )
    return (
        scored.select(
            "day", F.floor(absz * F.lit(1e6)).cast("bigint").alias("zq")
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.count_if(F.col("zq") > 2_000_000)
            .cast("bigint")
            .alias("n_anomalous"),
            (
                F.count_if(F.col("zq") > 2_000_000).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("anomalous_share"),
            (
                F.sum("zq").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_abs_z"),
        )
        .orderBy("day")
    )


def cube_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A56 — 4-neighbor Laplacian (curvature) of the value grid:
    lap = z(x-1,y) + z(x+1,y) + z(x,y-1) + z(x,y+1) - 4·z(x,y), the
    second-derivative stencil under A22's focal mean and A23's first
    derivative — positive = pit, negative = peak, zero = planar.
    Only cells with a complete 5-point stencil are scored, so sparse
    grids never fabricate curvature from missing neighbors.

    Exactness: cell values are micro-quantized integer means; the
    stencil fold is pure integer arithmetic (one double division at
    the end).

    Plan: one (cell) aggregate, then the explode-scatter stencil (a
    single 5-way fanout + re-aggregate on the target cell — no
    5-way self-join), grid-bounded throughout.
    """
    ev = catalog.load(spark, sf_dir, "events")
    grid = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    scatter = grid.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("dx"), F.lit(0).alias("dy"),
                         F.lit(-4).alias("w")),
                F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                         F.lit(1).alias("w")),
                F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                         F.lit(1).alias("w")),
                F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                         F.lit(1).alias("w")),
                F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                         F.lit(1).alias("w")),
            )
        ).alias("s"),
        "x",
        "y",
        "q",
    ).select(
        (F.col("x") + F.col("s.dx")).alias("tx"),
        (F.col("y") + F.col("s.dy")).alias("ty"),
        (F.col("s.w").cast("bigint") * F.col("q")).alias("wq"),
    )
    return (
        scatter.where(
            (F.col("tx") >= 0) & (F.col("tx") <= 49)
            & (F.col("ty") >= 0) & (F.col("ty") <= 49)
        )
        .groupBy(F.col("tx").alias("x"), F.col("ty").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_contrib"),
            F.sum("wq").alias("lapq"),
        )
        .where(F.col("n_contrib") == 5)
        .select(
            "x",
            "y",
            (F.col("lapq").cast("double") / F.lit(1e6)).alias("laplacian"),
        )
        .orderBy("x", "y")
    )


def cube_destripe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A57 — striping/banding audit: per image column, how far the
    column mean sits from the global mean (the vertical-stripe bias a
    destriping pass would subtract — antenna-pattern/range banding in
    SAR, detector striping in optical). A25 equalizes the histogram
    globally; this isolates the column-structured component.

    Exactness: column and global means come from one integer-moment
    fold each (micro-quantized cell means); the bias is a difference
    of exact-integer-derived doubles.

    Plan: one (cell) aggregate, one (column) aggregate, one broadcast
    global mean; output bounded by grid width.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    cols = cells.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("q").alias("sq"),
    )
    glob = cells.agg(
        (
            F.sum("q").cast("double")
            / F.lit(1e6)
            / F.count(F.lit(1)).cast("double")
        ).alias("global_mean")
    )
    col_mean = F.col("sq").cast("double") / F.lit(1e6) / F.col(
        "n_cells"
    ).cast("double")
    return (
        cols.crossJoin(F.broadcast(glob))
        .select(
            "x",
            "n_cells",
            col_mean.alias("col_mean"),
            "global_mean",
            (col_mean - F.col("global_mean")).alias("stripe_bias"),
        )
        .orderBy("x")
    )


def cube_quadtree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A58 — adaptive quadtree tiling of the value grid: starting
    from the 48x48 crop as one tile, any tile whose cell-mean
    variance exceeds the threshold splits into four, down to 3x3
    leaves. Reports the leaf-tile census per depth — the
    variance-adaptive tiling a raster store uses to spend small
    tiles only where the scene has structure (flat water = one big
    tile, urban texture = many small ones).

    Exactness: block variances fold exact integer moments
    (micro-quantized cell means) into one fixed-order double; the
    split decision compares identical doubles; leaf accounting is
    pure integers.

    Plan: five resolution aggregates over the SAME cell frame (grid-
    bounded), chained parent→child by integer-division keys with
    broadcast-sized joins per level; no iteration beyond the fixed
    5-level pyramid.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
            F.col("value"),
        )
        .where((F.col("x") < 48) & (F.col("y") < 48))
        .groupBy("x", "y")
        .agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
        # grid-bounded (≤48x48 rows) and referenced by all five level
        # aggregates PLUS the alive-chain joins — without this the
        # events scan + cell aggregate re-runs once per reference
        # (guide §5: cache a tiny reused intermediate, cut the lineage)
        .transform(materialize)
    )
    thr = 5.5e14  # micro^2 units (~grid median block variance)
    levels = []
    for d in range(5):
        s = 48 >> d
        blk = cells.groupBy(
            F.floor(F.col("x") / F.lit(s)).cast("bigint").alias("bx"),
            F.floor(F.col("y") / F.lit(s)).cast("bigint").alias("by"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("q").alias("sx"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias(
                "sxx"
            ),
        )
        n = F.col("n_cells").cast("double")
        var = (
            n * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ) / (n * n)
        levels.append(
            blk.select(
                "bx",
                "by",
                "n_cells",
                var.alias("var"),
                (var > F.lit(thr)).alias("split"),
            )
        )
    leaves = []
    alive = levels[0]
    for d in range(5):
        is_last = d == 4
        leaf_cond = (
            F.lit(True) if is_last else ~F.col("split")
        )
        leaves.append(
            alive.where(leaf_cond).select(
                F.lit(d).alias("depth"), "n_cells", "var"
            )
        )
        if is_last:
            break
        parents = alive.where(F.col("split")).select(
            F.col("bx").alias("pbx"), F.col("by").alias("pby")
        )
        child = levels[d + 1]
        alive = child.join(
            F.broadcast(parents),
            (F.floor(F.col("bx") / 2) == F.col("pbx"))
            & (F.floor(F.col("by") / 2) == F.col("pby")),
        ).select("bx", "by", "n_cells", "var", "split")
    alll = leaves[0]
    for lf in leaves[1:]:
        alll = alll.unionAll(lf)
    return (
        alll.groupBy("depth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_leaves"),
            F.sum("n_cells").cast("bigint").alias("cells_covered"),
            (
                F.sum(
                    F.floor(F.col("var") / F.lit(1e6)).cast("bigint")
                ).cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_leaf_var"),
        )
        .orderBy("depth")
    )


def cube_inpaint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A59 — nodata inpainting: the bottom-5% cells by mean value are
    treated as nodata (dropout/shadow speckle) and re-estimated from
    the exact mean of their VALID 8-neighbors (>= 3 donors required)
    — the neighbor-mean fill a mosaicking chain runs before
    compositing (A17). A4 fills TEMPORAL gaps per cell; this fills
    SPATIAL holes per layer.

    Exactness: the nodata set is an exact integer rank cut (ties by
    cell key); donor means divide exact integer sums of
    micro-quantized cell means.

    Plan: one cell aggregate, one rank window over the grid-bounded
    frame, the single explode-scatter stencil from A35 (valid cells
    scatter to neighbors; a groupBy on the target recovers donor
    sums — no mask self-join), an inner join back to the hole set.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    wr = Window.partitionBy().orderBy("q", "x", "y")
    wn = Window.partitionBy()
    flagged = cells.select(
        "x",
        "y",
        "q",
        (
            F.row_number().over(wr)
            <= F.expr("count(*) over () div 20")
        ).alias("is_hole"),
    )
    offsets = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    ]
    scatter = (
        flagged.where(~F.col("is_hole"))
        .select("x", "y", "q", F.explode(F.array(*offsets)).alias("o"))
        .select(
            (F.col("x") + F.col("o.dx")).alias("tx"),
            (F.col("y") + F.col("o.dy")).alias("ty"),
            "q",
        )
        .where(
            (F.col("tx") >= 0) & (F.col("tx") < 50)
            & (F.col("ty") >= 0) & (F.col("ty") < 50)
        )
    )
    donors = scatter.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_donors"),
        F.sum("q").alias("sq"),
    )
    holes = flagged.where(F.col("is_hole")).select(
        F.col("x").alias("tx"), F.col("y").alias("ty"),
        F.col("q").alias("oldq"),
    )
    return (
        holes.join(donors, ["tx", "ty"])
        .where(F.col("n_donors") >= 3)
        .select(
            F.col("tx").alias("x"),
            F.col("ty").alias("y"),
            (F.col("oldq").cast("double") / F.lit(1e6)).alias(
                "nodata_value"
            ),
            "n_donors",
            (
                F.col("sq").cast("double")
                / F.lit(1e6)
                / F.col("n_donors").cast("double")
            ).alias("filled_value"),
        )
        .orderBy("x", "y")
    )


def cube_velocity_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A60 — per-cell velocity map: least-squares slope of each cell's
    daily mean value over time, with fit quality — the persistent-
    scatterer "velocity field" an InSAR time-series processor derives
    from a deformation stack (A55 flags WHEN a cell is anomalous;
    this measures the RATE it drifts). Only cells observed on >= 3
    days are scored.

    Exactness: daily cell means are micro-quantized integers; every
    regression moment is an exact integer fold; slope and r² are
    fixed-order doubles from those integers.

    Plan: one (cell, day) aggregate, one cell-level regression fold —
    grid-bounded output, no windows, no joins.
    """
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    mom = daily.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("d").alias("sx"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("sxx"),
        F.sum("q").alias("sy"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("syy"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("q")).alias("sxy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double") / F.lit(1e6)
    syy = F.col("syy").cast("double") / F.lit(1e12)
    sxy = F.col("sxy").cast("double") / F.lit(1e6)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    return (
        mom.where(F.col("n_days") >= 3)
        .select(
            "x",
            "y",
            "n_days",
            (num / denx).alias("velocity_per_day"),
            F.when(
                deny > 0, (num * num) / (denx * deny)
            )
            .otherwise(F.lit(0.0))
            .alias("r2"),
        )
        .orderBy("x", "y")
    )


def cube_box_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A61 — box-counting fractal dimension of the bright mask
    (cell mean >= 50): occupied boxes at scales 1/2/4/8 plus the
    log-log regression slope (-slope = dimension). Distinguishes
    compact blobs (D→2) from filamentary scatter (D→1) — the
    roughness summary beside A46's ruggedness, standard in flood and
    coastline products.

    Exactness: box occupancy is exact set logic; the regression folds
    micro-nat quantized logs of exact integer counts.

    Plan: one cell aggregate feeds four box aggregates (each a
    coarser integer-division key), a 4-row log-log fold; everything
    after the first agg is grid-bounded.
    """
    ev = catalog.load(spark, sf_dir, "events")
    mask = (
        ev.groupBy(
            (F.col("event_id") % 50).alias("x"),
            ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        )
        .agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
        .where(F.col("q") >= 50_000_000)
        .select("x", "y")
        # grid-bounded (≤48x48 rows) and referenced by all four box
        # scales — checkpoint once so the events scan + cell aggregate
        # run once, not per scale (guide §5)
        .transform(materialize)
    )
    counts = None
    for s in (1, 2, 4, 8):
        row = (
            mask.select(
                F.floor(F.col("x") / F.lit(s)).alias("bx"),
                F.floor(F.col("y") / F.lit(s)).alias("by"),
            )
            .distinct()
            .agg(
                F.lit(s).alias("scale"),
                F.count(F.lit(1)).cast("bigint").alias("n_boxes"),
            )
        )
        counts = row if counts is None else counts.unionAll(row)
    pts = counts.select(
        "scale",
        "n_boxes",
        F.floor(F.log(F.lit(1.0) * F.col("scale")) * F.lit(1e6))
        .cast("bigint")
        .alias("lx"),
        F.floor(F.log(F.col("n_boxes").cast("double")) * F.lit(1e6))
        .cast("bigint")
        .alias("ly"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("lx")).alias("sxx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("ly")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (
        n * (F.col("sxy").cast("double") / F.lit(1e12))
        - (F.col("sx").cast("double") / F.lit(1e6))
        * (F.col("sy").cast("double") / F.lit(1e6))
    ) / (
        n * (F.col("sxx").cast("double") / F.lit(1e12))
        - (F.col("sx").cast("double") / F.lit(1e6))
        * (F.col("sx").cast("double") / F.lit(1e6))
    )
    return pts.select("scale", "n_boxes").crossJoin(
        F.broadcast(mom.select((-slope).alias("fractal_dimension")))
    ).orderBy("scale")


def cube_change_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A62 — change-vector analysis between calendar halves: per cell,
    the change vector in (mean, spread) feature space — magnitude
    plus direction quadrant (brighter/noisier etc.) — then the
    per-quadrant census. A16 thresholds a single ratio; CVA keeps
    the 2-D geometry, the standard multi-band change classifier.

    Exactness: per-half mean and std come from exact integer moments;
    magnitude/quadrant derive from those doubles; census counts are
    exact.

    Plan: one (cell, half) aggregate, a grid-bounded cell self-join,
    a <=4-row census.
    """
    ev = catalog.load(spark, sf_dir, "events")
    base = ev.select(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("q"),
    )
    mid = base.agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    halves = (
        base.crossJoin(F.broadcast(mid))
        .groupBy("x", "y", (F.col("d") <= F.col("mid")).alias("h1"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").alias("sx"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias(
                "sxx"
            ),
        )
        # grid-bounded (≤2·50×50 rows) and read twice by the from/to
        # self-join: checkpoint so the events scan + half aggregate
        # run once (guide §5)
        .transform(materialize)
    )
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / F.lit(1e6) / n
    sig = (
        F.sqrt(
            F.greatest(
                n * (F.col("sxx").cast("double") / F.lit(1e12))
                - (F.col("sx").cast("double") / F.lit(1e6))
                * (F.col("sx").cast("double") / F.lit(1e6)),
                F.lit(0.0),
            )
        )
        / n
    )
    feat = halves.select("x", "y", "h1", mu.alias("mu"), sig.alias("sig"))
    a = feat.where(F.col("h1")).select(
        "x", "y", F.col("mu").alias("mu1"), F.col("sig").alias("sig1")
    )
    b = feat.where(~F.col("h1")).select(
        "x", "y", F.col("mu").alias("mu2"), F.col("sig").alias("sig2")
    )
    dmu = F.col("mu2") - F.col("mu1")
    dsig = F.col("sig2") - F.col("sig1")
    quad = F.concat(
        F.when(dmu >= 0, F.lit("brighter")).otherwise(F.lit("darker")),
        F.lit("_"),
        F.when(dsig >= 0, F.lit("noisier")).otherwise(F.lit("calmer")),
    )
    mag_q = F.floor(
        F.sqrt(dmu * dmu + dsig * dsig) * F.lit(1e6)
    ).cast("bigint")
    return (
        a.join(b, ["x", "y"])
        .select(quad.alias("change_class"), mag_q.alias("mq"))
        .groupBy("change_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            (
                F.sum("mq").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_magnitude"),
        )
        .orderBy("change_class")
    )


def cube_orientation_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A63 — gradient-orientation histogram (HOG-style): bin each
    complete-stencil cell's central-difference gradient direction
    into 8 octants, weight by magnitude, and report the per-octant
    census. A23 gives the raw derivative field; the orientation
    histogram is the rotation summary (dominant ridge/striping
    direction) every texture or wake-detection screen starts from.

    Exactness: gradients derive from micro-quantized means; the
    octant is an exact integer atan2-free comparison tree on (gx,
    gy); the magnitude weight quantizes before folding.

    Plan: one cell aggregate, one explode-scatter stencil groupBy
    (no self-joins), one <= 8-row census.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    roles = [(-1, 0, "e"), (1, 0, "w"), (0, -1, "n"), (0, 1, "s")]
    scatter = cells.select(
        "q",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).alias("dx"),
                        F.lit(dy).alias("dy"),
                        F.lit(r).alias("role"),
                    )
                    for dx, dy, r in roles
                ]
            )
        ).alias("o"),
        "x",
        "y",
    ).select(
        (F.col("x") + F.col("o.dx")).alias("tx"),
        (F.col("y") + F.col("o.dy")).alias("ty"),
        F.col("o.role").alias("role"),
        "q",
    )
    hood = scatter.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_roles"),
        F.max(F.when(F.col("role") == "e", F.col("q"))).alias("qe"),
        F.max(F.when(F.col("role") == "w", F.col("q"))).alias("qw"),
        F.max(F.when(F.col("role") == "n", F.col("q"))).alias("qn"),
        F.max(F.when(F.col("role") == "s", F.col("q"))).alias("qs"),
    )
    interior = hood.join(
        cells.select(F.col("x").alias("tx"), F.col("y").alias("ty")),
        ["tx", "ty"],
    ).where(F.col("n_roles") == 4)
    gx = (F.col("qe") - F.col("qw")).cast("double") / F.lit(2e6)
    gy = (F.col("qn") - F.col("qs")).cast("double") / F.lit(2e6)
    ax = F.abs(gx)
    ay = F.abs(gy)
    octant = (
        F.when((gx >= 0) & (gy >= 0) & (ax >= ay), F.lit(0))
        .when((gx >= 0) & (gy >= 0), F.lit(1))
        .when((gx < 0) & (gy >= 0) & (ay >= ax), F.lit(2))
        .when((gx < 0) & (gy >= 0), F.lit(3))
        .when((gx < 0) & (gy < 0) & (ax >= ay), F.lit(4))
        .when((gx < 0) & (gy < 0), F.lit(5))
        .when((gx >= 0) & (gy < 0) & (ay >= ax), F.lit(6))
        .otherwise(F.lit(7))
    )
    mq = F.floor(F.sqrt(gx * gx + gy * gy) * F.lit(1e6)).cast("bigint")
    wall = Window.partitionBy()
    return (
        interior.select(octant.alias("octant"), mq.alias("mq"))
        .groupBy("octant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("mq").alias("wq"),
        )
        .select(
            "octant",
            "n_cells",
            (F.col("wq").cast("double") / F.lit(1e6)).alias(
                "magnitude_sum"
            ),
            (
                F.col("wq").cast("double")
                / F.sum("wq").over(wall).cast("double")
            ).alias("magnitude_share"),
        )
        .orderBy("octant")
    )


def cube_stretch_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A64 — percentile contrast-stretch parameters: the exact 2nd
    and 98th percentile cell means (rank cut, ties by cell key), the
    stretch gain, and how much of the grid clips at each end — the
    display-scaling companion to A25's full equalization (every
    quicklook renderer runs exactly this).

    Exactness: cuts are exact integer rank picks on micro-quantized
    means; clip shares divide exact counts.

    Plan: one cell aggregate, one rank window over the grid-bounded
    frame, a 1-row summary.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    wr = Window.partitionBy().orderBy("q", "x", "y")
    wall = Window.partitionBy()
    ranked = cells.select(
        "q",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    lo_rk = F.expr("greatest(1, (2 * n) div 100)")
    hi_rk = F.expr("greatest(1, (98 * n) div 100)")
    cuts = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.max(F.when(F.col("rk") == lo_rk, F.col("q"))).cast("double")
            / F.lit(1e6)
        ).alias("p2"),
        (
            F.max(F.when(F.col("rk") == hi_rk, F.col("q"))).cast("double")
            / F.lit(1e6)
        ).alias("p98"),
        F.sum(
            F.when(F.col("rk") < lo_rk, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_clip_low"),
        F.sum(
            F.when(F.col("rk") > hi_rk, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_clip_high"),
    )
    return cuts.select(
        "n_cells",
        "p2",
        "p98",
        (F.lit(1.0) / (F.col("p98") - F.col("p2"))).alias("stretch_gain"),
        "n_clip_low",
        "n_clip_high",
    )


def cube_parity_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A65 — checkerboard-artifact detector: per grid quadrant, the
    mean cell value on even vs odd (x+y) parity cells and their gap.
    Interleaved-sampling and stripe artifacts show up as a systematic
    parity gap long before they are visible in a quicklook — the
    cell-level companion to A57's destripe (which fixes rows/columns,
    not parity classes).

    Exactness: cell means micro-quantize to BIGINT (the A64 scheme);
    per-class means divide exact integer sums; the gap subtracts two
    such doubles.

    Plan: one (x, y) cell aggregate, then one 4-row quadrant
    aggregate — shuffle bounded by the 50x50 grid at any SF.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    tagged = cells.select(
        (
            (F.col("x") / 25).cast("bigint") * 2
            + (F.col("y") / 25).cast("bigint")
        ).cast("int").alias("quadrant"),
        ((F.col("x") + F.col("y")) % 2 == 0).alias("even"),
        "q",
    )
    agg = tagged.groupBy("quadrant").agg(
        F.sum(F.when(F.col("even"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_even"),
        F.sum(F.when(~F.col("even"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_odd"),
        (
            F.sum(F.when(F.col("even"), F.col("q"))).cast("double")
            / F.sum(F.when(F.col("even"), F.lit(1))).cast("double")
            / F.lit(1e6)
        ).alias("mean_even"),
        (
            F.sum(F.when(~F.col("even"), F.col("q"))).cast("double")
            / F.sum(F.when(~F.col("even"), F.lit(1))).cast("double")
            / F.lit(1e6)
        ).alias("mean_odd"),
    )
    return agg.select(
        "quadrant", "n_even", "n_odd", "mean_even", "mean_odd",
        (F.col("mean_even") - F.col("mean_odd")).alias("parity_gap"),
    ).orderBy("quadrant")


def cube_hist_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A66 — grid-value histogram modes: the 32-bin histogram of cell
    means with local-maximum (mode) flags. Multi-modality is the
    first read of a classification-readiness check (water/land split,
    bimodal speckle) and picks thresholds A31's Otsu then refines.

    Exactness: bins are pure integer arithmetic on micro-quantized
    cell means ((q-min)*32 div (range+1), BIGINTs); mode flags
    compare exact counts via lag/lead over the 32-row frame.

    Plan: one cell aggregate (grid-bounded), one 1-row min/max
    broadcast, one 32-row histogram + window. Nothing above the grid
    size ever shuffles.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    rng = cells.agg(
        F.min("q").alias("qmin"), F.max("q").alias("qmax")
    )
    binned = cells.crossJoin(F.broadcast(rng)).select(
        F.expr(
            "cast(least(31, ((q - qmin) * 32) div (qmax - qmin + 1)) as int)"
        ).alias("bin"),
        "qmin", "qmax",
    )
    hist = binned.groupBy("bin", "qmin", "qmax").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells")
    )
    wb = Window.partitionBy().orderBy("bin")
    flagged = hist.select(
        "bin",
        "n_cells",
        (
            F.col("qmin").cast("double") / F.lit(1e6)
            + F.col("bin").cast("double")
            * (F.col("qmax") - F.col("qmin") + 1).cast("double")
            / F.lit(32.0) / F.lit(1e6)
        ).alias("bin_lo"),
        (
            (F.col("n_cells") > F.coalesce(F.lag("n_cells").over(wb), F.lit(0)))
            & (F.col("n_cells") > F.coalesce(F.lead("n_cells").over(wb), F.lit(0)))
        ).alias("is_mode"),
    )
    return flagged.orderBy("bin")


def cube_row_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A67 — per-row bright-streak profile: for every grid row, the
    count of above-median cells and the LONGEST CONSECUTIVE run of
    them. Long contiguous runs along the range axis are the azimuth-
    ambiguity / RFI streak signature a QC pass flags before the row
    enters a composite (A57 destripe removes smooth gain bands, not
    streaks).

    Exactness: the global median is an exact rank pick on the
    micro-quantized cell means (the A64 scheme); run detection is
    gaps-and-islands integer arithmetic (x - row_number), no floats.

    Plan: one cell aggregate, one rank window for the median
    (grid-bounded), one per-row islands window, one 50-row rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    wr = Window.partitionBy().orderBy("q", "x", "y")
    wall = Window.partitionBy()
    med = (
        cells.select(
            "q",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        .where(F.col("rk") == F.expr("(n + 1) div 2"))
        .select(F.col("q").alias("median_q"))
    )
    above = (
        cells.crossJoin(F.broadcast(med))
        .where(F.col("q") > F.col("median_q"))
        .select("x", "y")
    )
    wy = Window.partitionBy("y").orderBy("x")
    islands = above.select(
        "y", (F.col("x") - F.row_number().over(wy)).alias("grp")
    )
    runs = islands.groupBy("y", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_row = runs.groupBy("y").agg(
        F.sum("run_len").cast("bigint").alias("n_above"),
        F.max("run_len").cast("bigint").alias("longest_run"),
    )
    return per_row.orderBy("y")


def cube_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A68 — directional texture anisotropy per quadrant: total
    horizontal vs vertical central-difference gradient energy and
    their ratio. Range-direction energy dominating azimuth (or vice
    versa) is the layover/foreshortening texture signature; isotropy
    ~1 means the quadrant is texture-neutral. Complements A63's
    orientation histogram with a single physical number per region.

    Exactness: per-cell |gradient| halves quantize to BIGINT
    micro-units; quadrant sums are exact integer folds; one final
    IEEE division.

    Plan: the shared 4-role stencil (cell collapse → directed
    contributions → one role pivot → center join), then a 4-row
    aggregate. Shuffle = 4 x grid cells at any SF.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(davg("value").alias("v"))
    roles = F.array(
        F.struct(F.lit(1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("west").alias("role")),
        F.struct(F.lit(-1).alias("dx"), F.lit(0).alias("dy"),
                 F.lit("east").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(1).alias("dy"),
                 F.lit("south").alias("role")),
        F.struct(F.lit(0).alias("dx"), F.lit(-1).alias("dy"),
                 F.lit("north").alias("role")),
    )
    contrib = cells.select(
        "x", "y", "v", F.explode(roles).alias("r")
    ).select(
        (F.col("x") + F.col("r.dx")).alias("tx"),
        (F.col("y") + F.col("r.dy")).alias("ty"),
        F.col("r.role").alias("role"),
        "v",
    )
    nb = contrib.groupBy("tx", "ty").agg(
        F.max(F.when(F.col("role") == "west", F.col("v"))).alias("w"),
        F.max(F.when(F.col("role") == "east", F.col("v"))).alias("e"),
        F.max(F.when(F.col("role") == "south", F.col("v"))).alias("s"),
        F.max(F.when(F.col("role") == "north", F.col("v"))).alias("n"),
    ).where(
        F.col("w").isNotNull() & F.col("e").isNotNull()
        & F.col("s").isNotNull() & F.col("n").isNotNull()
    )
    qgx = F.floor(F.abs((F.col("e") - F.col("w")) / F.lit(2.0)) * F.lit(1e6)).cast("bigint")
    qgy = F.floor(F.abs((F.col("n") - F.col("s")) / F.lit(2.0)) * F.lit(1e6)).cast("bigint")
    tagged = nb.select(
        (
            (F.col("tx") / 25).cast("bigint") * 2
            + (F.col("ty") / 25).cast("bigint")
        ).cast("int").alias("quadrant"),
        qgx.alias("qgx"),
        qgy.alias("qgy"),
    )
    return (
        tagged.groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_interior"),
            (F.sum("qgx").cast("double") / F.lit(1e6)).alias("h_energy"),
            (F.sum("qgy").cast("double") / F.lit(1e6)).alias("v_energy"),
            (
                F.sum("qgx").cast("double")
                / F.greatest(F.sum("qgy"), F.lit(1)).cast("double")
            ).alias("anisotropy"),
        )
        .orderBy("quadrant")
    )


def cube_symmetry_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A69 — vertical-mirror symmetry profile: for every row pair
    (y, 49-y), the mean absolute difference of micro-quantized cell
    means over aligned columns, plus the pair's aligned-cell count.
    A strongly symmetric grid is a processing-artifact signature
    (mirrored ghosting); the profile localizes WHICH rows mirror.

    Exactness: |q_a - q_b| on exact BIGINTs; means divide exact sums.

    Plan: the cell table self-joins on (x, mirrored y) — grid-bounded
    both sides — then one 25-row rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    top = cells.where(F.col("y") < 25).select(
        "x", "y", F.col("q").alias("qa")
    )
    bot = cells.where(F.col("y") >= 25).select(
        "x", (F.lit(49) - F.col("y")).alias("y"), F.col("q").alias("qb")
    )
    pairs = top.join(bot, ["x", "y"])
    return (
        pairs.groupBy("y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_aligned"),
            (
                F.sum(F.abs(F.col("qa") - F.col("qb"))).cast("double")
                / F.count(F.lit(1)).cast("double") / F.lit(1e6)
            ).alias("mean_abs_diff"),
        )
        .orderBy("y")
    )


def cube_quadrant_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A70 — local value distribution map: exact p25/p50/p75 of cell
    means per quadrant (rank picks) plus the interquartile range.
    The per-region distribution read behind A64's global stretch —
    a quadrant whose IQR collapses is flat/water; one whose median
    drifts from its neighbors has a radiometric step.

    Exactness: quartiles are exact integer rank picks on the
    micro-quantized cell means with (q, x, y) tie order.

    Plan: one cell aggregate, one rank window per quadrant
    (grid-bounded), one 4-row rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    tagged = cells.select(
        (
            (F.col("x") / 25).cast("bigint") * 2
            + (F.col("y") / 25).cast("bigint")
        ).cast("int").alias("quadrant"),
        "q", "x", "y",
    )
    w = Window.partitionBy("quadrant").orderBy("q", "x", "y")
    wc = Window.partitionBy("quadrant")
    ranked = tagged.select(
        "quadrant", "q",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    def pick(pct):
        return F.max(
            F.when(F.col("rk") == F.expr(f"greatest(1, ({pct} * n) div 100)"),
                   F.col("q"))
        ).cast("double") / F.lit(1e6)
    per = ranked.groupBy("quadrant").agg(
        F.max("n").cast("bigint").alias("n_cells"),
        pick(25).alias("p25"),
        pick(50).alias("p50"),
        pick(75).alias("p75"),
    )
    return per.select(
        "quadrant", "n_cells", "p25", "p50", "p75",
        (F.col("p75") - F.col("p25")).alias("iqr"),
    ).orderBy("quadrant")


def cube_column_defects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A71 — column-defect detector: per grid column, the mean cell
    value and a flag for columns whose mean deviates from the global
    column-mean average by more than 2 column-std — the bad-detector-
    column screen (A57's destripe smooths gain bands; this LOCATES
    dead/hot columns first). Output: one row per column with its
    z-scored deviation flag.

    Exactness: column means are exact integer folds of micro-
    quantized cell means; the global moment uses the integer
    normal-equation scheme (n·Σq² − (Σq)² over column means) with
    one sqrt at the end; the flag compares quantized integers scaled
    through one IEEE expression.

    Plan: cell aggregate → 50-row column aggregate → 1-row global
    moment broadcast → map-side flag.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    cols = cells.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.floor(
            F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")
        ).cast("bigint").alias("qcol"),
    )
    # moments run on MILLI-unit column means (qcol div 1000): micro
    # units would overflow int64 in nc*s2 for large-magnitude values
    colsm = cols.withColumn("qm", F.expr("qcol div 1000"))
    mom = colsm.agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum("qm").alias("s1"),
        F.sum(F.col("qm") * F.col("qm")).alias("s2"),
    )
    flagged = colsm.crossJoin(F.broadcast(mom)).select(
        "x",
        "n_cells",
        (F.col("qcol").cast("double") / F.lit(1e6)).alias("col_mean"),
        (
            (
                F.col("qm").cast("double")
                - F.col("s1").cast("double") / F.col("nc").cast("double")
            )
            * F.col("nc").cast("double")
            / F.sqrt(
                F.greatest(
                    F.lit(1.0),
                    (
                        F.col("nc") * F.col("s2") - F.col("s1") * F.col("s1")
                    ).cast("double"),
                )
            )
        ).alias("z_score"),
    )
    return flagged.select(
        "x", "n_cells", "col_mean", "z_score",
        (F.abs(F.col("z_score")) > F.lit(2.0)).alias("is_defect"),
    ).orderBy("x")


def cube_border_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A72 — edge-vignetting detector: mean cell value by distance-
    to-border ring (0-2, 3-5, 6+ cells from the nearest grid edge)
    and each ring's deviation from the interior mean. Antenna-pattern
    falloff and resampling halos live at the swath edge; a flat
    profile clears the product for mosaicking (A17).

    Exactness: ring ids are exact integer min-distances; ring means
    divide exact integer folds; deviations subtract two such doubles.

    Plan: one cell aggregate, one 3-ring rollup, interior mean via a
    window over the 3-row frame.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    dist = F.least(
        F.col("x"), F.col("y"), F.lit(49) - F.col("x"), F.lit(49) - F.col("y")
    )
    ring = (
        F.when(dist <= 2, F.lit(0))
        .when(dist <= 5, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
    )
    per = cells.select(ring.alias("ring"), "q").groupBy("ring").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.sum("q").cast("double") / F.count(F.lit(1)).cast("double")
            / F.lit(1e6)
        ).alias("ring_mean"),
    )
    wall = Window.partitionBy()
    interior = F.max(
        F.when(F.col("ring") == 2, F.col("ring_mean"))
    ).over(wall)
    return per.select(
        "ring", "n_cells", "ring_mean",
        (F.col("ring_mean") - interior).alias("dev_from_interior"),
    ).orderBy("ring")


def cube_diagonal_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A73 — anti-diagonal banding profile: cell means grouped by the
    (x+y) mod 8 diagonal phase, each phase's deviation from the grid
    mean, and the worst absolute deviation attached to every row.
    Periodic diagonal banding is the classic SAR azimuth-ramp /
    interference artifact that row (A67) and column (A71) profiles
    both miss; a flat phase profile clears the product.

    Exactness: phase ids are integer arithmetic; phase means divide
    exact integer folds; the grid mean divides two whole-grid integer
    sums; all window frames span only the 8 phase rows.

    Plan: one cell aggregate, one 8-phase rollup, grid mean + worst
    deviation via unpartitioned windows over 8 rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(davg("value") * F.lit(1e6)).cast("bigint").alias("q"))
    per = cells.groupBy(
        ((F.col("x") + F.col("y")) % 8).cast("int").alias("phase")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("q").alias("sq"),
    )
    wall = Window.partitionBy()
    phase_mean = (
        F.col("sq").cast("double") / F.col("n_cells").cast("double")
        / F.lit(1e6)
    )
    grid_mean = (
        F.sum("sq").over(wall).cast("double")
        / F.sum("n_cells").over(wall).cast("double") / F.lit(1e6)
    )
    dev = per.select(
        "phase", "n_cells",
        phase_mean.alias("phase_mean"),
        (phase_mean - grid_mean).alias("dev_from_grid"),
    )
    return dev.select(
        "phase", "n_cells", "phase_mean", "dev_from_grid",
        F.max(F.abs(F.col("dev_from_grid"))).over(wall).alias("max_abs_dev"),
    ).orderBy("phase")


def cube_center_of_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A74 — per-band intensity centroid and dispersion: the
    value-weighted center of mass (cx, cy) of each event_type's 50x50
    layer plus its second-moment dispersion. Layer-to-layer centroid
    drift is the cheap registration check a stack runs before A23's
    full coregistration search; dispersion separates point-source
    layers from diffuse ones.

    Exactness: all five moments (m0, mx, my, mxx, myy) are BIGINT
    sums of integer products (cell weights floor to micro-units
    first); the centroid and dispersion divide/multiply those exact
    integers in a fixed double expression.

    Plan: one (band, cell) aggregate, one band rollup — two shuffles,
    both on bounded keys.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("band"),
        (F.col("event_id") % 50).alias("x"),
        ((F.col("event_id") / 50).cast("bigint") % 50).alias("y"),
    ).agg(F.floor(dsum("value") * F.lit(1e6)).cast("bigint").alias("q"))
    m = cells.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("q").alias("m0"),
        F.sum(F.col("q") * F.col("x")).alias("mx"),
        F.sum(F.col("q") * F.col("y")).alias("my"),
        F.sum(F.col("q") * F.col("x") * F.col("x")).alias("mxx"),
        F.sum(F.col("q") * F.col("y") * F.col("y")).alias("myy"),
    )
    cx = F.col("mx").cast("double") / F.col("m0").cast("double")
    cy = F.col("my").cast("double") / F.col("m0").cast("double")
    return m.select(
        "band",
        "n_cells",
        (F.col("m0").cast("double") / F.lit(1e6)).alias("total_value"),
        cx.alias("cx"),
        cy.alias("cy"),
        (
            (F.col("mxx") + F.col("myy")).cast("double")
            / F.col("m0").cast("double")
            - cx * cx - cy * cy
        ).alias("dispersion"),
    ).orderBy("band")
