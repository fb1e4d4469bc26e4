"""KML footprint and DEM ingestion (sources/vectors.py) — reference
load_kml / load_DEM parity (analytics_IO.py:242/:268)."""

import struct

import numpy as np
import pytest

from icecube_spark.sources.vectors import (
    dem_to_grid,
    load_dem,
    load_kml,
)

KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <Document><Placemark><name>footprint</name>
    <Polygon><outerBoundaryIs><LinearRing><coordinates>
      24.90,60.15,0 24.98,60.16,0 24.97,60.22,0 24.89,60.21,0 24.90,60.15,0
    </coordinates></LinearRing></outerBoundaryIs></Polygon>
  </Placemark></Document>
</kml>"""


def test_load_kml_parity():
    """(lat, lon, height) arrays exactly as the reference's
    xmltodict path returns them."""
    lat, lon, height = load_kml(KML)
    assert len(lat) == 5 and lat[0] == 60.15 and lon[0] == 24.90
    assert lat[2] == 60.22 and lon[2] == 24.97
    assert (height == 0).all()


def test_load_kml_no_namespace_and_bytes():
    bare = KML.replace(' xmlns="http://www.opengis.net/kml/2.2"', "")
    lat, lon, _ = load_kml(bare.encode())
    assert lat[1] == 60.16 and lon[1] == 24.98


def test_load_kml_no_polygon_raises():
    with pytest.raises(ValueError, match="no Polygon"):
        load_kml("<kml><Document/></kml>")


def _dem_tiff(arr: np.ndarray, scale=(30.0, 30.0, 0.0),
              origin=(500000.0, 6670000.0)) -> bytes:
    """Minimal uncompressed float32 geotiff with pixel-scale and
    tiepoint tags."""
    h, w = arr.shape
    raw = arr.astype("<f4").tobytes()
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 32),
        (259, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, h),
        (339, 3, 1, 3),  # SampleFormat = float
    ]
    n_ext = 2  # strip offsets handled inline; scale+tiepoint external
    n_tags = len(tags) + 3  # + strip offsets, byte counts, and 2 geo (added below)
    n_tags = len(tags) + 4
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_tags * 12 + 4
    scale_off = after_ifd
    tie_off = scale_off + 3 * 8
    data_off = tie_off + 6 * 8
    entries = tags + [
        (273, 4, 1, data_off), (279, 4, 1, len(raw)),
        (33550, 12, 3, scale_off), (33922, 12, 6, tie_off),
    ]
    entries.sort()
    out = b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<3d", scale[0], scale[1], scale[2])
    out += struct.pack("<6d", 0, 0, 0, origin[0], origin[1], 0)
    out += raw
    return out


def test_load_dem():
    el = np.arange(30, dtype="float32").reshape(5, 6) * 2.5
    dem = load_dem(_dem_tiff(el))
    assert (dem["elevation"] == el).all()
    assert dem["pixel_scale"] == (30.0, 30.0)
    assert dem["origin"] == (500000.0, 6670000.0)


def test_distributed_kml_and_dem(spark, tmp_path):
    from icecube_spark.operators.spatial import polygon_join_grid
    from icecube_spark.sources.vectors import crawl_kml_footprints

    (tmp_path / "a.kml").write_text(KML)
    shifted = KML.replace("24.9", "25.9").replace("24.8", "25.8")
    (tmp_path / "b.kml").write_text(shifted)
    el = np.arange(100, dtype="float32").reshape(10, 10)
    (tmp_path / "dem.tif").write_bytes(_dem_tiff(el))

    kdf = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.kml"
    ).load(str(tmp_path))
    foot = crawl_kml_footprints(kdf)
    rows = {r.path.rsplit("/", 1)[-1]: r for r in foot.collect()}
    assert set(rows) == {"a.kml", "b.kml"}
    assert rows["a.kml"].xmin == 24.89 and rows["a.kml"].ymax == 60.22

    # footprints feed the A14 polygon join directly (self-join: the
    # two shifted quads don't intersect -> no pairs)
    pairs = polygon_join_grid(foot.withColumnRenamed("path", "rid"), "rid")
    assert pairs.count() == 0

    ddf = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.tif"
    ).load(str(tmp_path))
    grid = dem_to_grid(ddf)
    assert grid.count() == 100
    got = {(r.x, r.y): r.v for r in grid.collect()}
    assert got[(3, 2)] == float(el[2, 3])


def test_dem_grid_feeds_terrain_stencil(spark, tmp_path):
    """hillshade-style central-difference stencil over a DEM grid
    matches numpy on interior cells."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    el = rng.normal(size=(8, 8)).astype("float32")
    (tmp_path / "dem.tif").write_bytes(_dem_tiff(el))
    ddf = spark.read.format("binaryFile").load(str(tmp_path))
    cells = dem_to_grid(ddf).select("x", "y", "v")

    e = cells.select(F.col("x").alias("ex"), F.col("y").alias("ey"),
                     F.col("v").alias("ve"))
    w = cells.select(F.col("x").alias("wx"), F.col("y").alias("wy"),
                     F.col("v").alias("vw"))
    gx = (
        cells.join(e, (cells.x == e.ex - 1) & (cells.y == e.ey))
        .join(w, (cells.x == w.wx + 1) & (cells.y == w.wy))
        .select("x", cells.y.alias("yy"),
                ((F.col("ve") - F.col("vw")) / 2.0).alias("gx"))
    )
    got = {(r.x, r.yy): r.gx for r in gx.collect()}
    el8 = el.astype("f8")
    for yy in range(8):
        for xx in range(1, 7):
            want = (el8[yy, xx + 1] - el8[yy, xx - 1]) / 2.0
            assert abs(got[(xx, yy)] - want) < 1e-12
