"""SLC .h5 ingestion against the reference's own fixtures
(tests/resources/slc_stack/*.h5) — the SLCDatacube.build parity
surface (reference tests/slc_datacube_test.py). The minimal HDF5
reader decodes these dependency-free; h5py/rasterio tests activate
only when the libs are importable (optional-dependency path)."""

import glob
import os

import numpy as np
import pytest

from icecube_spark.sources.hdf5 import (
    extract_complex_channels,
    load_h5,
    read_h5,
)

SLC = "/root/reference/tests/resources/slc_stack"
CFG = "/root/reference/tests/resources/json_config"

# reference slc_datacube_test.py:24-41
ORDER_BY_ACQ = [
    "ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_1.h5",
    "ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_0.h5",
    "ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_2.h5",
]
WANT_META = {
    "acquisition_end_utc": [
        "2021-04-27T21:51:30.025535",
        "2021-04-28T21:51:30.025535",
        "2021-05-27T21:51:30.025535",
    ],
    "orbit_direction": ["DESCENDING", "ASCENDING", "ASCENDING"],
    "incidence_center": [29.5, 30.5, 28.5],
}

pytestmark = pytest.mark.skipif(
    not glob.glob(os.path.join(SLC, "*.h5")), reason="reference fixtures absent"
)


def test_minimal_reader_decodes_reference_fixtures():
    """Every SLC fixture decodes dependency-free: s_i/s_q 20x20
    float32 + vlen-string metadata (reference slc_datacube_test.py
    EXPECTED_METADATA_VALUES)."""
    by_file = {}
    for p in sorted(glob.glob(os.path.join(SLC, "*.h5"))):
        h5 = read_h5(open(p, "rb").read())
        si, sq = extract_complex_channels(h5)
        assert si.shape == (20, 20) and sq.shape == (20, 20)
        assert np.isfinite(si).all() and np.isfinite(sq).all()
        by_file[h5["product_file"]] = h5
    assert sorted(by_file) == sorted(ORDER_BY_ACQ)
    for i, f in enumerate(ORDER_BY_ACQ):
        h5 = by_file[f]
        assert h5["acquisition_end_utc"] == WANT_META["acquisition_end_utc"][i]
        assert h5["orbit_direction"] == WANT_META["orbit_direction"][i]
        assert float(h5["incidence_center"]) == WANT_META["incidence_center"][i]


def test_want_filter_skips_pixels():
    p = sorted(glob.glob(os.path.join(SLC, "*.h5")))[0]
    h5 = read_h5(open(p, "rb").read(), want={"product_file"})
    assert "product_file" in h5 and "s_i" not in h5


def test_crawl_and_decode_distributed(spark):
    """Arrow-batched crawl + channel decode over the binaryFile
    source: one row per fixture, shapes and dates as the reference
    test expects."""
    from icecube_spark.sources.hdf5 import crawl_slc_metadata, decode_slc

    bdf = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.h5"
    ).load(SLC)
    meta = crawl_slc_metadata(bdf).orderBy("acquisition_date").collect()
    assert [r.product_file for r in meta] == ORDER_BY_ACQ
    assert [str(r.acquisition_date) for r in meta] == [
        "2021-04-27", "2021-04-28", "2021-05-27",
    ]
    assert [r.incidence_center for r in meta] == WANT_META["incidence_center"]
    assert all(r.width == 20 and r.height == 20 for r in meta)

    pix = decode_slc(bdf).collect()
    assert len(pix) == 3
    for r in pix:
        assert r.width == 20 and r.height == 20
        assert len(r.s_i) == 400 and len(r.s_q) == 400
        want = read_h5(open(r.path.replace("file:", ""), "rb").read())
        assert r.s_i == list(np.asarray(want["s_i"], dtype="f8").ravel())
        assert r.s_q == list(np.asarray(want["s_q"], dtype="f8").ravel())


def test_create_cube_from_slc(spark):
    """End-to-end SLC cube: 3 bands, Real/Complex columns, reference
    acquisition ordering (slc_datacube_test.py test_slc_datacube)."""
    from icecube_spark.cube import create_cube_from_slc

    dc = create_cube_from_slc(
        spark, SLC, os.path.join(CFG, "config_use_case_default.json")
    )
    assert dc.get_data_variables() == ["Real", "Complex"]
    rows = dc.df.orderBy("acquisition_date").collect()
    assert [r.product_file for r in rows] == ORDER_BY_ACQ
    for r in rows:
        assert len(r.Real) == 400 and len(r.Complex) == 400
    dims = dc.get_dimensions()
    assert dims["product_file"] == 3 and dims["acquisition_date"] == 3


def test_h5py_parity_when_available():
    """Optional-dependency path: h5py (when importable) must agree
    with the minimal reader on the fixtures. Skips cleanly without."""
    pytest.importorskip("h5py")
    for p in sorted(glob.glob(os.path.join(SLC, "*.h5"))):
        data = open(p, "rb").read()
        a = read_h5(data, want={"s_i", "s_q", "product_file"})
        b = load_h5(data, want={"s_i", "s_q", "product_file"})
        assert (np.asarray(a["s_i"]) == np.asarray(b["s_i"])).all()
        assert (np.asarray(a["s_q"]) == np.asarray(b["s_q"])).all()
        assert a["product_file"] == b["product_file"]


def test_rasterio_compressed_decode_when_available(tmp_path):
    """Optional-dependency path: compressed TIFF decode activates
    with rasterio (reference analytics_IO.load_tiff). Skips cleanly
    without the lib."""
    rasterio = pytest.importorskip("rasterio")
    from icecube_spark.sources.raster import decode_tiff_pixels

    p = str(tmp_path / "c.tif")
    want = np.arange(100, dtype="float32").reshape(10, 10)
    with rasterio.open(
        p, "w", driver="GTiff", height=10, width=10, count=1,
        dtype="float32", compress="deflate",
    ) as dst:
        dst.write(want, 1)
    got = decode_tiff_pixels(open(p, "rb").read())
    assert (got == want).all()
