"""Chunked/filtered HDF5 decode (sources/hdf5.py) against files built
by the minimal writer (sources/hdf5_write.py) — the layout real gzip'd
ICEYE SLC products use (reference analytics_IO.load_ICEYE_h5 handles
them through h5py; this path is dependency-free). The writer is the
only way to produce a chunked HDF5 fixture in containers without h5py,
and doubles as cross-validation: h5py (when importable) must read the
writer's files bit-for-bit."""

import numpy as np
import pytest

from icecube_spark.sources.hdf5 import load_h5, read_h5
from icecube_spark.sources.hdf5_write import write_h5

rng = np.random.default_rng(7)
SI = rng.normal(size=(20, 20)).astype("float32")
SQ = rng.normal(size=(20, 20)).astype("float64")
IV = rng.integers(-5000, 5000, size=(13, 9)).astype("int64")


def test_contiguous_round_trip():
    data = write_h5({"s_i": SI, "meta": "hello world", "iv": IV})
    h5 = read_h5(data)
    assert (h5["s_i"] == SI).all()
    assert h5["meta"] == "hello world"
    assert (h5["iv"] == IV).all()


@pytest.mark.parametrize(
    "chunks,compress,shuffle",
    [
        ({"s_i": (8, 8), "s_q": (7, 5)}, True, True),   # partial edges
        ({"s_i": (8, 8), "s_q": (20, 20)}, True, False),
        ({"s_i": (5, 20), "s_q": (4, 4)}, False, False),
    ],
)
def test_chunked_round_trip(chunks, compress, shuffle):
    data = write_h5(
        {"s_i": SI, "s_q": SQ, "product_file": "fake.h5"},
        chunks=chunks, compress=compress, shuffle=shuffle,
    )
    h5 = read_h5(data)
    assert (h5["s_i"] == SI).all()
    assert (h5["s_q"] == SQ).all()
    assert h5["product_file"] == "fake.h5"


def test_chunked_int_gzip():
    data = write_h5({"iv": IV}, chunks={"iv": (4, 4)}, compress=True)
    assert (read_h5(data)["iv"] == IV).all()


def test_want_filter_on_chunked():
    data = write_h5(
        {"s_i": SI, "s_q": SQ}, chunks={"s_i": (8, 8)}, compress=True
    )
    h5 = read_h5(data, want={"s_q"})
    assert "s_i" not in h5 and (h5["s_q"] == SQ).all()


def test_h5py_reads_writer_output_when_available():
    h5py = pytest.importorskip("h5py")
    import io

    data = write_h5(
        {"s_i": SI, "s_q": SQ},
        chunks={"s_i": (8, 8), "s_q": (7, 5)}, compress=True, shuffle=True,
    )
    with h5py.File(io.BytesIO(data), "r") as hf:
        assert (hf["s_i"][()] == SI).all()
        assert (hf["s_q"][()] == SQ).all()


def _fake_slc(tmp_path, name, end_utc, incidence):
    """A gzip'd chunked SLC product shaped like a real ICEYE file
    (reference slc fixtures are contiguous; real products are
    chunked+deflate)."""
    data = write_h5(
        {
            "s_i": SI, "s_q": SQ.astype("float32"),
            "product_file": name,
            "acquisition_end_utc": end_utc,
            "orbit_direction": "ASCENDING",
            "incidence_center": np.array([incidence]),
            "number_of_range_samples": np.array([20]),
            "number_of_azimuth_samples": np.array([20]),
        },
        chunks={"s_i": (8, 8), "s_q": (8, 8)}, compress=True, shuffle=True,
    )
    (tmp_path / name).write_bytes(data)
    return data


def test_distributed_decode_of_chunked_slc(spark, tmp_path):
    """crawl_slc_metadata + decode_slc over chunked gzip'd products:
    the production SLC ingest path, no h5py in the loop."""
    from icecube_spark.sources.hdf5 import crawl_slc_metadata, decode_slc

    _fake_slc(tmp_path, "a.h5", "2021-04-27T21:51:30.025535", 29.5)
    _fake_slc(tmp_path, "b.h5", "2021-04-28T21:51:30.025535", 30.5)
    bdf = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.h5"
    ).load(str(tmp_path))

    meta = crawl_slc_metadata(bdf).orderBy("acquisition_date").collect()
    assert [r.product_file for r in meta] == ["a.h5", "b.h5"]
    assert [str(r.acquisition_date) for r in meta] == [
        "2021-04-27", "2021-04-28",
    ]
    assert all(r.width == 20 and r.height == 20 for r in meta)

    pix = decode_slc(bdf).orderBy("path").collect()
    assert len(pix) == 2
    for r in pix:
        assert r.s_i == list(np.asarray(SI, dtype="f8").ravel())
