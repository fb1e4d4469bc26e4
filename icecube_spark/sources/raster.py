"""Raster ingestion (SURVEY §2 A12) — the reference's
analytics_IO.load_tiff / load_ICEYE_h5 boundary, Spark-first.

rasterio/h5py are not in this container, so full pixel decode is
gated behind import-try. What IS real: a dependency-free classic-TIFF
header parser (enough to crawl width/height/dtype metadata from the
binaryFile source without any codec), which is exactly what the
reference's metadata crawler needs from each raster
(icecube/utils/metadata_crawler.py:40-60 falls back to reading the
raster shape when metadata keys are missing).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def parse_tiff_header(data: bytes) -> dict | None:
    """Parse width/height/bits from a classic TIFF (II/MM, magic 42).
    Returns None if `data` is not a TIFF. Pure-python, reads only the
    first IFD — no codec needed for metadata crawling."""
    if len(data) < 8:
        return None
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        return None
    magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    if magic != 42:
        return None
    if ifd_off + 2 > len(data):
        return None
    (n_tags,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    out: dict = {"endian": "little" if endian == "<" else "big"}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        if off + 12 > len(data):
            break
        tag, typ, count = struct.unpack(endian + "HHI", data[off : off + 8])
        if tag not in (TAG_WIDTH, TAG_HEIGHT, TAG_BITS):
            continue
        size = _TYPE_SIZES.get(typ, 4) * count
        if size <= 4:
            raw = data[off + 8 : off + 12]
        else:
            (voff,) = struct.unpack(endian + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        fmt = {3: "H", 4: "I"}.get(typ)
        if fmt is None or len(raw) < struct.calcsize(endian + fmt):
            continue
        (value,) = struct.unpack(endian + fmt, raw[: struct.calcsize(endian + fmt)])
        key = {TAG_WIDTH: "width", TAG_HEIGHT: "height", TAG_BITS: "bits"}[tag]
        out[key] = int(value)
    return out


RASTER_META_SCHEMA = (
    "path string, length long, is_tiff boolean, width long, height long, "
    "bits long"
)


def crawl_raster_metadata(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → raster metadata table (the Spark twin of
    metadata_crawler over a directory of rasters). Arrow-batched; no
    shuffle; payloads never reach the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_tiff_header(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "length": pdf["length"],
                    "is_tiff": [m is not None for m in metas],
                    "width": [(m or {}).get("width") for m in metas],
                    "height": [(m or {}).get("height") for m in metas],
                    "bits": [(m or {}).get("bits") for m in metas],
                }
            )

    return binary_df.select("path", "length", "content").mapInPandas(
        run, schema=RASTER_META_SCHEMA
    )


def load_raster_pixels(path: str):
    """Full pixel decode — requires rasterio/h5py (not in container)."""
    try:
        import rasterio  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "pixel decode needs rasterio/h5py; this container ships neither — "
            "metadata crawling (crawl_raster_metadata) works without them"
        ) from e
