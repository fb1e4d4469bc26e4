"""Raster ingestion (SURVEY §2 A12) — the reference's
analytics_IO.load_tiff / load_ICEYE_h5 boundary, Spark-first.

rasterio/h5py are not in this container, so decode of COMPRESSED
rasters is gated behind import-try. What IS real and dependency-free:

- a classic-TIFF header parser (metadata crawl: width/height/dtype
  straight off the binaryFile bytes), which is what the reference's
  metadata crawler needs per raster
  (icecube/utils/metadata_crawler.py:40-60);
- a full pixel decoder for UNCOMPRESSED classic TIFFs (any strip
  layout, 8/16/32/64-bit unsigned/signed/float samples) — covers the
  reference's own GRD test fixtures
  (tests/resources/grd_stack/*_10x10pixels_*.tif, written
  uncompressed by GDAL) and the common SAR interchange case, i.e.
  the reference's analytics_IO.load_tiff (icecube/utils/
  analytics_IO.py:113) for the uncompressed path.

Both run inside Arrow-batched mapInPandas over the binaryFile
source: payloads stay on executors, no shuffle, no driver IO.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}
_TYPE_FMTS = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(data: bytes) -> tuple[str, dict[int, list]] | None:
    """Endianness + {tag: [values]} of the first IFD of a classic
    TIFF, or None if `data` is not a TIFF. Pure python, no codec."""
    if len(data) < 8:
        return None
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        return None
    magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    if magic != 42 or ifd_off + 2 > len(data):
        return None
    (n_tags,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        if off + 12 > len(data):
            break
        tag, typ, count = struct.unpack(endian + "HHI", data[off : off + 8])
        size = _TYPE_SIZES.get(typ, 4) * count
        if size <= 4:
            raw = data[off + 8 : off + 12]
        else:
            (voff,) = struct.unpack(endian + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        if typ in (2, 7):  # ASCII / UNDEFINED: keep raw bytes
            tags[tag] = [raw[:count]]
            continue
        fmt = _TYPE_FMTS.get(typ)
        if fmt is None:
            continue
        unit = struct.calcsize(endian + fmt)
        if len(raw) < unit * count:
            continue
        tags[tag] = list(struct.unpack(endian + fmt * count, raw[: unit * count]))
    return ("little" if endian == "<" else "big", tags)


def parse_tiff_header(data: bytes) -> dict | None:
    """Parse width/height/bits from a classic TIFF (II/MM, magic 42).
    Returns None if `data` is not a TIFF."""
    parsed = _read_ifd(data)
    if parsed is None:
        return None
    endian, tags = parsed
    out: dict = {"endian": endian}
    for tag, key in (
        (TAG_WIDTH, "width"),
        (TAG_HEIGHT, "height"),
        (TAG_BITS, "bits"),
    ):
        if tag in tags and tags[tag]:
            out[key] = int(tags[tag][0])
    return out


def decode_tiff_pixels(data: bytes):
    """Decode an UNCOMPRESSED classic TIFF into a numpy array of shape
    (height, width) (single sample) or (height, width, samples).
    Returns None for non-TIFF bytes; raises NotImplementedError for
    compressed files (that path needs rasterio). Mirrors the
    reference's analytics_IO.load_tiff contract (icecube/utils/
    analytics_IO.py:113) for uncompressed rasters."""
    import numpy as np

    parsed = _read_ifd(data)
    if parsed is None:
        return None
    endian, tags = parsed
    compression = int(tags.get(TAG_COMPRESSION, [1])[0])
    if compression != 1:
        # optional-dependency path: rasterio decodes any compression
        # in-memory when importable; the pure-Python reader stays the
        # dependency-free fallback for uncompressed files
        try:
            import rasterio
            from rasterio.io import MemoryFile
        except ImportError:
            raise NotImplementedError(
                f"TIFF compression {compression} needs rasterio; only "
                "uncompressed (1) decodes dependency-free"
            ) from None
        with MemoryFile(data) as mf:  # pragma: no cover
            with mf.open() as src:
                arr = src.read()
        if arr.shape[0] == 1:  # pragma: no cover
            return arr[0]
        return np.moveaxis(arr, 0, -1)  # pragma: no cover
    width = int(tags[TAG_WIDTH][0])
    height = int(tags[TAG_HEIGHT][0])
    bits = int(tags.get(TAG_BITS, [8])[0])
    spp = int(tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0])
    fmt = int(tags.get(TAG_SAMPLE_FORMAT, [1])[0])
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise NotImplementedError(f"TIFF sample format {fmt} unsupported")
    dtype = np.dtype(f"{'<' if endian == 'little' else '>'}{kind}{bits // 8}")
    offsets = tags[TAG_STRIP_OFFSETS]
    counts = tags.get(
        TAG_STRIP_BYTE_COUNTS, [width * height * spp * (bits // 8)]
    )
    buf = b"".join(
        data[int(o) : int(o) + int(c)] for o, c in zip(offsets, counts)
    )
    arr = np.frombuffer(buf, dtype=dtype, count=width * height * spp)
    return arr.reshape((height, width) if spp == 1 else (height, width, spp))


TAG_GDAL_METADATA = 42112

_GDAL_ITEM_RE = None


def parse_gdal_metadata(data: bytes) -> dict[str, str]:
    """GDAL per-item metadata from a TIFF's GDAL_METADATA XML tag —
    the tag dict rasterio's .tags() exposes, keys lowercased like the
    reference's _correct_grd_metadata_key (grd_datacube.py). Empty
    dict for non-TIFFs / TIFFs without the tag."""
    global _GDAL_ITEM_RE
    import re

    if _GDAL_ITEM_RE is None:
        _GDAL_ITEM_RE = re.compile(
            r'<Item name="([^"]+)"[^>]*>(.*?)</Item>', re.DOTALL
        )
    parsed = _read_ifd(data)
    if parsed is None:
        return {}
    _, tags = parsed
    if TAG_GDAL_METADATA not in tags:
        return {}
    xml = tags[TAG_GDAL_METADATA][0].decode("utf-8", errors="replace")
    return {k.lower(): v for k, v in _GDAL_ITEM_RE.findall(xml)}


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


ICEYE_META_SCHEMA = (
    "path string, product_file string, acquisition_date date, "
    "acquisition_end_utc string, incidence_center double, "
    "orbit_direction string, width int, height int"
)


def crawl_iceye_metadata(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → the reference metadata_crawler's variables of
    interest (metadata_crawler.py:140-210): acquisition_date parsed
    from acquisition_end_utc, center incidence angle, orbit direction,
    raster shape (header fallback when metadata lacks the sample
    counts). Arrow-batched map; payload bytes never shuffle."""
    from datetime import datetime

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.split(" ")[0]: [] for k in ICEYE_META_SCHEMA.split(", ")}
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                hdr = parse_tiff_header(data)
                if hdr is None:
                    continue
                md = parse_gdal_metadata(data)
                end_utc = md.get("acquisition_end_utc")
                acq_date = None
                if end_utc:
                    acq_date = datetime.strptime(
                        end_utc, "%Y-%m-%dT%H:%M:%S.%f"
                    ).date()
                inc = md.get("incidence_center")
                rows["path"].append(path)
                rows["product_file"].append(
                    md.get("product_file") or path.rsplit("/", 1)[-1]
                )
                rows["acquisition_date"].append(acq_date)
                rows["acquisition_end_utc"].append(end_utc)
                rows["incidence_center"].append(
                    float(inc) if inc is not None else None
                )
                rows["orbit_direction"].append(md.get("orbit_direction"))
                rows["width"].append(
                    int(md.get("number_of_range_samples", hdr.get("width")))
                )
                rows["height"].append(
                    int(md.get("number_of_azimuth_samples", hdr.get("height")))
                )
            if rows["path"]:
                yield pd.DataFrame(rows)

    return binary_df.select("path", "content").mapInPandas(
        run, schema=ICEYE_META_SCHEMA
    )


RASTER_PIXELS_SCHEMA = (
    "path string, width int, height int, dtype string, pixels array<double>"
)


def decode_rasters(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → decoded pixel rows: (path, width, height,
    dtype, pixels) with pixels flattened row-major to array<double> —
    the layer-ingestion step of the reference's create_cube
    (icecube/bin/generate_cube.py via analytics_IO.load_tiff), as a
    distributed map. Non-TIFF inputs are dropped; compressed TIFFs
    raise (decode needs rasterio there). At scale each ~raster is one
    row in an executor-local Arrow batch; downstream cube assembly
    shuffles only (path, band) keys, never pixel payloads twice."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"path": [], "width": [], "height": [], "dtype": [], "pixels": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                arr = decode_tiff_pixels(bytes(blob))
                if arr is None:
                    continue
                rows["path"].append(path)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["dtype"].append(str(arr.dtype))
                # plain list: Arrow rejects a numpy ndarray cell here
                rows["pixels"].append(arr.astype("float64").ravel().tolist())
            if not rows["path"]:
                # an empty float64 column can't arrow-cast to
                # list<double>; emit nothing for all-junk batches
                continue
            out = pd.DataFrame(rows)
            out["pixels"] = out["pixels"].astype(object)
            yield out

    return binary_df.select("path", "content").mapInPandas(
        run, schema=RASTER_PIXELS_SCHEMA
    )


def load_raster_pixels(path: str):
    """Single-file pixel decode. Uncompressed TIFFs decode
    dependency-free (decode_tiff_pixels); anything else needs
    rasterio/h5py, which this container does not ship."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return decode_tiff_pixels(data)
    except NotImplementedError:
        pass
    try:
        import rasterio  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "compressed-raster decode needs rasterio/h5py; this container "
            "ships neither — uncompressed TIFFs and metadata crawling work "
            "without them"
        ) from e
    with rasterio.open(path) as src:  # pragma: no cover
        return src.read()


def save_metadata_table_as_csv(metadata_df: DataFrame, folder: str) -> None:
    """Reference parity (metadata_crawler.py:237
    save_metadata_table_as_csv): write a crawl-result table as ONE
    ``metadata.csv`` inside ``folder``. The crawl table is model-sized
    (one row per product), so the single-named-file contract the
    reference promises is a driver-side write by design; corpus-scale
    tables should use ``df.write.csv`` instead."""
    import os

    metadata_df.toPandas().to_csv(
        os.path.join(folder, "metadata.csv"), index=False
    )


def save_metadata_table_as_excel_table(
    metadata_df: DataFrame, folder: str
) -> None:
    """Reference parity (metadata_crawler.py:232): ``metadata.xlsx``
    inside ``folder``. Excel writing needs openpyxl, which this
    container does not ship — the guard keeps the named API present
    without a hard dependency."""
    import os

    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "save_metadata_table_as_excel_table needs openpyxl; use "
            "save_metadata_table_as_csv in this container"
        ) from exc
    metadata_df.toPandas().to_excel(
        os.path.join(folder, "metadata.xlsx"), index=False
    )


def save_image_ids_as_txt(
    metadata_df: DataFrame, folder: str, id_col: str = "image_number"
) -> None:
    """Reference parity (metadata_crawler.py:242): the id column,
    comma-joined into one ``image_ids.txt``. Ids are one-per-product
    (model-sized), so the driver collect mirrors the reference's
    single-file contract. Collected in id order — DataFrame partition
    order is nondeterministic, and the reference preserves its (id-
    sorted crawl) table order, so the sort makes the file content
    stable across runs."""
    import os

    ids = [
        str(r[0])
        for r in metadata_df.select(id_col).orderBy(id_col).collect()
    ]
    with open(os.path.join(folder, "image_ids.txt"), "w") as fh:
        fh.write(",".join(ids))
