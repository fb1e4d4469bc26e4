"""Multimodal binary-column plumbing (SURVEY §2 G1).

Mirrors the reference's raster ingestion boundary
(icecube/utils/analytics_IO.py: load_tiff / load_ICEYE_h5 /
extract_complex_channels): opaque payloads arrive as a binary column
with typed metadata, and decoding happens in an Arrow-batched
mapInPandas stage. The image/audio codec libraries are not in this
container, so `decode_stub` derives deterministic fake dimensions
from the payload bytes — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and is what these tests cover. A
real decoder swaps into `_decode_batch` unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, n_frames long, "
    "modality string"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (stand-in for image
    /audio bytes; real pipelines read these via the binaryFile source).
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: real image decode (PIL/ffmpeg) is unavailable in
    this container; dimensions are a deterministic function of the
    byte length so the oracle can replicate them. Swap this function
    for a real codec without touching the Spark plan."""
    byte_len = pdf["payload"].apply(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": byte_len,
            "width": (byte_len % 64) * 16 + 16,
            "height": ((byte_len // 64) % 64) * 16 + 16,
            "n_frames": byte_len % 7 + 1,
            "modality": "image",
        }
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas streams binary batches through
    the (stub) codec. At 100 TB this stage is embarrassingly parallel —
    no shuffle, batch size bounded by spark.sql.execution.arrow
    settings, payload never round-trips through the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.mapInPandas(run, schema=META_SCHEMA)
