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
from pyspark.sql import DataFrame, Window
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


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_offset long, frame_key string"


def sample_frames(df: DataFrame) -> DataFrame:
    """G2 — frame sampling: each payload row fans out to its n_frames
    frame rows (video → frame table), the 1→N mapInPandas shape every
    video pipeline needs. Frame count and byte offsets reuse the stub
    codec's deterministic dimensions; frame_key is md5(doc_id:idx) so
    the output is oracle-replicable despite the pandas path.

    Plan: embarrassingly parallel — no shuffle; each Arrow batch
    expands in-worker (fanout bounded by max n_frames = 7). At 100 TB
    the frame table lands partitioned by doc hash, never through the
    driver.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            byte_len = pdf["payload"].apply(len).astype("int64")
            n_frames = byte_len % 7 + 1
            rows = {
                "doc_id": pdf["doc_id"].repeat(n_frames),
                "byte_len": byte_len.repeat(n_frames),
                "n_frames": n_frames.repeat(n_frames),
            }
            out = pd.DataFrame(rows).reset_index(drop=True)
            out["frame_idx"] = out.groupby("doc_id").cumcount()
            out["frame_offset"] = out["frame_idx"] * (
                out["byte_len"] // out["n_frames"]
            )
            out["frame_key"] = [
                hashlib.md5(f"{d}:{i}".encode()).hexdigest()
                for d, i in zip(out["doc_id"], out["frame_idx"])
            ]
            yield out[["doc_id", "frame_idx", "frame_offset", "frame_key"]]

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id long, feature array<double>"
FEATURE_DIM = 8


def extract_features(df: DataFrame) -> DataFrame:
    """G3 — feature extraction stub: payload bytes → fixed-width
    float vector (the embed-the-image stage; a real model swaps in
    without touching the plan). v_j = payload[j·L/8] / 255 —
    deterministic in the bytes, values in [0,1]. Rows-only (blob
    indexing is pandas-side); the unit test pins determinism, schema,
    bounds.

    Plan: map-only mapInPandas, vector width constant — the output is
    ANN-index-ready input for the E-group operators.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                ln = max(len(b), 1)
                feats.append(
                    [b[(j * ln) // FEATURE_DIM % ln] / 255.0 for j in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


TILE = 256

TILE_SCHEMA = (
    "doc_id long, tile_x int, tile_y int, x0 int, y0 int, "
    "tile_w int, tile_h int"
)


def tile_manifest(meta: DataFrame) -> DataFrame:
    """G4 — image tile manifest: each decoded image fans out to its
    256×256 tile grid (edge tiles clipped) — the unit of work for any
    tiled vision encoder / SAR patch extractor. Input is the decode
    stage's metadata (doc_id, width, height).

    Plan: pure column math + one 2-D sequence explode per image —
    embarrassingly parallel, no shuffle, fanout = ceil(w/T)*ceil(h/T)
    (bounded by the decoder's max dims). The tile grid is derived
    from metadata only, so the (heavy) pixel payload is never
    duplicated per tile; a downstream crop reads (doc_id, x0, y0)
    against the payload store.
    """
    t = TILE
    nx = F.ceil(F.col("width") / F.lit(t)).cast("int")
    ny = F.ceil(F.col("height") / F.lit(t)).cast("int")
    tiles = meta.select(
        "doc_id",
        "width",
        "height",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, cast(ceil(height / {t}) as int) - 1),
                       ty -> transform(sequence(0, cast(ceil(width / {t}) as int) - 1),
                                       tx -> struct(tx, ty))))"""
            )
        ).alias("xy"),
    )
    return tiles.select(
        "doc_id",
        F.col("xy.tx").alias("tile_x"),
        F.col("xy.ty").alias("tile_y"),
        (F.col("xy.tx") * t).alias("x0"),
        (F.col("xy.ty") * t).alias("y0"),
        F.least(F.lit(t), F.col("width") - F.col("xy.tx") * t)
        .cast("int")
        .alias("tile_w"),
        F.least(F.lit(t), F.col("height") - F.col("xy.ty") * t)
        .cast("int")
        .alias("tile_h"),
    )


def prefix_dedup(df: DataFrame, id_col: str, text_col: str,
                 n_chars: int = 128) -> DataFrame:
    """G5 — media header-fingerprint dedup: group payloads whose
    leading bytes hash identically (the cheap first pass real media
    pipelines run before decoding anything — magic bytes + header +
    the first encoded block catch re-uploads and container-level
    copies without touching the full payload).

    The testable twin slices the first n_chars CHARACTERS and hashes
    their UTF-8 bytes (DuckDB's md5 is VARCHAR-only); with a real
    binary source swap in substring on the payload column — the plan
    shape (projection -> hash -> one groupBy shuffle on the digest)
    is identical. At 100 TB this reads only parquet header/prefix
    pages when the payload column is chunked, and the shuffle carries
    32-byte digests, not payloads.
    """
    h = F.md5(F.encode(F.substring(F.col(text_col), 1, n_chars), "utf-8"))
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  h.alias("prefix_hash"),
                  F.length(F.encode(F.col(text_col), "utf-8")).alias("nb"))
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("prefix_hash")
    )


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    win: int = 4096,
    hop: int = 2048,
) -> DataFrame:
    """G6 — overlapping media window manifest: fixed-size windows at
    a hop interval over each payload (the audio-pipeline analog of
    G2's frame sampling — STFT/embedding models consume exactly this
    (start, end) plan). Windows are metadata-only: the payload is
    never duplicated, downstream workers slice bytes lazily.

    Plan: map-only — byte length computes in codegen, the window
    list is a sequence() explode with fanout ceil(len/hop), bounded
    by payload size, and carries three ints per row.
    """
    nb = F.length(F.encode(F.col(text_col), "utf-8"))
    starts = F.expr(
        f"sequence(0, cast(greatest(0, nb - 1) / {hop} as int) * {hop}, {hop})"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), nb.alias("nb"))
        .select(
            "doc_id",
            "nb",
            F.posexplode(starts).alias("window_id", "w_start"),
        )
        .select(
            "doc_id",
            F.col("window_id").cast("int").alias("window_id"),
            F.col("w_start").cast("bigint").alias("w_start"),
            F.least(F.col("w_start") + F.lit(win), F.col("nb"))
            .cast("bigint")
            .alias("w_end"),
            (F.least(F.col("w_start") + F.lit(win), F.col("nb"))
             - F.col("w_start")).cast("bigint").alias("w_len"),
        )
        .orderBy("doc_id", "window_id")
    )


FRAME_SIG_SCHEMA = (
    "doc_id long, frame_idx long, n_frames long, frame_hash string"
)


def frame_signatures(df: DataFrame) -> DataFrame:
    """Per-frame CONTENT signatures: each payload splits into its
    n_frames equal byte slices (the G2 frame grid) and every slice
    gets an md5 of its bytes — the perceptual-hash stand-in a video
    dedup pipeline computes per frame (a real build swaps md5-of-
    bytes for a pHash without touching the plan).

    Plan: map-only Arrow batches, fanout bounded by max n_frames = 7;
    payload bytes never shuffle — only (doc, idx, 32-char hash) rows
    leave the worker.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frames": [],
                    "frame_hash": []}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                n = len(b) % 7 + 1
                flen = len(b) // n
                for i in range(n):
                    rows["doc_id"].append(d)
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(n)
                    rows["frame_hash"].append(
                        hashlib.md5(b[i * flen:(i + 1) * flen]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SIG_SCHEMA)


def media_frame_dedup(
    df: DataFrame, max_df: int = 64, min_shared: int = 2
) -> DataFrame:
    """G7 — cross-media near-duplicate detection by shared frames:
    media pairs whose frame signature sets overlap in >= min_shared
    frames, with the overlap fraction of the smaller medium. The
    video-dedup shape: re-encoded/trimmed copies share most frame
    signatures while sharing no container bytes (so D1-style
    whole-file hashing misses them).

    Plan: frame table → distinct (doc, hash) → inverted-index
    self-join keyed on the hash with a df <= max_df stop-frame cap
    (the D3 guard: an intro/outro frame shared by thousands of videos
    would otherwise go quadratic) → per-pair count. Only hashes and
    ids shuffle.
    """
    sigs = frame_signatures(df)
    doc_frames = sigs.select("doc_id", "n_frames", "frame_hash").distinct()
    w = Window.partitionBy("frame_hash")
    capped = doc_frames.withColumn(
        "df", F.count(F.lit(1)).over(w)
    ).where(F.col("df") <= max_df)
    a = capped.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_frames").alias("nf_a"),
        "frame_hash",
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_frames").alias("nf_b"),
        "frame_hash",
    )
    pairs = (
        a.join(b, "frame_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "nf_a", "nf_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_frames"))
        .where(F.col("n_shared_frames") >= min_shared)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_shared_frames",
        (
            F.col("n_shared_frames").cast("double")
            / F.least("nf_a", "nf_b").cast("double")
        ).alias("overlap_frac"),
    ).orderBy("doc_a", "doc_b")


AUDIO_SILENCE_SCHEMA = (
    "doc_id long, n_chunks long, n_silent long, longest_run long, "
    "silence_rate double"
)


def audio_silence(df: DataFrame, chunk: int = 64) -> DataFrame:
    """G9 — silence profiling over opaque audio payloads: split each
    payload into fixed chunk-byte windows, flag a window silent when
    >= 25% of its bytes are below the amplitude floor (byte 32 in
    this text-backed stand-in — swap the predicate for a real RMS
    gate without touching the plan), and report per-medium chunk
    counts, the longest silent run, and the silence rate. The VAD-
    style pre-screen an audio curation pass runs before any
    transcription model sees the data.

    Plan: map-only Arrow batches; each payload is processed whole
    inside its batch (chunk loop is O(len/chunk), payload bytes
    never shuffle — only the 5-column profile row leaves the
    worker). Deterministic: pure function of the payload bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_chunks": [], "n_silent": [],
                "longest_run": [], "silence_rate": [],
            }
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                chunks = [b[i : i + chunk] for i in range(0, len(b), chunk)]
                if not chunks:
                    continue
                sil = [4 * c.count(32) >= len(c) for c in chunks]
                longest = cur = 0
                for s in sil:
                    cur = cur + 1 if s else 0
                    longest = max(longest, cur)
                rows["doc_id"].append(d)
                rows["n_chunks"].append(len(chunks))
                rows["n_silent"].append(sum(sil))
                rows["longest_run"].append(longest)
                rows["silence_rate"].append(sum(sil) / len(chunks))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_SILENCE_SCHEMA)


LOUDNESS_SCHEMA = (
    "doc_id long, n_chunks long, mean_rms double, peak_rms double, "
    "dyn_range double, clip_rate double"
)


def audio_loudness(df: DataFrame, chunk: int = 64) -> DataFrame:
    """G10 — loudness-normalization profile over opaque audio
    payloads: per 64-byte window the RMS amplitude (bytes as
    unsigned samples in this text-backed stand-in), rolled up per
    medium into mean/peak RMS, dynamic range, and the clipping rate
    (samples at >= 120 of the 0-127 scale). The gain-staging /
    hot-master screen an audio curation pass runs before loudness
    normalization — complements G9's silence view from the loud end.

    Exactness: per-chunk RMS quantizes to floor(sqrt(sumsq/len)*1e6)
    — sumsq and len are exact ints and sqrt/division are IEEE-
    identical across engines; the rollup folds those ints and
    divides once; the clip rate is an exact int ratio.

    Plan: map-only Arrow batches, payload bytes never shuffle —
    only the 6-column profile row leaves the worker. Deterministic
    pure function of the payload bytes.
    """
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_chunks": [], "mean_rms": [],
                "peak_rms": [], "dyn_range": [], "clip_rate": [],
            }
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if not b:
                    continue
                chunks = [b[i : i + chunk] for i in range(0, len(b), chunk)]
                qrms = [
                    math.floor(
                        math.sqrt(sum(x * x for x in c) / len(c)) * 1e6
                    )
                    for c in chunks
                ]
                clip = sum(1 for x in b if x >= 120)
                rows["doc_id"].append(d)
                rows["n_chunks"].append(len(chunks))
                rows["mean_rms"].append(sum(qrms) / len(qrms) / 1e6)
                rows["peak_rms"].append(max(qrms) / 1e6)
                rows["dyn_range"].append((max(qrms) - min(qrms)) / 1e6)
                rows["clip_rate"].append(clip / len(b))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=LOUDNESS_SCHEMA)


FRAME_ENTROPY_SCHEMA = (
    "doc_id long, n_frames long, mean_entropy double, min_entropy double, "
    "low_entropy_share double"
)


def frame_entropy(df: DataFrame, chunk: int = 64) -> DataFrame:
    """G11 — per-frame byte-entropy profile over opaque media
    payloads: each 64-byte frame's Shannon entropy (nats) over its
    byte histogram, rolled up per medium into mean/min entropy and
    the share of low-entropy frames (< 3 nats — blank/solid/padded
    frames). The cheap "is this media content or filler" triage run
    before any expensive decode — complements G8's scene cuts
    (change between frames) with WITHIN-frame information density.

    Exactness: per-frame entropy uses the F45 scheme — each n·ln(n)
    term quantizes to micro-nats (ln of an exact int is the same
    double everywhere), H = ln(L) - s/L/1e6 then floors to a 1e-6
    grid; rollups fold those ints and divide once.

    Plan: map-only Arrow batches; payloads never shuffle.
    """
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "n_frames": [], "mean_entropy": [],
                "min_entropy": [], "low_entropy_share": [],
            }
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if not b:
                    continue
                qhs = []
                for i in range(0, len(b), chunk):
                    c = b[i : i + chunk]
                    counts: dict[int, int] = {}
                    for x in c:
                        counts[x] = counts.get(x, 0) + 1
                    s = sum(
                        math.floor(n * math.log(n) * 1e6)
                        for n in counts.values()
                        if n > 1
                    )
                    h = math.log(len(c)) - s / len(c) / 1e6
                    qhs.append(math.floor(h * 1e6))
                low = sum(1 for q in qhs if q < 3_000_000)
                rows["doc_id"].append(d)
                rows["n_frames"].append(len(qhs))
                rows["mean_entropy"].append(sum(qhs) / len(qhs) / 1e6)
                rows["min_entropy"].append(min(qhs) / 1e6)
                rows["low_entropy_share"].append(low / len(qhs))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_ENTROPY_SCHEMA)
