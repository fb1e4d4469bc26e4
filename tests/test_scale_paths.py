"""IVF ANN, TF-IDF features, stateful streaming, raster crawling."""

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icecube_spark import catalog
from icecube_spark.operators import ivf, similarity
from icecube_spark.sources.raster import crawl_raster_metadata, parse_tiff_header


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4/16 must recover most of the true top-5."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    truth = similarity.cosine_topk(
        emb, "vec_id", "embedding", F.col("vec_id") < 10, k=5
    ).toPandas()
    approx = ivf.ivf_topk(
        emb, "vec_id", "embedding", F.col("vec_id") < 10,
        k_neighbors=5, n_clusters=16, nprobe=4,
    ).toPandas()
    t = set(zip(truth.query_id, truth.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(t & a) / len(t)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # probed subset: every approx cosine must appear in the full ranking
    assert (approx.groupby("query_id").size() == 5).all()


def test_tfidf_features_shape(spark, sf_dir):
    from icecube_spark.operators.features import tfidf_features

    docs = catalog.load(spark, sf_dir, "documents")
    out = tfidf_features(docs, "doc_id", "text").toPandas()
    assert len(out) == docs.count()
    assert (out["n_tokens"] > 0).all()
    v = out["tfidf"].iloc[0]
    assert v.size == 1 << 12 and len(v.indices) > 0


def _mk_tiff(width=640, height=480, bits=16, endian="<") -> bytes:
    """Hand-assemble a minimal classic TIFF header + one IFD."""
    hdr = (b"II" if endian == "<" else b"MM") + struct.pack(endian + "HI", 42, 8)
    tags = b""
    for tag, value in ((256, width), (257, height), (258, bits)):
        tags += struct.pack(endian + "HHI", tag, 3, 1) + struct.pack(
            endian + "HH", value, 0
        )
    ifd = struct.pack(endian + "H", 3) + tags + struct.pack(endian + "I", 0)
    return hdr + ifd


def test_tiff_header_parser_both_endians():
    for endian in ("<", ">"):
        meta = parse_tiff_header(_mk_tiff(1024, 768, 8, endian))
        assert meta["width"] == 1024 and meta["height"] == 768 and meta["bits"] == 8
    assert parse_tiff_header(b"PAR1not-a-tiff") is None
    assert parse_tiff_header(b"") is None


def test_raster_crawl_over_binary_source(spark, tmp_path):
    (tmp_path / "a_GRD.tif").write_bytes(_mk_tiff(512, 256, 16))
    (tmp_path / "b_GRD.tif").write_bytes(_mk_tiff(2048, 1024, 8, ">"))
    (tmp_path / "junk.tif").write_bytes(b"not a tiff at all")
    bdf = spark.read.format("binaryFile").load(str(tmp_path))
    out = crawl_raster_metadata(bdf).toPandas().sort_values("path")
    assert out["is_tiff"].sum() == 2
    good = out[out.is_tiff]
    assert set(zip(good.width, good.height)) == {(512, 256), (2048, 1024)}


def test_streaming_stateful_sessionize(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessions match the batch sessionizer for
    sessions that are closed within the drained stream."""
    from icecube_spark.operators.timeseries import sessionize
    from icecube_spark.streaming.events import read_events_stream
    from icecube_spark.streaming.stateful import streaming_sessionize

    sdf = read_events_stream(spark, sf_dir).select("ts", "user_id", "value")
    q = (
        streaming_sessionize(sdf)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("stream_sessions").toPandas()

    ev = catalog.load(spark, sf_dir, "events")
    batch = (
        sessionize(ev, "ts", "user_id", gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )
    # closed streaming sessions must agree with the batch result
    batch_keys = set(
        zip(batch.user_id, batch.session_start.astype("datetime64[us]"))
    )
    got_keys = set(zip(got.user_id, got.session_start.astype("datetime64[us]")))
    assert got_keys, "stream produced no closed sessions"
    assert got_keys <= batch_keys, "streaming emitted a session batch doesn't have"
    merged = got.merge(
        batch, on="user_id", suffixes=("_s", "_b"),
    )
    matched = merged[
        merged.session_start_s.astype("datetime64[us]")
        == merged.session_start_b.astype("datetime64[us]")
    ]
    assert (matched.n_events_s == matched.n_events_b).all()
