"""Non-ASCII byte-exactness property tests for the G-family media
operators (operators/multimodal.py): payloads derived from emoji/CJK/
mixed-script text must produce the SAME profiles as a pure-Python twin
computed over text.encode('utf-8') — pinning the r3 fix that moved the
frame/audio math from character slicing to byte slicing, so an
ASCII-only assumption can never silently return."""

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icecube_spark.operators import multimodal

TEXTS = [
    "plain ascii only",
    "emoji 🎬🎵🔥 mixed with ascii",
    "日本語のテキストです。映像と音声の重複排除。",
    "mixed: caffè 北京 🚀 Ω ß é 한국어",
    "🧪" * 40,
    "ascii tail with combining: ééé",
]


@pytest.fixture(scope="module")
def payload_df(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    return multimodal.attach_binary(docs, "doc_id", "text")


def test_attach_binary_is_utf8_bytes(payload_df):
    got = {r.doc_id: bytes(r.payload) for r in payload_df.collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == t.encode("utf-8")


def test_frame_signatures_byte_exact(payload_df):
    rows = multimodal.frame_signatures(payload_df).collect()
    got = {(r.doc_id, r.frame_idx): (r.n_frames, r.frame_hash) for r in rows}
    for i, t in enumerate(TEXTS):
        b = t.encode("utf-8")
        n = len(b) % 7 + 1
        flen = len(b) // n
        for k in range(n):
            want = hashlib.md5(b[k * flen:(k + 1) * flen]).hexdigest()
            assert got[(i, k)] == (n, want)


def test_audio_silence_byte_exact(payload_df):
    rows = {r.doc_id: r for r in multimodal.audio_silence(payload_df).collect()}
    for i, t in enumerate(TEXTS):
        b = t.encode("utf-8")
        chunks = [b[j:j + 64] for j in range(0, len(b), 64)]
        sil = [4 * c.count(32) >= len(c) for c in chunks]
        r = rows[i]
        assert r.n_chunks == len(chunks) and r.n_silent == sum(sil)
        assert r.silence_rate == sum(sil) / len(chunks)


def test_audio_loudness_byte_exact(payload_df):
    rows = {r.doc_id: r for r in multimodal.audio_loudness(payload_df).collect()}
    for i, t in enumerate(TEXTS):
        b = t.encode("utf-8")
        chunks = [b[j:j + 64] for j in range(0, len(b), 64)]
        qrms = [
            math.floor(math.sqrt(sum(x * x for x in c) / len(c)) * 1e6)
            for c in chunks
        ]
        r = rows[i]
        assert r.mean_rms == sum(qrms) / len(qrms) / 1e6
        assert r.peak_rms == max(qrms) / 1e6
        assert r.clip_rate == sum(1 for x in b if x >= 120) / len(b)
        # multi-byte UTF-8 lead/continuation bytes are >= 0x80: every
        # non-ASCII text MUST register clipping on the 0-127 scale —
        # this is exactly the signal a char-based twin would miss
        if any(ord(ch) > 127 for ch in t):
            assert r.clip_rate > 0


def test_frame_entropy_byte_exact(payload_df):
    rows = {r.doc_id: r for r in multimodal.frame_entropy(payload_df).collect()}
    for i, t in enumerate(TEXTS):
        b = t.encode("utf-8")
        qhs = []
        for j in range(0, len(b), 64):
            c = b[j:j + 64]
            counts: dict[int, int] = {}
            for x in c:
                counts[x] = counts.get(x, 0) + 1
            s = sum(
                math.floor(n * math.log(n) * 1e6)
                for n in counts.values() if n > 1
            )
            qhs.append(math.floor((math.log(len(c)) - s / len(c) / 1e6) * 1e6))
        r = rows[i]
        assert r.n_frames == len(qhs)
        assert r.mean_entropy == sum(qhs) / len(qhs) / 1e6
        assert r.min_entropy == min(qhs) / 1e6


def test_hypothesis_style_random_unicode(spark):
    """Random multi-script strings (seeded): frame grid + silence
    profile stay byte-exact vs the python twin."""
    import random

    rnd = random.Random(42)
    pool = (
        [chr(c) for c in range(0x20, 0x7F)]
        + [chr(c) for c in range(0x4E00, 0x4E40)]      # CJK
        + [chr(c) for c in range(0x1F600, 0x1F620)]    # emoji
        + ["é", "ß", "Ω", "я", "ह", "ア"]
    )
    texts = [
        "".join(rnd.choice(pool) for _ in range(rnd.randint(1, 200)))
        for _ in range(25)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    payload = multimodal.attach_binary(docs, "doc_id", "text")
    sil = {r.doc_id: r for r in multimodal.audio_silence(payload).collect()}
    sig = multimodal.frame_signatures(payload).toPandas()
    per_doc = sig.groupby("doc_id")["n_frames"].first().to_dict()
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        assert per_doc[i] == len(b) % 7 + 1
        chunks = [b[j:j + 64] for j in range(0, len(b), 64)]
        assert sil[i].n_chunks == len(chunks)
        assert sil[i].n_silent == sum(
            4 * c.count(32) >= len(c) for c in chunks
        )
