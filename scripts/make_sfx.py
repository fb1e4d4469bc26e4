"""Synthesize a larger scale factor from /root/testdata/sf0.1 for
LOCAL scaling measurements (r9 VERDICT item 8: core-count evidence at
a SF where cores matter). NOT driver data — never used for grading;
results at this SF are timed, not graded.

Recipe: N key-shifted copies of each fact table so join fan-outs and
selectivities keep their shape; dimension tables (nation/region) stay
fixed, like TPC-H scaling. Text/vector payloads are decorrelated
across copies so dedup/similarity candidate structure stays
per-copy-realistic instead of exploding with cross-copy exact dups:

- documents: per-copy deterministic word scramble (sort by
  md5(word|copy)) — bag-of-words identical (tokenize/vocab ops see
  the same distribution), shingle sets decorrelated across copies
  while near-dup pairs WITHIN a copy survive (near-equal docs sort
  near-equal).
- embeddings: dims rolled by 7*copy — norms and intra-copy geometry
  exact, cross-copy cosine decorrelated.
- events: ids shifted, timestamps unchanged (10x traffic in the same
  window; calendar-bounded aggregates stay bounded, grid cells get
  10x the observations).

Usage: python scripts/make_sfx.py [n_copies] [out_dir]
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _shift(tbl: pa.Table, col: str, step: int, c: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    arr = tbl.column(i).to_numpy(zero_copy_only=False) + step * c
    return tbl.set_column(i, col, pa.array(arr, type=tbl.schema.field(i).type))


def _step(tbl: pa.Table, col: str) -> int:
    return int(tbl.column(col).to_numpy(zero_copy_only=False).max()) + 1


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfx/sf1"
    import os

    os.makedirs(out_dir, exist_ok=True)

    src = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in (
            "lineitem orders customer part supplier nation region "
            "events documents embeddings"
        ).split()
    }
    steps = {
        "o": _step(src["orders"], "o_orderkey"),
        "c": _step(src["customer"], "c_custkey"),
        "p": _step(src["part"], "p_partkey"),
        "s": _step(src["supplier"], "s_suppkey"),
        "e": _step(src["events"], "event_id"),
        "u": _step(src["events"], "user_id"),
        "d": _step(src["documents"], "doc_id"),
        "v": _step(src["embeddings"], "vec_id"),
    }

    # dimension tables: fixed, copy through
    for t in ("nation", "region"):
        pq.write_table(src[t], f"{out_dir}/{t}.parquet")

    def scramble_docs(tbl: pa.Table, c: int) -> pa.Table:
        if c == 0:
            return tbl
        texts = tbl.column("text").to_pylist()
        out = []
        salt = str(c).encode()
        for t in texts:
            words = t.split(" ")
            words.sort(
                key=lambda w: hashlib.md5(w.encode() + salt).digest()
            )
            out.append(" ".join(words))
        i = tbl.schema.get_field_index("text")
        return tbl.set_column(i, "text", pa.array(out, type=pa.string()))

    def roll_embeddings(tbl: pa.Table, c: int) -> pa.Table:
        if c == 0:
            return tbl
        col = tbl.column("embedding")
        mat = np.vstack(
            [np.asarray(x, dtype=np.float32) for x in col.to_pylist()]
        )
        mat = np.roll(mat, 7 * c, axis=1)
        i = tbl.schema.get_field_index("embedding")
        return tbl.set_column(
            i, "embedding", pa.array(list(mat), type=col.type)
        )

    plans = {
        "lineitem": lambda t, c: _shift(
            _shift(_shift(t, "l_orderkey", steps["o"], c), "l_partkey", steps["p"], c),
            "l_suppkey", steps["s"], c,
        ),
        "orders": lambda t, c: _shift(
            _shift(t, "o_orderkey", steps["o"], c), "o_custkey", steps["c"], c
        ),
        "customer": lambda t, c: _shift(t, "c_custkey", steps["c"], c),
        "part": lambda t, c: _shift(t, "p_partkey", steps["p"], c),
        "supplier": lambda t, c: _shift(t, "s_suppkey", steps["s"], c),
        "events": lambda t, c: _shift(
            _shift(t, "event_id", steps["e"], c), "user_id", steps["u"], c
        ),
        "documents": lambda t, c: scramble_docs(
            _shift(t, "doc_id", steps["d"], c), c
        ),
        "embeddings": lambda t, c: roll_embeddings(
            _shift(t, "vec_id", steps["v"], c), c
        ),
    }
    for t, fn in plans.items():
        parts = [fn(src[t], c) for c in range(n_copies)]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, f"{out_dir}/{t}.parquet")
        print(t, merged.num_rows)


if __name__ == "__main__":
    main()
