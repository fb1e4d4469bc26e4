"""Cross-engine hash primitives (oracle parity).

- md5 hex strings are byte-identical in Spark and DuckDB.
- hex→int: the first 15 hex chars (60 bits) parse identically via
  Spark `conv(...,16,10)` and DuckDB `CAST('0x...' AS BIGINT)`.
- MinHash uses a universal hash family h_i(x) = (a_i*x + b_i) mod p
  over a single 30-bit md5-derived base per gram — one md5 per gram
  instead of 64, and the affine transforms run inside codegen'd
  min() aggregates. The (a_i, b_i) constants derive from md5 of the
  seed index, so both engines (and this module) agree on them.
"""

from __future__ import annotations

import hashlib

MERSENNE_P = 2147483647  # 2^31 - 1
BASE_MASK = (1 << 30) - 1


def _const(tag: str, i: int, mask: int) -> int:
    h = hashlib.md5(f"{tag}{i}".encode()).hexdigest()
    return int(h[:15], 16) & mask


def minhash_coeffs(num_hashes: int = 64) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs; a_i forced odd (nonzero)."""
    return [
        (_const("a", i, (1 << 29) - 1) | 1, _const("b", i, BASE_MASK))
        for i in range(num_hashes)
    ]


# Spark SQL / DuckDB fragments (same text works in both engines where noted)

def spark_hex2int(expr: str, chars: int = 15) -> str:
    return f"cast(conv(substring(md5({expr}), 1, {chars}), 16, 10) as bigint)"


def duck_hex2int(expr: str, chars: int = 15) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, {chars})) AS BIGINT)"
