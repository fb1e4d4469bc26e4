"""Oracle-parity aggregation helpers.

The driver compares Spark results against DuckDB by value-hash, so
float aggregates must be BIT-EXACT across engines. Plain
``sum(double)`` is order-dependent (Spark and DuckDB reduce in
different orders) and will drift in the last bits. The fix: per-row
expressions stay in IEEE double (deterministic given identical
inputs), but every reduction is done in exact DECIMAL(18,8)
arithmetic, then cast back to double. Identical decimals summed
exactly → identical double, regardless of reduction order.

Precision 18 keeps Spark's Decimal on its compact long fast path
(~1.6x a raw double sum vs ~4x for decimal(38,10)). Scale 8 makes
round-ties in the double→decimal cast rare — but NOT impossible:
Spark converts via the double's SHORTEST string representation
(``BigDecimal.valueOf``) and HALF_UP-rounds it, while DuckDB rounds
the exact binary value. The two disagree whenever the shortest repr
terminates with exactly 9 fractional digits ending in '5' (e.g.
900958.003150685 → Spark .00315069, DuckDB .00315068). For
magnitudes < ~1e5 the shortest repr almost never terminates there
(17 significant digits reach past the 9th decimal); for larger
magnitudes (products like value·gap_µs) ties are routine — keep such
columns OUT of decimal folds and use integer quantization instead
(``floor(x * 10^k)`` into BIGINT sums; see operators/timeseries.py
trend_stats / time_weighted_avg).

SQL twin of ``dsum(x)``:  CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE)
SQL twin of ``davg(x)``:  CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / COUNT(x)

Two more cross-engine traps (both bit DuckDB oracles in round 4):

1. DuckDB FRACTIONAL LITERALS ARE DECIMAL, and its decimal->double
   conversion double-rounds (int mantissa -> double, then /10^scale).
   ``3.8415999999999997`` in SQL is NOT Python's ``1.96*1.96`` — even
   through CAST(... AS DOUBLE). Write double constants in scientific
   notation (``3.8415999999999997e0``), which parses directly as
   DOUBLE with a correctly-rounded string->double conversion.

2. HUGEINT->DOUBLE double-rounds the same way (upper*2^64 + lower,
   three roundings). Keep any integer an oracle casts to DOUBLE
   below 2^53 (micro-quantize per-term BEFORE squaring/folding, as
   in similarity.isotropy) so the conversion is exact in both
   engines.

3. Spark's Catalyst reassociates constant multiply chains
   (``lit(a) * x * lit(b)`` groups the literals), and DuckDB's
   optimizer reorders ``lit * x / lit`` too. Fold constant factors
   into ONE literal, or isolate the data term in parentheses as a
   single ratio, so both engines see one unambiguous op order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,8)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive, oracle-exact sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive, oracle-exact mean of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,8))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,8))) AS DOUBLE) / COUNT({expr})"


def qsum(col: Column | str, scale: int = 1_000_000) -> Column:
    """Quantized-integer exact sum for LARGE-magnitude doubles (>~1e5,
    e.g. price products), where dsum's double->decimal cast hits the
    Spark-vs-DuckDB tie-rounding divergence (see module docstring).
    floor(x*scale) of an identical IEEE double is identical in every
    engine; the integer fold is exact (decimal(28,0) never overflows
    at any realistic corpus); one final int->double conversion is
    correctly rounded in both. Truncation error <= n_rows/scale."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.floor(c * F.lit(float(scale))).cast("decimal(28,0)")).cast(
            "double"
        )
        / F.lit(float(scale))
    )


def sql_qsum(expr: str, scale: int = 1_000_000) -> str:
    """DuckDB twin of qsum: SUM(BIGINT) promotes to HUGEINT (exact);
    the final cast rounds the same exact integer to the same double."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {float(scale)}) AS BIGINT))"
        f" AS DOUBLE) / {float(scale)}"
    )
