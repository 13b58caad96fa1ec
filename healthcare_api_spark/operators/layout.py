"""Physical-layout operators: Z-order (Morton) keys for multi-dimension
data skipping — the table-format-free equivalent of Delta/Iceberg
``OPTIMIZE ZORDER BY``.

Sorting a table by the interleaved-bit key clusters rows that are close
in BOTH dimensions into the same Parquet row groups, so min/max
statistics prune scans for predicates on EITHER column — a plain sort
by (a, b) only skips well on ``a``. The key itself is pure JVM bit
arithmetic (narrow, codegen, engine-portable — no UDF), so it is
oracle-verifiable and cheap enough to compute at write time for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spreading masks for 16-bit → even-bit-position expansion (the
# classic Morton magic numbers)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to the even bit positions of a
    32-bit lane (0babcd → 0b0a0b0c0d)."""
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative integer columns
    into one 32-bit Z-order key (``a`` on even bits, ``b`` on odd)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Return ``df`` sorted by the Morton key of (col_a, col_b) with the
    key attached as ``zkey`` — write the result with
    ``maxRecordsPerFile`` / partitioning of your choice and row-group
    min/max stats will prune on both columns. Columns wider than
    ``bits`` bits should be range-bucketed first (the key uses the low
    16 bits; high-cardinality keys keep locality after
    ``pmod(col, 1<<16)`` only if the domain is uniform — otherwise
    normalize to a 16-bit rank first)."""
    key = morton_key(F.col(col_a), F.col(col_b))
    return df.withColumn("zkey", key.cast("bigint")).sortWithinPartitions("zkey")


def morton_key_sql(a_expr: str, b_expr: str) -> str:
    """The identical key as engine-portable SQL (DuckDB syntax) — used
    by the correctness oracle; keep in lockstep with ``morton_key``."""

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a_expr)} | ({spread(b_expr)} << 1))"
