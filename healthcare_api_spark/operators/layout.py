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

from pyspark.sql import Column, DataFrame, Window
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


def rank_normalize16(
    df: DataFrame, col: str, out_col: str, bits: int = 16, parts: int | None = None
) -> DataFrame:
    """Replace a high-cardinality / skewed column with its exact
    ``bits``-bit dense rank: ``floor(dense_rank0 * 2^bits / n_distinct)``
    — a uniform [0, 2^bits) domain, so the Morton key keeps locality
    where raw ``pmod`` would scatter it (the layout.py caveat VERDICT r2
    #6 flags).

    NOT a global-window ``dense_rank()`` (a window with no partitionBy
    pulls the whole table into ONE task — the exact scale-killer this
    module exists to avoid). Distributed exact rank instead:

    1. distinct values (one shuffle, |distinct| rows — the only data
       that ever sorts),
    2. ``repartitionByRange`` so partition *i* holds values strictly
       below partition *i+1* (materialized via localCheckpoint: range
       boundaries are sampled, so the frame must be pinned before it is
       read twice),
    3. per-partition counts → cumulative offsets on the driver (one int
       per partition),
    4. rank = offset[pid] + per-partition row_number (windows are
       per-partition → parallel), scaled to ``bits`` bits in exact
       integer arithmetic,
    5. equi-join the tiny (value → rank) frame back (AQE broadcasts it
       when small).

    Rows with NULL in ``col`` get NULL rank (filter or coalesce first).
    """
    n = 1 << bits
    spark = df.sparkSession
    distinct = df.select(col).filter(F.col(col).isNotNull()).distinct()
    parts = parts or spark.sparkContext.defaultParallelism
    ranged = (
        distinct.repartitionByRange(parts, F.col(col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    off_map = F.create_map(
        *[x for pid in sorted(counts) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("_pid").orderBy(col)
    ranks = (
        ranged.withColumn("_lr", F.row_number().over(w))
        # BIGINT before the scale-up: INT·65536 silently wraps negative
        # past 32767 distinct values (ANSI off) — only visible at scale
        .withColumn(
            "_grank", (off_map[F.col("_pid")] + F.col("_lr") - 1).cast("bigint")
        )
        .select(
            F.col(col).alias("_rv"),
            F.expr(f"(_grank * {n}L) DIV {total}").cast("bigint").alias(out_col),
        )
    )
    return df.join(ranks, df[col] == F.col("_rv"), "left").drop("_rv")


def rank_normalize16_sql(col: str, table: str, bits: int = 16) -> str:
    """The identical rank expression as portable SQL (DuckDB) for the
    correctness oracle — keep in lockstep with ``rank_normalize16``:
    ``(dense_rank0 * 2^bits) // n_distinct`` in exact integer math."""
    n = 1 << bits
    return (
        f"((DENSE_RANK() OVER (ORDER BY {col}) - 1) * {n})"
        f" // (SELECT COUNT(DISTINCT {col}) FROM {table} WHERE {col} IS NOT NULL)"
    )


def zorder_by_ranked(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """``zorder_by`` for high-cardinality / skewed / non-integer keys:
    both columns are first normalized to their exact 16-bit dense rank
    (uniform domain → every Morton bit carries information), then the
    interleaved key is attached as ``zkey`` and rows are sorted within
    partitions by it."""
    out = rank_normalize16(df, col_a, "_ra", bits)
    out = rank_normalize16(out, col_b, "_rb", bits)
    key = morton_key(F.col("_ra"), F.col("_rb"))
    return (
        out.withColumn("zkey", key.cast("bigint"))
        .drop("_ra", "_rb")
        .sortWithinPartitions("zkey")
    )


def morton_key_sql(a_expr: str, b_expr: str) -> str:
    """The identical key as engine-portable SQL (DuckDB syntax) — used
    by the correctness oracle; keep in lockstep with ``morton_key``."""

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a_expr)} | ({spread(b_expr)} << 1))"


def bloom_filter_options(cols: list[str], ndv: int = 100_000) -> dict[str, str]:
    """Writer options enabling parquet bloom filters for point-lookup
    columns (ids, join keys): reader-side, a `col = 'x'` probe skips
    row groups whose filter proves absence — complementary to min/max
    stats, which only help on RANGE-clustered data. Cost is
    ~1.2 bytes/ndv per row group; set ``ndv`` near the expected
    distinct count per row group (too low inflates false-positive
    rate, too high wastes space)."""
    opts = {}
    for c in cols:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(ndv)
    return opts


# 3-D bit-spreading masks: low 10 bits → every 3rd bit of a 30-bit lane
_SPREAD3 = [
    (16, 0x030000FF),
    (8, 0x0300F00F),
    (4, 0x030C30C3),
    (2, 0x09249249),
]


def _spread10_3(c: Column) -> Column:
    """Spread the low 10 bits of ``c`` to every 3rd bit position
    (0b_abc → 0b_a00b00c)."""
    x = c.cast("bigint").bitwiseAND(F.lit(0x3FF))
    for shift, mask in _SPREAD3:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key3(a: Column, b: Column, c: Column) -> Column:
    """Interleave the low 10 bits of three non-negative integer columns
    into one 30-bit 3-D Z-order key — row-group stats then prune on any
    of the THREE dimensions. Same rank-normalization guidance as the
    2-D key (use ``rank_normalize16`` with ``bits=10`` for skewed or
    high-cardinality columns)."""
    return (
        _spread10_3(a)
        .bitwiseOR(F.shiftleft(_spread10_3(b), 1))
        .bitwiseOR(F.shiftleft(_spread10_3(c), 2))
    )


def morton_key3_sql(a_expr: str, b_expr: str, c_expr: str) -> str:
    """``morton_key3`` as engine-portable SQL for the oracle."""

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & 1023)"
        for shift, mask in _SPREAD3:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return (
        f"({spread(a_expr)} | ({spread(b_expr)} << 1) | ({spread(c_expr)} << 2))"
    )


# ------------------------------------------------------------- Hilbert --


def hilbert_key_cols(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, out_col: str = "hkey"
) -> DataFrame:
    """Attach the 2-D Hilbert-curve index of ``(col_a, col_b)`` (low
    ``bits`` bits each) as ``out_col`` — the locality-optimal layout
    key: unlike Morton/Z-order (l1/l2), the Hilbert curve has NO long
    diagonal jumps, so a range predicate on either column touches
    strictly fewer row groups after sorting by this key (the curve is
    a single unbroken path; every consecutive pair of keys is a grid
    neighbor — asserted exhaustively in tests).

    The classic iterative xy2d walk (one rotation per bit level,
    Wikipedia "Hilbert curve"), unrolled as ``withColumn`` steps: each
    level is a SMALL named projection over the previous level's
    columns. Building it as one nested expression triples the tree per
    level (3^16 nodes — Py4J OOMs before Catalyst even sees it);
    named steps keep construction linear and let codegen reuse the
    per-level subexpressions. Pure JVM bit arithmetic, zero shuffle,
    bit-exact vs the chained-CTE SQL twin (hilbert_key_sql)."""
    n = 1 << bits
    d = df.withColumn("_hx", F.col(col_a).cast("bigint").bitwiseAND(F.lit(n - 1)))
    d = d.withColumn("_hy", F.col(col_b).cast("bigint").bitwiseAND(F.lit(n - 1)))
    d = d.withColumn("_hd", F.lit(0).cast("bigint"))
    s = n >> 1
    while s > 0:
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d.withColumn("_rx", rx).withColumn("_ry", ry)
        d = d.withColumn(
            "_hd",
            F.col("_hd")
            + F.lit(s) * F.lit(s) * ((F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry"))),
        )
        # rotate: ry=0 → (maybe reflect) then swap x/y
        nx = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(n) - 1 - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(n) - 1 - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        d = d.withColumn("_nx", nx).withColumn("_ny", ny)
        d = d.withColumn("_hx", F.col("_nx")).withColumn("_hy", F.col("_ny"))
        s >>= 1
    return d.withColumn(out_col, F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny"
    )


def hilbert_key_sql(
    xcol: str, ycol: str, bits: int, carry_cols: list[str], table: str,
    out_col: str = "hkey",
) -> str:
    """The identical xy2d walk as portable SQL for the DuckDB oracle —
    one chained subquery per bit level with NUMBERED columns (SQL
    lateral alias resolution would otherwise read the new value where
    the algorithm needs the old one). Keep in lockstep with
    ``hilbert_key_cols``."""
    n = 1 << bits
    carry = ", ".join(carry_cols)
    sql = (
        f"SELECT {carry},"
        f" CAST({xcol} AS BIGINT) & {n - 1} AS hx0,"
        f" CAST({ycol} AS BIGINT) & {n - 1} AS hy0,"
        f" CAST(0 AS BIGINT) AS hd0 FROM {table}"
    )
    s, i = n >> 1, 0
    while s > 0:
        x, y, d, j = f"hx{i}", f"hy{i}", f"hd{i}", i + 1
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        sql = (
            f"SELECT {carry},"
            f" CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f"  THEN {n} - 1 - {y} ELSE {y} END ELSE {x} END AS hx{j},"
            f" CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1"
            f"  THEN {n} - 1 - {x} ELSE {x} END ELSE {y} END AS hy{j},"
            f" {d} + {s * s} * xor(3 * {rx}, {ry}) AS hd{j}"
            f" FROM ({sql})"
        )
        s, i = s >> 1, j
    return f"SELECT {carry}, hd{i} AS {out_col} FROM ({sql})"
