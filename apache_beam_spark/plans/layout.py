"""Data layout for scan pruning: Z-order (Morton) clustering.

Beyond-reference operator, but a core 100 TB lever: parquet scans
prune by per-file/row-group min-max stats, and a table sorted on ONE
column has useless stats for every OTHER filter column.  Interleaving
the bits of two (or more) key columns into a Z-value and range-
partition-sorting by it keeps files tight in ALL interleaved
dimensions at once — multi-column point/range filters then touch a
small fraction of files instead of all of them (the Delta/Iceberg
OPTIMIZE ZORDER design).

Everything is integer Column arithmetic built as one ``F.expr`` string
(no per-bit py4j round trips, no UDF); the write path is
``repartitionByRange`` + ``sortWithinPartitions`` — one range-exchange
shuffle, the same cost as any global sort, paid once at layout time.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[str], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    Columns must be non-negative integers already scaled to ``bits``
    bits (clip or bucket upstream — e.g. ``pmod(hash(c), 2^bits)`` for
    unbounded domains).  With k columns the result uses k*bits bits,
    so k * bits must stay <= 63.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("z-order needs at least two columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a bigint")
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright(cast({c} as bigint), {i}) & 1, "
                f"{i * k + j})")
    return F.expr(" | ".join(terms))


def zorder_by(df: DataFrame, cols: Sequence[str], bits: int = 16,
              num_files: int = 32) -> DataFrame:
    """Cluster rows along the Z-curve of ``cols``: one range exchange
    on the z-value, sorted within partitions, so each output file owns
    a contiguous curve segment (tight min-max stats in every
    interleaved dimension).  Write the result with plain
    ``.write.parquet`` — the layout IS the optimization."""
    z = zvalue(cols, bits).alias("__z__")
    return (df.withColumn("__z__", z)
            .repartitionByRange(num_files, F.col("__z__"))
            .sortWithinPartitions("__z__")
            .drop("__z__"))


def zvalue_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Morton code as engine-portable SQL (DuckDB oracle
    twin) — same unrolled shift/mask terms, integer-exact."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(((CAST({c} AS BIGINT) >> {i}) & 1) "
                         f"<< {i * k + j})")
    return " | ".join(terms)
