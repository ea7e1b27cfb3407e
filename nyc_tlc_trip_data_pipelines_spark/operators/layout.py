"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional clustering is how a 100 TB table gets data skipping
on MORE than one filter column: sort by a Z-order key interleaving the
bits of the filter dimensions, write ranged files, and min/max file
stats prune on every interleaved dimension at once (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea). The key itself is pure integer bit
arithmetic — codegen'd, embarrassingly parallel; the expensive part at
scale is only the final range repartition + sort, which Spark plans as
``repartitionByRange(zkey).sortWithinPartitions(zkey)``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: z = … y1 x1 y0 x0. Built as a fold of shift/mask
    expressions — a flat codegen'd integer expression, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    file_bits: int = 6,
) -> DataFrame:
    """Assign each row its Z-order key and target "file" (the top
    ``2*bits - file_bits`` bits of z) — the bucketing a ZORDER rewrite
    would apply before writing. Returns the input plus (zkey, zfile)."""
    z = zorder_key(x, y, bits)
    return df.withColumn("zkey", z).withColumn(
        "zfile", F.shiftright(F.col("zkey"), file_bits)
    )


def zorder_sql(x_sql: str, y_sql: str, bits: int = 8) -> str:
    """The exact Morton-interleave arithmetic as portable ANSI SQL (for
    oracle replay): a sum of power-of-two–scaled masked shifts."""
    terms = []
    for i in range(bits):
        xs = f"(CAST(FLOOR(({x_sql}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}"
        ys = f"(CAST(FLOOR(({y_sql}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        terms.extend([xs, ys])
    return " + ".join(terms)
