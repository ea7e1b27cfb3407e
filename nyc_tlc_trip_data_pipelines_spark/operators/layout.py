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


def write_zonemap(spark, table_path: str, cols: list[str], index_path: str) -> int:
    """Build a ZONE MAP over a parquet table: one row per data file with
    min/max/count for each of ``cols`` — the external form of the
    file-stat metadata Delta/Iceberg keep in their logs, usable over
    plain parquet directories. One scan builds it (group by
    ``input_file_name``); rebuild after compaction/appends.

    The zone map is itself a tiny parquet table (rows = files), so at
    100 TB it reads in milliseconds while the table it indexes is
    thousands of files. Pair with a clustered layout (sort or
    :func:`zorder_layout` on the indexed columns before writing) —
    stats on randomly-laid-out files span the whole domain and prune
    nothing. Returns the number of files indexed.
    """
    df = spark.read.parquet(table_path).withColumn("__file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.groupBy("__file").agg(*aggs)
    stats.write.mode("overwrite").parquet(index_path)
    return stats.count()


def zonemap_lookup(
    spark, table_path: str, index_path: str, col: str, value
) -> tuple[DataFrame, int, int]:
    """Point lookup through the zone map: read the (tiny) index, keep
    files whose [min, max] interval can contain ``value``, and scan ONLY
    those files. Returns (matching-rows DataFrame — still needs the
    row-level filter, zone maps are file-granular —, n_files_scanned,
    n_files_total).

    The driver-side collect here is the index (one row per FILE —
    metadata, bounded by file count), never table rows; this is exactly
    the planning read a table format's log replay does.
    """
    zm = spark.read.parquet(index_path).select(
        "__file", f"__min_{col}", f"__max_{col}"
    ).collect()
    files = [
        r["__file"]
        for r in zm
        if r[f"__min_{col}"] is not None
        and r[f"__min_{col}"] <= value <= r[f"__max_{col}"]
    ]
    if not files:
        empty = spark.read.parquet(table_path).filter(F.lit(False))
        return empty, 0, len(zm)
    out = spark.read.parquet(*files).filter(F.col(col) == value)
    return out, len(files), len(zm)


def zorder_sql(x_sql: str, y_sql: str, bits: int = 8) -> str:
    """The exact Morton-interleave arithmetic as portable ANSI SQL (for
    oracle replay): a sum of power-of-two–scaled masked shifts."""
    terms = []
    for i in range(bits):
        xs = f"(CAST(FLOOR(({x_sql}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}"
        ys = f"(CAST(FLOOR(({y_sql}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        terms.extend([xs, ys])
    return " + ".join(terms)
