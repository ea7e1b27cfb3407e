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
    expressions — a flat codegen'd integer expression, no UDF.

    The production OPTIMIZE-rewrite variant (N columns, quantile
    bucketing for skew resistance, NULL handling) is
    :func:`io._zorder_value`, used by
    ``io.optimize_versioned(cluster_by=...)``."""
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


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_quantized(lat: Column, lon: Column, precision: int) -> Column:
    """The geohash as one interleaved integer (MSB-first, longitude
    first — the standard geohash bit order), from integer-quantized
    lat/lon. Pure shift/mask fold like :func:`zorder_key`."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast("long")
    lat_q = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast("long")
    # clamp the degenerate upper edge (lat=90 / lon=180 quantize to 2^bits)
    lon_q = F.least(lon_q, F.lit((1 << lon_bits) - 1))
    lat_q = F.least(lat_q, F.lit((1 << lat_bits) - 1))
    terms = []
    for k in range(total):
        if k % 2 == 0:
            src, src_bit = lon_q, lon_bits - 1 - k // 2
        else:
            src, src_bit = lat_q, lat_bits - 1 - (k - 1) // 2
        terms.append(
            F.shiftleft(
                F.shiftright(src, src_bit).bitwiseAND(F.lit(1)), total - 1 - k
            )
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def geohash_encode(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Standard geohash string (base32, longitude-first MSB
    interleave) as a PURE codegen expression — no UDF: quantize,
    Morton-interleave (the :func:`zorder_key` machinery generalized to
    MSB-first asymmetric bit counts), then map each 5-bit chunk
    through the base32 alphabet. The geo binning primitive for trip
    data: groupBy(geohash) is spatial clustering, prefix matching is
    spatial containment, and sorting by it is a spatial layout for
    min/max file skipping (:func:`write_zonemap`).

    Verified against the canonical test vector (57.64911, 10.40744) →
    ``u4pruydqq...``; the SQL twin is :func:`geohash_sql`.
    """
    z = _geohash_quantized(lat, lon, precision)
    chars = [
        F.element_at(
            F.split(F.lit(_GEOHASH_B32), ""),
            (
                F.shiftright(z, 5 * (precision - 1 - c)).bitwiseAND(F.lit(31)) + F.lit(1)
            ).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql_parts(lat_sql: str, lon_sql: str, precision: int = 7) -> dict[str, str]:
    """Portable ANSI-SQL twin of :func:`geohash_encode` (generator
    style, like :func:`zorder_sql`), as three composable fragments for
    a CTE pipeline — ``{"quant": "<lat_q>, <lon_q>", "z": "<sum over
    lat_q/lon_q>", "chars": "<concat over z>"}``: same quantization,
    same MSB-first interleave as a sum of scaled masked shifts, same
    base32 chunk lookup via SUBSTR. Compose as::

        WITH q AS (SELECT ..., {quant} FROM src),
             zz AS (SELECT ..., {z} AS z FROM q)
        SELECT {chars} AS geohash FROM zz
    """
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = (
        f"LEAST(CAST(FLOOR((({lon_sql}) + 180.0) / 360.0 * {float(1 << lon_bits)}) AS BIGINT), "
        f"{(1 << lon_bits) - 1}) AS lon_q"
    )
    lat_q = (
        f"LEAST(CAST(FLOOR((({lat_sql}) + 90.0) / 180.0 * {float(1 << lat_bits)}) AS BIGINT), "
        f"{(1 << lat_bits) - 1}) AS lat_q"
    )
    terms = []
    for k in range(total):
        if k % 2 == 0:
            src, src_bit = "lon_q", lon_bits - 1 - k // 2
        else:
            src, src_bit = "lat_q", lat_bits - 1 - (k - 1) // 2
        terms.append(
            f"(CAST(FLOOR({src} / {1 << src_bit}) AS BIGINT) % 2) * {1 << (total - 1 - k)}"
        )
    chars = " || ".join(
        f"SUBSTR('{_GEOHASH_B32}', "
        f"CAST((CAST(FLOOR(z / {1 << (5 * (precision - 1 - c))}) AS BIGINT) % 32) AS INTEGER) + 1, 1)"
        for c in range(precision)
    )
    return {"quant": f"{lat_q}, {lon_q}", "z": " + ".join(terms), "chars": chars}


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


def grid_radius_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """Spatial radius self-join without a nested loop: all point pairs
    within Euclidean ``radius`` of each other — GPS near-duplicate
    blocking, co-location mining, spatial entity resolution. A raw
    distance predicate plans as BroadcastNestedLoopJoin (O(n²)); this
    is the grid decomposition (the 2-D sibling of
    ``joins.interval_bucket_join``): cells of side ``radius``, one
    side exploded to its 3×3 cell neighborhood, EQUI-join on cell,
    exact distance re-check. Any pair within ``radius`` differs by at
    most one cell per axis, so the neighborhood is sufficient — false
    negatives impossible; the exact predicate kills false positives.

    Each candidate pair meets exactly once: in the UN-exploded side's
    home cell (the exploded side visits it via a neighbor offset), and
    ``id_a < id_b`` de-mirrors the self-join. Shuffle = 9·|points| +
    |points| rows hash-partitioned on cell — linear, AQE-splittable on
    dense cells. The re-check compares SQUARED distance against
    ``radius²`` (no sqrt): with integral or low-precision coordinates
    the arithmetic is exact in float64, so the boundary is
    engine-stable; trig-based great-circle distances are deliberately
    NOT used here (libm ulp differences across engines make the
    boundary nondeterministic) — for geodesic semantics pre-project
    coordinates to planar meters, then call this.
    """
    from .joins import fanout_repartition

    # r15: both join sides derive from `points`; on a single-row-group
    # scan the 9× neighbor explode and the join's map side ran on one
    # core (guide §2.5). Exact-comparison re-check downstream — no
    # float-sum aggregation — so the spread is value-exact.
    points = fanout_repartition(points, id_col)
    cx = F.floor(F.col(x_col) / radius).cast("long")
    cy = F.floor(F.col(y_col) / radius).cast("long")
    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    probe = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("xa"),
            F.col(y_col).alias("ya"),
            cx.alias("__hx"),
            cy.alias("__hy"),
        )
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a", "xa", "ya",
            (F.col("__hx") + F.col("__dx")).alias("__cx"),
            (F.col("__hy") + F.col("__dy")).alias("__cy"),
        )
    )
    # explicit multiply, not **2: POWER lowers to libm pow, whose
    # rounding is not engine-portable; a product of identical doubles is
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        probe.join(home, on=["__cx", "__cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(float(radius) ** 2)))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 6).alias("dist"))
    )
