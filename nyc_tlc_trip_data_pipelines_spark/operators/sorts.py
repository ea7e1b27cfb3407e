"""Sorts, top-k, set operations, exact dedup (R19/R20; E18-E20).

Reference parity: the 4-column global ORDER BY (R20,
``pasta2_analytics/src/main.py:48``) and GROUP-BY-all-columns dedup (R19,
``:45-47``).

100 TB notes: a global sort is a range exchange (sampled boundaries) —
fine for final, small-ish results; never sort a full fact table just to
take k rows. ``orderBy().limit(k)`` compiles to TakeOrderedAndProject:
per-partition top-k heaps, then a k-row merge on the driver — no global
sort ever materializes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort(df: DataFrame, by: Sequence[str | Column]) -> DataFrame:
    """Global multi-column sort (R20): range-partitioned sort exchange."""
    return df.orderBy(*by)

def top_k(df: DataFrame, by: Sequence[Column | str], k: int) -> DataFrame:
    """Sort + LIMIT (E18) → TakeOrderedAndProject (per-partition heaps,
    driver merges k rows; no global sort)."""
    return df.orderBy(*by).limit(k)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup (E20, and reference R19's GROUP-BY-all semantics):
    hash-partition on the subset, keep one row per key. Map-side partial
    dedup happens first, so shuffle volume ≈ distinct keys."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Merge/upsert semantics without a transactional table format:
    rows from ``updates`` replace same-key rows in ``base``; unmatched
    rows pass through (SQL ``MERGE ... WHEN MATCHED UPDATE WHEN NOT
    MATCHED INSERT``). Pure DataFrame formulation: anti-join + union —
    one shuffle on the key, no driver-side row handling.

    At 100 TB: partition both sides on the key at write time so the
    anti-join co-locates; with a transactional format (Delta/Iceberg)
    this becomes a native MERGE with file-level pruning.
    """
    keys = list(keys)
    kept = base.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD Type-2 merge: apply ``updates`` to a versioned dimension,
    closing out changed current rows at ``effective_ts`` and inserting
    the new versions as open rows. Unchanged keys (and all historical
    rows) pass through untouched.

    ``dim`` carries (keys…, compare_cols…, valid_from, valid_to,
    is_current); ``updates`` carries (keys…, compare_cols…). A row is
    "changed" when any compare_col differs from the key's CURRENT row —
    no-op updates produce no new version (idempotent re-application).

    Shape: one hash join keys→current rows to find the changed set (the
    small side broadcasts when updates are small), then unions — no
    window, no global sort. At 100 TB this is the MERGE pattern of a
    Delta/Iceberg SCD2 pipeline expressed as pure DataFrame ops;
    partition the dimension by key-bucket at write time so the join
    co-locates.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    eff = F.lit(effective_ts) if not isinstance(effective_ts, Column) else effective_ts

    cur = dim.filter(F.col(is_current))
    diff = F.lit(False)
    for c in compare_cols:
        diff = diff | ~F.col(f"u.{c}").eqNullSafe(F.col(f"d.{c}"))
    changed = (
        updates.alias("u")
        .join(cur.alias("d"), on=keys, how="inner")
        .filter(diff)
        .select(*keys, *[F.col(f"u.{c}").alias(c) for c in compare_cols])
    )
    changed_keys = changed.select(*keys)
    closed = (
        cur.join(changed_keys, on=keys, how="left_semi")
        .withColumn(valid_to, eff.cast("timestamp"))
        .withColumn(is_current, F.lit(False))
    )
    opened = changed.select(
        *keys,
        *compare_cols,
        eff.cast("timestamp").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(is_current),
    )
    untouched_current = cur.join(changed_keys, on=keys, how="left_anti")
    history = dim.filter(~F.col(is_current))
    return (
        history.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(opened.select(*dim.columns))
    )


def union_all(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    """UNION ALL (E19) — no shuffle at all, just concatenated partitions."""
    return a.unionByName(b) if by_name else a.union(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL UNION: concat + hash dedup."""
    return a.unionByName(b).dropDuplicates()


def intersect(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def cdc_apply(
    ops: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete ops with a sequence
    number) to produce the final table state: the HIGHEST-sequence op
    per key wins; a winning delete removes the key. The standard
    changelog-compaction shape (Debezium/Delta CDF consumers).

    One window pass over (key, seq DESC) — a single hash exchange on the
    key — then a filter. Equivalent to MERGE applied in order, but
    expressed as one deterministic dataflow (no per-op loop), which is
    the only shape that scales when the changelog is billions of rows.
    Ties on ``seq_col`` break by preferring the later op marker
    (lexicographically greatest) so re-runs are deterministic.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = ops.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return latest.filter(F.col(op_col) != delete_op).drop("__rn", op_col, seq_col)
