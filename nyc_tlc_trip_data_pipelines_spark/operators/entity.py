"""Entity resolution via blocking + in-block fuzzy matching.

Matching dirty records against a clean dimension is quadratic if done
naively; the standard scale answer is BLOCKING: derive a cheap
deterministic key (prefix, phonetic code, sorted-token hash) that any
true match must share, equi-join on it, and run the expensive string
distance only within blocks. The equi-join shuffles on the block key —
linear, skew-bounded by the largest block — and the O(len²) edit
distance touches only candidate pairs. Same quadratic-taming role LSH
buckets play for near-dup text (operators/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_matches(
    dirty: DataFrame,
    clean: DataFrame,
    name_col: str,
    block_expr: Column,
    max_edit_distance: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Match each ``dirty`` record to ``clean`` records sharing its block
    key and within ``max_edit_distance`` (Levenshtein) on ``name_col``.

    ``block_expr`` is evaluated against each side's ``name_col`` (e.g.
    ``F.expr("right(name, 4)")`` or a soundex/prefix). Returns
    (dirty_name, clean_name, edit_distance) plus the id columns when
    ``id_col`` is given. Exact-equal pairs are kept (distance 0) — they
    are matches too.
    """
    d = dirty.select(
        *( [F.col(id_col).alias("dirty_id")] if id_col else [] ),
        F.col(name_col).alias("dirty_name"),
        block_expr.alias("__blk"),
    )
    c = clean.select(
        *( [F.col(id_col).alias("clean_id")] if id_col else [] ),
        F.col(name_col).alias("clean_name"),
        block_expr.alias("__blk"),
    )
    dist = F.levenshtein("dirty_name", "clean_name")
    return (
        d.join(c, "__blk")
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") <= max_edit_distance)
        .drop("__blk")
    )
