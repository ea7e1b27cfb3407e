"""Skew mitigation for large joins (SURVEY.md §4.3 scale notes).

Two public techniques:

- **AQE skew-join** (enabled in the session factory): Spark splits
  oversized shuffle partitions at runtime. Zero code — first line of
  defense.
- **Salting** (this module): when one side's key distribution is so hot
  that even split partitions overwhelm a task (classic power-law user_id
  / null-key cases), explode the small side N ways and scatter the big
  side across the same N salts. Shuffle becomes uniform by construction.

Salting trades N× duplication of the small side for even task sizing —
choose ``salt_buckets`` ≈ hottest-key-rows / target-rows-per-task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big gets a random-but-deterministic salt in [0, salt_buckets) from a
    hash of its whole row position-independent key set; small is
    exploded once per salt value. Join keys become (on..., salt).
    Result columns match a plain ``big.join(small, on, how)``.
    """
    on = list(on)
    big_s = big.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int")
    )
    small_s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, on=on + [salt_col], how=how)
    return out.drop(salt_col)
