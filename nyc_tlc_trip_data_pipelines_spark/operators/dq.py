"""Data-quality constraint validation (Deequ-style).

A pipeline writing 100 TB of training data needs machine-checkable
gates between stages: completeness, uniqueness, bounds, and accepted
value sets, reported as one long-format verdict table a scheduler can
assert on. This module compiles a constraint list into at most TWO
passes over the data:

- all scalar metrics (row count, null counts, min/max) fold into ONE
  hash-free aggregate (a single reduce, no shuffle of data rows);
- uniqueness constraints need a distinct count each, computed as one
  extra aggregate per unique-key set (an unavoidable shuffle on that
  key — still linear, with map-side partial dedup).

The verdict table is tiny (one row per constraint) regardless of input
size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One validation rule. ``kind`` ∈ {not_null, unique, min_value,
    max_value, accepted_values}."""

    kind: str
    cols: tuple[str, ...]
    bound: float | None = None
    values: tuple[str, ...] = field(default_factory=tuple)

    @property
    def name(self) -> str:
        base = f"{self.kind}({','.join(self.cols)})"
        if self.bound is not None:
            return f"{base}>={self.bound}" if self.kind == "min_value" else f"{base}<={self.bound}"
        if self.values:
            return f"{base} in {{{','.join(self.values)}}}"
        return base


def not_null(*cols: str) -> Constraint:
    return Constraint("not_null", cols)


def unique(*cols: str) -> Constraint:
    return Constraint("unique", cols)


def min_value(col: str, bound: float) -> Constraint:
    return Constraint("min_value", (col,), bound=bound)


def max_value(col: str, bound: float) -> Constraint:
    return Constraint("max_value", (col,), bound=bound)


def accepted_values(col: str, *values: str) -> Constraint:
    return Constraint("accepted_values", (col,), values=tuple(values))


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Run ``constraints`` against ``df`` and return a long-format report
    (constraint, metric, passed) — metric is the measured value the rule
    was judged on (fraction complete, duplicate count, observed min/max,
    violating-row count), rounded to 6 dp.
    """
    spark = df.sparkSession
    scalar_aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(constraints):
        col = c.cols[0] if c.cols else None
        if c.kind == "not_null":
            any_null = F.col(c.cols[0]).isNull()
            for x in c.cols[1:]:
                any_null = any_null | F.col(x).isNull()
            scalar_aggs.append(F.count(F.when(any_null, 1)).alias(f"__m{i}"))
        elif c.kind == "min_value":
            scalar_aggs.append(F.min(col).alias(f"__m{i}"))
        elif c.kind == "max_value":
            scalar_aggs.append(F.max(col).alias(f"__m{i}"))
        elif c.kind == "accepted_values":
            bad = F.count(F.when(~F.col(col).isin(*c.values) | F.col(col).isNull(), 1))
            scalar_aggs.append(bad.alias(f"__m{i}"))
        elif c.kind != "unique":
            raise ValueError(f"unknown constraint kind: {c.kind}")
    scalars = df.agg(*scalar_aggs).collect()[0]
    n = scalars["__n"]

    rows: list[tuple[str, float, bool]] = []
    for i, c in enumerate(constraints):
        if c.kind == "unique":
            # per-key distinct count: one narrow shuffle on the key set
            distinct = df.select(*c.cols).distinct().count()
            dupes = float(n - distinct)
            rows.append((c.name, dupes, dupes == 0))
            continue
        m = scalars[f"__m{i}"]
        if c.kind == "not_null":
            complete = 1.0 if n == 0 else 1.0 - float(m) / n
            rows.append((c.name, round(complete, 6), m == 0))
        elif c.kind == "min_value":
            ok = m is not None and float(m) >= c.bound
            rows.append((c.name, round(float(m), 6) if m is not None else float("nan"), ok))
        elif c.kind == "max_value":
            ok = m is not None and float(m) <= c.bound
            rows.append((c.name, round(float(m), 6) if m is not None else float("nan"), ok))
        elif c.kind == "accepted_values":
            rows.append((c.name, float(m), m == 0))
    return spark.createDataFrame(rows, "constraint string, metric double, passed boolean")
