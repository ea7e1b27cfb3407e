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


def profile(
    df: DataFrame,
    cols: "list[str] | None" = None,
    exact_ndv: bool = False,
) -> DataFrame:
    """Single-pass column profiler — the ANALYZE/statistics analog every
    warehouse gate runs before trusting a table: per column, row count,
    null count, min/max (computed on the native type, then rendered as
    string), and distinct count.

    Scale shape: ONE aggregate over the table computes every column's
    stats (map-side partials, one exchange of a single row per
    partition). ndv defaults to ``approx_count_distinct`` — HLL, fully
    mergeable, no plan blow-up. ``exact_ndv=True`` swaps in
    COUNT(DISTINCT col), which Catalyst rewrites to an Expand ×|cols|
    over the scan — affordable for a correctness gate, wrong as the
    100 TB default (use it per-column, not per-table, there).

    Returns long format: (column, n_rows, n_nulls, n_distinct, min_s,
    max_s), one row per profiled column, ordered by column name.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        ndv = (
            F.count_distinct(F.col(c)) if exact_ndv else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nulls_{c}"),
            ndv.cast("long").alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    out_rows = []
    for c in cols:
        out_rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
            )
        )
    return (
        row.select(F.explode(F.array(*out_rows)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    mode: str = "overwrite",
) -> dict:
    """Sink with FREE data-quality metrics via Spark's Observation API:
    the named aggregate expressions are evaluated as a side-effect of
    the write itself — ZERO extra passes over the data, unlike running
    ``validate``/``profile`` after the write (which re-scans what was
    just written). The production gate pattern for a 100 TB pipeline
    stage: the job that materializes a table also certifies it.

    ``metrics`` maps metric name → aggregate Column (count/sum/
    null-count/min/max — any expression Spark's observe supports:
    aggregates only, no distinct, which needs a shuffle and therefore
    its own pass). Returns the observed values as a dict after the
    write action completes.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).parquet(path)
    return obs.get


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    bucket: Column | str,
    alias: str = "bucket",
) -> DataFrame:
    """Population Stability Index per bucket — THE production
    drift metric for "did this feature's distribution move between
    the baseline window and now" (credit-risk monitoring lineage;
    > 0.25 total conventionally means investigate). Per-bucket
    contribution ``(p − q)·ln(p/q)`` with p = current share,
    q = baseline share; the total is the sum over buckets.

    Plan shape: one hash aggregate per side (shuffle = bucket
    cardinality, map-side combined), a broadcast-sized outer join of
    the two bucket tables, shares from a broadcast one-row totals
    join. At 100 TB each side is scanned once; everything
    after is bucket-cardinality-sized. Buckets present on only one
    side get a NULL psi term (ln(0) is undefined) rather than the
    +inf a naive formula produces — surface them via the null, don't
    hide them in a clamp.

    Returns (bucket, n_base, n_curr, p_base, p_curr, psi_term)."""
    key = F.col(bucket) if isinstance(bucket, str) else bucket
    b = baseline.groupBy(key.alias(alias)).agg(F.count(F.lit(1)).alias("n_base"))
    c = current.groupBy(key.alias(alias)).agg(F.count(F.lit(1)).alias("n_curr"))
    return psi_from_counts(b, c, alias)


def psi_from_counts(
    base_counts: DataFrame, curr_counts: DataFrame, alias: str = "bucket"
) -> DataFrame:
    """The PSI core over PRE-AGGREGATED (bucket, n_base) / (bucket,
    n_curr) tables — exposed for callers whose counts come from
    somewhere other than a raw scan, e.g. a streaming aggregation's
    final state (the monitor never re-reads the stream) or a stored
    rollup. Same semantics and output columns as :func:`psi_drift`."""
    joined = base_counts.join(curr_counts, alias, "full_outer").select(
        alias,
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
    )
    totals = joined.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_curr").alias("__tc")
    )
    joined = joined.crossJoin(F.broadcast(totals))
    p_base = F.col("n_base") / F.col("__tb")
    p_curr = F.col("n_curr") / F.col("__tc")
    term = F.when(
        (F.col("n_base") > 0) & (F.col("n_curr") > 0),
        (p_curr - p_base) * F.log(p_curr / p_base),
    )
    return joined.select(
        alias,
        "n_base",
        "n_curr",
        F.round(p_base, 6).alias("p_base"),
        F.round(p_curr, 6).alias("p_curr"),
        F.round(term, 6).alias("psi_term"),
    )


def bucket_checksums(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Order-independent per-bucket content checksums — the
    anti-entropy primitive for comparing two copies of a table
    (replica validation, migration sign-off, versioned-snapshot diff)
    WITHOUT shuffling either table to the other: each side reduces to
    ``n_buckets`` (checksum, count) rows; only those tiny summaries
    ever travel.

    Row fingerprint = portable 60-bit md5 over the '|'-joined string
    rendering of ``cols`` (caller picks bit-stable columns — ints /
    strings / timestamps; double rendering is engine-specific);
    bucket = fingerprint mod ``n_buckets``; checksum = SUM(fingerprint)
    as DECIMAL(28,0) — exact and reduce-order-independent, so the same
    rows in any order and any partitioning give the same checksum. A
    single changed/missing row flips exactly one bucket.

    100 TB: one map-side-combinable aggregate; shuffle = n_buckets rows."""
    from .text import portable_hash60

    fp = portable_hash60(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
    return (
        df.select(fp.alias("fp"))
        .groupBy(F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int").alias("bucket"))
        .agg(
            F.sum(F.col("fp").cast("decimal(28,0)")).alias("checksum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def checksum_diff(
    left: DataFrame,
    right: DataFrame,
    cols: list[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Buckets where two tables' contents differ, with row-count deltas
    — full-outer join of the two :func:`bucket_checksums` summaries
    (n_buckets rows each side, broadcast-sized at any table scale).
    Equal tables produce ZERO rows; each differing bucket narrows a
    follow-up row-level diff to 1/n_buckets of the data."""
    a = bucket_checksums(left, cols, n_buckets).alias("a")
    b = bucket_checksums(right, cols, n_buckets).alias("b")
    j = a.join(b, on=F.col("a.bucket") == F.col("b.bucket"), how="full_outer")
    return (
        j.where(
            F.coalesce(F.col("a.checksum"), F.lit(0)) != F.coalesce(F.col("b.checksum"), F.lit(0))
        )
        .select(
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_rows_left"),
            F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_rows_right"),
            (F.coalesce(F.col("a.n_rows"), F.lit(0)) - F.coalesce(F.col("b.n_rows"), F.lit(0))).alias("row_delta"),
        )
    )
