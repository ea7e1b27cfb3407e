"""Time-series operators: sessionization, as-of join, time-spine gap-fill.

The reference treats time as an ordinary ``TimestampType`` column
(``pasta1_etl/src/main.py:73-74``) and its only temporal ops are range
filters (``pasta1_etl/src/main.py:180-186``) and calendar extraction
(``pasta2_analytics/src/main.py:39-42``). These operators extend that
surface with the time-series shapes an events/log pipeline needs, each
expressed as pure DataFrame ops so Catalyst plans them.

Scale notes (100 TB):
- ``sessionize`` costs exactly ONE hash exchange on the entity key plus a
  per-partition sort; both window passes (lag flag, running sum) share the
  same (partition, order) spec so Spark computes them in one Window node.
  Skewed entities (one user with millions of events) serialize within one
  task — pre-split such keys by a coarse time bucket if needed.
- ``asof_join`` uses the union-merge formulation: tag both sides, union,
  ONE window pass per entity ordered by time, then filter back to probe
  rows. This is O(n log n) with a single shuffle on the entity key —
  unlike the naive range-join (O(n·m) BroadcastNestedLoop) it never
  explodes. This is the standard big-data as-of pattern (same shape
  Flink/kdb use for temporal joins).
- ``time_spine`` generates the spine with ``sequence()`` + ``explode`` —
  a few thousand rows per range — and broadcast-joins it against the
  aggregated facts, so gap-filling adds no extra shuffle of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per entity (batch sessionization).

    A new session starts when the time since the previous event of the
    same entity exceeds ``gap_seconds`` (or there is no previous event).
    ``session_col`` is a per-entity 1-based running count, so
    (entity, session_id) identifies a session.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    epoch = F.col(ts_col).cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_session", new_session).withColumn(
        session_col, F.sum("_new_session").over(w)
    ).drop("_new_session")


def session_stats(
    sessions: DataFrame,
    entity_col: str,
    ts_col: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Collapse sessionized events to one row per session."""
    return sessions.groupBy(entity_col, session_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col).cast("long") - F.min(ts_col).cast("long")).alias("duration_s"),
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    entity_col: str,
    probe_ts: str,
    build_ts: str,
    build_value_alias: str = "asof_ts",
) -> DataFrame:
    """As-of (latest-prior) join via the union-merge window formulation.

    For each probe row, attaches the greatest ``build_ts`` of the same
    entity with ``build_ts <= probe_ts`` (inclusive), or NULL when no
    prior build row exists. Equivalent to DuckDB/kdb ``ASOF LEFT JOIN``.

    One shuffle on ``entity_col``; no nested-loop join. Build rows sort
    before probe rows at equal timestamps (inclusive semantics).
    """
    b = build.select(
        F.col(entity_col),
        F.col(build_ts).alias("_t"),
        F.col(build_ts).alias("_b_ts"),
        F.lit(0).alias("_side"),
    )
    p = probe.withColumn("_t", F.col(probe_ts)).withColumn(
        "_b_ts", F.lit(None).cast(build.schema[build_ts].dataType)
    ).withColumn("_side", F.lit(1))
    merged = p.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy(entity_col)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn(build_value_alias, F.last("_b_ts", ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_t", "_b_ts", "_side")


def time_spine(
    spark,
    start: str,
    end: str,
    step: str = "1 hour",
    alias: str = "bucket_ts",
) -> DataFrame:
    """Dense timestamp spine [start, end] inclusive at a fixed step."""
    return spark.sql(
        f"SELECT explode(sequence(timestamp'{start}', timestamp'{end}', "
        f"interval {step})) AS {alias}"
    )


def gapfill(
    spine: DataFrame,
    facts: DataFrame,
    bucket_col: str,
    fill_zero_cols: Sequence[str],
) -> DataFrame:
    """Left-join aggregated facts onto a dense spine, zero-filling gaps.

    ``facts`` must already be aggregated to one row per bucket, so both
    sides are spine-sized (one row per time bucket) — broadcast the
    facts side to keep the join shuffle-free.
    """
    out = spine.join(F.broadcast(facts), on=bucket_col, how="left")
    for c in fill_zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
