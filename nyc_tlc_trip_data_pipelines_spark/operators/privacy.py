"""Differentially-private aggregate release (Laplace mechanism).

The reference has no privacy surface; this covers the
publish-aggregates-safely step a data platform runs before sharing
statistics outside the trust boundary — the standard ε-DP Laplace
mechanism (Dwork et al., "Calibrating Noise to Sensitivity in Private
Data Analysis", TCC 2006): released = true_value + Laplace(Δ/ε), with
Δ the query's sensitivity (1 for counts; the clip bound for sums —
contribution clipping IS what bounds the sensitivity, same shape as
DP-SGD gradient clipping).

Determinism contract: production DP uses a CSPRNG, but a driver-checked
contract query needs the noise replayable — so the Laplace draw comes
from the portable 60-bit hash of (group key, seed) via inverse-CDF:
u = h/2⁶⁰ − ½ ∈ (−½, ½),  noise = −(Δ/ε)·sign(u)·ln(1 − 2|u|).
Every engine computes the identical hash (md5 prefix) and the same
closed form; outputs round to 6 dp so a last-ulp ln() difference
between libm implementations cannot flip the hash check. Swapping the
hash draw for `rand()` recovers the production mechanism without
touching the aggregate plan. NOTE: deterministic per-key noise is the
"seeded release" variant — re-running the SAME release reveals nothing
new, but releasing under many seeds composes like repeated queries
(standard ε-composition applies; a deployment rotates ε-budget, not
seeds).

Scale shape: one hash aggregate per release (counts and clipped sums
fold map-side); the noise is per-GROUP arithmetic on the aggregated
rows, i.e. free. Nothing row-level ever leaves the aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash60

_TWO_60 = float(1 << 60)


def _laplace_noise(key: Column, seed: int, scale: Column | float) -> Column:
    """Deterministic Laplace(scale) draw from the portable hash of
    (key, seed) — inverse-CDF over u ∈ [−½, ½). Two hash edge cases:
    h = 2⁵⁹ gives u = 0, where sign(0) degrades the draw to noise 0 —
    a valid mechanism output; h = 0 gives u = −½ exactly, where the
    unguarded ln(1 − 2|u|) = ln(0) would release −Infinity, so the
    magnitude argument is clamped at 2⁻⁶⁰ (the smallest value the
    60-bit grid can otherwise produce — the clamp maps the one
    forbidden point onto the distribution's existing max-magnitude
    tail, ~41.6·scale, rather than breaking the release). Each case
    has p = 2⁻⁶⁰ per key; the q_dp_release oracle mirrors the same
    GREATEST clamp so cross-engine parity holds even if a fixture key
    ever lands there."""
    h = portable_hash60(F.concat_ws("\x1f", key, F.lit(str(seed))))
    u = h.cast("double") / F.lit(_TWO_60) - F.lit(0.5)
    mag = -F.log(
        F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(u), F.lit(2.0**-60))
    )
    return F.signum(u) * F.lit(1.0) * scale * mag



def _group_key(keys: Sequence[str]) -> Column:
    """INJECTIVE group-key encoding for the noise hash. ``concat_ws``
    SKIPS null columns, so ('a', NULL) and (NULL, 'a') — or a
    NULL-keyed group vs a shorter key list — would collapse to the
    same key and receive IDENTICAL noise draws; shared noise lets a
    reader difference two releases and recover exact counts. A bare
    sentinel is not enough either: a real value EQUAL to the sentinel,
    or containing the join separator, still collides. So each column
    is escaped (\x1e → \x1e\x1e, \x1f → \x1e\x1f — escaped output
    never contains \x1e before anything but \x1e/\x1f) and NULL maps
    to \x1e0, which no escaped value can equal; the \x1f join of
    escaped columns is then injective over tuples of any arity."""

    def enc(k: str) -> Column:
        v = F.col(k).cast("string")
        esc = F.replace(
            F.replace(v, F.lit("\x1e"), F.lit("\x1e\x1e")),
            F.lit("\x1f"),
            F.lit("\x1e\x1f"),
        )
        return F.coalesce(esc, F.lit("\x1e0"))

    return F.concat_ws("\x1f", *[enc(k) for k in keys])


def dp_noisy_counts(
    df: DataFrame,
    keys: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """ε-DP noisy group counts: COUNT(*) per key + Laplace(1/ε).
    Returns (keys..., n_true, n_released) — callers drop ``n_true``
    before publishing; it is emitted so tests/oracles can pin the
    noise to the formula."""
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_true"))
    noise = _laplace_noise(_group_key(keys), seed, F.lit(1.0 / epsilon))
    return agg.select(
        *keys,
        "n_true",
        F.round(F.col("n_true") + noise, 6).alias("n_released"),
    )


def dp_noisy_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    clip_lo: float,
    clip_hi: float,
    epsilon: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """ε-DP noisy group sums with contribution clipping: each row's
    value is clamped to [clip_lo, clip_hi] (bounding the sensitivity at
    Δ = max(|lo|, |hi|)), summed exactly in centi-units (bigint — the
    partition-order-free determinism contract), then Laplace(Δ/ε) is
    added. Returns (keys..., sum_clipped, sum_released)."""
    delta = max(abs(clip_lo), abs(clip_hi))
    clipped = F.least(F.lit(float(clip_hi)), F.greatest(F.lit(float(clip_lo)), value))
    centi = F.round(clipped * F.lit(100.0), 0).cast("long")
    agg = df.groupBy(*keys).agg(
        F.round(F.sum(centi) / F.lit(100.0), 2).alias("sum_clipped")
    )
    noise = _laplace_noise(_group_key(keys), seed + 1, F.lit(delta / epsilon))
    return agg.select(
        *keys,
        "sum_clipped",
        F.round(F.col("sum_clipped") + noise, 6).alias("sum_released"),
    )
