"""UDF surface (E26-E27): Arrow-batched pandas UDFs only.

The reference uses no UDFs (grep-verified, SURVEY.md §1.4); this module
exists because the extended engine must expose a custom-function escape
hatch. Policy (SURVEY.md §7.0): built-in functions first; when Python is
genuinely required, ``pandas_udf`` (Arrow batch transfer, vectorized
pandas compute) — never row-at-a-time ``F.udf`` on a hot path.

UDFs are built lazily (pandas_udf registration requires an active
SparkSession) and cached per-process.
"""

from __future__ import annotations

from functools import cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@cache
def revenue_pandas_udf():
    """Scalar pandas UDF (E26): discounted revenue. Exists to exercise
    the Arrow path; production plans use :func:`revenue_builtin`
    (stays in codegen, 10-100× faster)."""

    @pandas_udf("double")
    def _revenue(extendedprice: pd.Series, discount: pd.Series) -> pd.Series:
        return extendedprice * (1.0 - discount)

    return _revenue


@cache
def weighted_avg_udaf():
    """Grouped-agg pandas UDF (E27, UDAF): weighted average, used as
    ``df.groupBy(...).agg(weighted_avg_udaf()(value, weight))``."""

    @pandas_udf("double")
    def _wavg(value: pd.Series, weight: pd.Series) -> float:
        denom = weight.sum()
        return float((value * weight).sum() / denom) if denom else float("nan")

    return _wavg


def revenue_builtin(extendedprice: str = "l_extendedprice", discount: str = "l_discount") -> F.Column:
    """The codegen twin of :func:`revenue_pandas_udf` — what production
    plans should use."""
    return F.col(extendedprice) * (F.lit(1.0) - F.col(discount))


def register_tokenize_udtf(spark, name: str = "tokenize_words"):
    """Python UDTF (E26, table function): one output row per token with
    its position and length. Registered as a SQL TVF for LATERAL joins.

    UDTFs are row-at-a-time Python — acceptable for control-plane /
    low-volume expansion; hot-path tokenization uses the codegen
    ``text.tokenize`` instead.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int, word_len: int")
    class TokenizeWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").lower().split()):
                yield w, i, len(w)

    spark.udtf.register(name, TokenizeWords)
    return TokenizeWords
