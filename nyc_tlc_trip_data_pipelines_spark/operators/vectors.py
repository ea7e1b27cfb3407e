"""Vector similarity search over embedding columns (E30 + north star).

Embeddings are plain ``array<float>`` columns. Distance math uses
higher-order array functions (JVM-side, codegen) — no Python in the
scoring loop. Two tiers:

- :func:`cosine_topk` — brute-force scan scoring, the correctness
  baseline. At 100 TB this is one pass over the corpus per query
  (fine for few queries, embarrassingly parallel).
- :func:`ivf_topk` / LSH bucketing — the scale path: cluster/bucket
  vectors once, then probe only matching buckets (IVF-flat scheme, cf.
  Johnson et al., "Billion-scale similarity search with GPUs", and
  standard random-hyperplane LSH, Charikar 2002). Probed fraction =
  n_probe / n_buckets of the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.operators.scalars import array_dot, array_norm


def _as_vec_lit(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: score every row (codegen expression),
    then TakeOrderedAndProject (per-partition heaps, k-row driver merge —
    no global sort). Ties broken by id for determinism."""
    q = _as_vec_lit(query)
    scored = df.select(
        F.col(id_col),
        F.round(array_dot(F.col(vec_col), q) / (array_norm(F.col(vec_col)) * array_norm(q)), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def pairwise_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k neighbors for EACH query row: broadcast the (small) query
    set, score via crossJoin (map-side, no shuffle of the corpus), then
    per-query window top-k."""
    from pyspark.sql import Window

    q = queries.select(F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("__qv"))
    scored = df.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        F.round(array_dot(F.col(vec_col), F.col("__qv")) / (array_norm(F.col(vec_col)) * array_norm(F.col("__qv"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def random_hyperplane_buckets(vec_col: str | Column, planes: Sequence[Sequence[float]]) -> Column:
    """LSH bucket id from sign bits against fixed random hyperplanes
    (Charikar's SimHash for cosine). Deterministic: planes are passed in
    (callers use a seeded generator)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(array_dot(c, _as_vec_lit(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def lsh_cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    planes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """ANN via hyperplane-LSH: score only rows whose bucket matches the
    query's bucket. Recall < 1 by construction; scale path for 100 TB
    (probed fraction ≈ 2^-n_planes). Bucket the corpus ONCE at write
    time (partitionBy bucket) to turn probes into partition pruning."""
    import numpy as _np

    qv = _np.asarray(query, dtype="float64")
    qbucket = 0
    for i, p in enumerate(planes):
        if float(_np.dot(qv, _np.asarray(p, dtype="float64"))) >= 0:
            qbucket += 1 << i
    bucketed = df.withColumn("__bucket", random_hyperplane_buckets(vec_col, planes))
    cand = bucketed.filter(F.col("__bucket") == qbucket)
    return cosine_topk(cand, query, vec_col, id_col, k)


def scalar_quantize_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Int8-style scalar quantization fidelity check (the storage-
    compression step of a vector pipeline: 4× smaller than float32,
    16× smaller than float64). Per vector: symmetric scale =
    max(|v|)/(2^(bits-1) − 1), q_i = round(v_i / scale), and the
    output is the cosine between the dequantized and the original
    vector — the direct measure of recall loss. All arithmetic is
    element-ordered float64, so a SQL twin replays it exactly.

    Returns (id, cos_q, quant_ok) with ``quant_ok = cos_q >= 0.999``
    (8-bit symmetric quantization of 64-dim vectors loses well under
    0.1% cosine)."""
    qmax = float((1 << (bits - 1)) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(qmax)
    deq = F.transform(v, lambda x: F.round(x / scale, 0) * scale)
    cos = array_dot(deq, v) / (array_norm(deq) * array_norm(v))
    return df.select(
        F.col(id_col),
        F.round(cos, 4).alias("cos_q"),
        (F.round(cos, 4) >= F.lit(0.999)).alias("quant_ok"),
    )


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """IVF-flat ANN: assign each vector to its nearest centroid (one
    codegen pass), probe the ``n_probe`` centroids nearest the query.

    Centroids come from a driver-side k-means over a sample (caller's
    choice; deterministic seed). At scale, persist the assignment
    partitioned by centroid id → probing = partition pruning.
    """
    import numpy as _np

    cents = F.array(*[_as_vec_lit(c) for c in centroids])
    # nearest-centroid assignment, fully JVM-side
    dists = F.transform(cents, lambda c: array_dot(F.col(vec_col), c) / (array_norm(F.col(vec_col)) * array_norm(c)))
    assign = F.expr(
        "array_position(transform(__dists, x -> x = array_max(__dists)), true) - 1"
    )
    qv = _np.asarray(query, dtype="float64")
    sims = []
    for i, c in enumerate(centroids):
        cv = _np.asarray(c, dtype="float64")
        denom = float(_np.linalg.norm(qv) * _np.linalg.norm(cv)) or 1.0
        sims.append((float(_np.dot(qv, cv)) / denom, i))
    probe = {i for _, i in sorted(sims, reverse=True)[:n_probe]}
    assigned = df.withColumn("__dists", dists).withColumn("__cent", assign.cast("int")).drop("__dists")
    cand = assigned.filter(F.col("__cent").isin(*probe))
    return cosine_topk(cand, query, vec_col, id_col, k)
