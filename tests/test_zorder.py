"""optimize_versioned(cluster_by=...) — the OPTIMIZE ... ZORDER BY
analog (Delta Lake's public OSS data-skipping feature, re-expressed):
quantile-bucket each cluster column with a distributed sketch,
interleave the bucket bits into a Morton key, range-repartition + sort
on it, rewrite as one manifest commit. The tests pin the three claims
the 100 TB story leans on: (a) every output file covers a TIGHT
min/max rectangle in ALL clustered dimensions (what parquet row-group
stats prune on), (b) the rows are byte-identical and time travel
survives, (c) the plan has no serial stage and no Python UDF.
"""

import os

import pytest
from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark import io as eio


def _per_file_spans(spark, job_dir, cols, domain):
    files = [
        os.path.join(job_dir, f)
        for f in os.listdir(job_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    spans = {c: [] for c in cols}
    for f in files:
        row = spark.read.parquet(f).agg(
            *[x for c in cols for x in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))]
        ).collect()[0]
        for c in cols:
            spans[c].append((row[f"hi_{c}"] - row[f"lo_{c}"]) / domain)
    return len(files), {c: sum(v) / len(v) for c, v in spans.items()}


def _mk(spark, n=1_000_000):
    # two pseudo-independent uniform dimensions over [0, 1000), plus an
    # incompressible pad so parquet bytes (what n_out is sized from)
    # scale with rows instead of dictionary-encoding away
    return (
        spark.range(n)
        .select(
            (F.col("id") % 1000).cast("long").alias("x"),
            ((F.col("id") * F.lit(2654435761)) % 1000).cast("long").alias("y"),
            F.xxhash64("id").alias("pad"),
        )
    )


def _checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.xxhash64("x", "y", "pad")).alias("h"),
    ).collect()[0]


def test_zorder_optimize_tightens_all_dimensions(spark, tmp_path):
    df = _mk(spark)
    zt, pt = str(tmp_path / "zt"), str(tmp_path / "pt")
    for t in (zt, pt):
        assert eio.append_versioned(df.repartition(8), t, "batch0") == 0
    before = _checksum(eio.read_version(spark, zt, 0))

    vz = eio.optimize_versioned(spark, zt, target_mb=1, cluster_by=["x", "y"])
    vp = eio.optimize_versioned(spark, pt, target_mb=1)

    nz, zspans = _per_file_spans(
        spark, os.path.join(zt, f"__job_id=optimize.o{vz}"), ["x", "y"], 999.0
    )
    np_, pspans = _per_file_spans(
        spark, os.path.join(pt, f"__job_id=optimize.o{vp}"), ["x", "y"], 999.0
    )
    assert nz >= 4 and np_ >= 4  # enough files for spans to mean anything
    # plain round-robin: every file spans ~the whole domain in both dims
    assert pspans["x"] > 0.85 and pspans["y"] > 0.85
    # z-order: every file covers a tight rectangle in BOTH dims at once.
    # The pruning-relevant metric is the RECTANGLE AREA a 2-predicate
    # scan must intersect (span_x * span_y): plain files cover ~the
    # whole unit square; z-ordered files must cover well under half,
    # and neither single dimension may degenerate to a full-span strip
    # (which is what a plain ORDER BY x would produce for y).
    assert pspans["x"] * pspans["y"] > 0.7
    assert zspans["x"] * zspans["y"] < 0.4, (nz, zspans)
    assert zspans["x"] < 0.75 and zspans["y"] < 0.75, (nz, zspans)
    # rows survive byte-identically; time travel still resolves v0
    assert _checksum(eio.read_version(spark, zt, vz)) == before
    assert eio.read_version(spark, zt, 0).count() == before.n


def test_zorder_plan_is_distributed_and_jvm_side(spark):
    df = _mk(spark, 100_000)
    z = eio._zorder_value(df, ["x", "y"], bits=6)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(8, F.col("__z"), F.xxhash64("x", "y"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan  # no serial stage
    assert "Window" not in plan                    # no global window
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_zorder_value_skew_and_nulls(spark):
    # 90% of rows share one x value; y has nulls — buckets must stay
    # defined (nulls -> bucket 0) and the z expression must not crash
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 == 0, F.col("id")).otherwise(F.lit(7)).alias("x"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(F.col("id")).alias("y"),
    )
    out = df.withColumn("z", eio._zorder_value(df, ["x", "y"])).agg(
        F.count(F.lit(1)).alias("n"), F.min("z").alias("zmin")
    ).collect()[0]
    assert out.n == 10_000 and out.zmin >= 0


def test_zorder_all_null_column(spark):
    """Round-13 ADVICE: approxQuantile of an all-NULL column returns an
    EMPTY boundary list — a zero-arg F.array() would be NullType and
    fail the filter lambda's analysis. The dimension must degrade to a
    constant bucket 0 (its bits contribute nothing; the other columns
    still cluster) and the z expression must stay well-defined."""
    df = spark.range(5_000).select(
        (F.col("id") % 100).alias("x"),
        F.lit(None).cast("double").alias("dead"),
    )
    out = df.withColumn("z", eio._zorder_value(df, ["x", "dead"])).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("z").alias("zmin"),
        F.countDistinct("z").alias("cells"),
    ).collect()[0]
    assert out.n == 5_000 and out.zmin >= 0
    assert out.cells > 1  # the live dimension still buckets


def test_zorder_null_vs_negative_infinity(spark):
    """NULL bucketing no longer routes through a -inf sentinel: NULLs
    land in bucket 0 by three-valued logic (boundary < NULL is NULL →
    filtered out → size 0), and a genuine -inf value lands in bucket 0
    because nothing compares below it — each on its own terms, no
    sentinel collision in the expression."""
    df = spark.range(1_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .when(F.col("id") % 7 == 0, F.lit(float("-inf")))
        .otherwise(F.col("id").cast("double"))
        .alias("x"),
        (F.col("id") % 3).alias("y"),
    )
    out = df.withColumn("z", eio._zorder_value(df, ["x", "y"])).agg(
        F.count(F.lit(1)).alias("n"), F.min("z").alias("zmin")
    ).collect()[0]
    assert out.n == 1_000 and out.zmin >= 0


def test_zorder_temporal_columns(spark):
    """DATE has no direct DOUBLE cast in Spark (the docstring promises
    date/timestamp support, so this was a real gap): date goes through
    unix_date, timestamp_ntz through a timestamp cast — both monotone,
    which is all quantile bucketing needs."""
    df = spark.range(200).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        (F.col("id") % 7).alias("x"),
    )
    for pair in (["d", "x"], ["ts", "x"], ["d", "ts"]):
        out = df.withColumn("z", eio._zorder_value(df, pair)).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("z").alias("cells"),
        ).collect()[0]
        assert out.n == 200 and out.cells > 1, pair


def test_zorder_rejects_unsupported_columns(spark):
    df = spark.range(10).select(
        F.col("id").alias("x"), F.lit("s").alias("name")
    )
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        eio._zorder_value(df, ["name"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        eio._zorder_value(df, ["missing"])
    with pytest.raises(ValueError, match="60-bit"):
        eio._zorder_value(df, ["x"], bits=61)


def test_zorder_constant_column_still_fans_out(spark, tmp_path):
    # a constant cluster column collapses every z-value to one cell;
    # the xxhash64 tie-break must still spread rows across writers
    df = spark.range(200_000).select(
        F.lit(5).cast("long").alias("x"), (F.col("id") % 997).alias("y")
    )
    t = str(tmp_path / "const")
    eio.append_versioned(df.repartition(4), t, "b0")
    v = eio.optimize_versioned(spark, t, target_mb=1, cluster_by=["x", "y"])
    job_dir = os.path.join(t, f"__job_id=optimize.o{v}")
    files = [f for f in os.listdir(job_dir) if f.endswith(".parquet")]
    assert eio.read_version(spark, t, v).count() == 200_000
    assert len(files) >= 1  # completes; no single giant straggler task


def test_zonemap_prunes_hard_after_zorder_optimize(spark, tmp_path):
    """The payoff the whole feature exists for: a zone map built over a
    z-ordered table prunes point lookups on BOTH clustered columns to
    a small fraction of the files, while the same zone map over a
    plain-compacted table prunes (almost) nothing — stats on
    round-robin files span the whole domain."""
    from nyc_tlc_trip_data_pipelines_spark.operators.layout import (
        write_zonemap,
        zonemap_lookup,
    )

    df = _mk(spark)  # 1M rows -> ~7 files at target_mb=1
    results = {}
    for mode in ("plain", "zorder"):
        t = str(tmp_path / f"t_{mode}")
        eio.append_versioned(df.repartition(8), t, "b0")
        v = eio.optimize_versioned(
            spark, t, target_mb=1,
            cluster_by=["x", "y"] if mode == "zorder" else None,
        )
        job_dir = os.path.join(t, f"__job_id=optimize.o{v}")
        idx = str(tmp_path / f"zm_{mode}")
        n_files = write_zonemap(spark, job_dir, ["x", "y"], idx)
        assert n_files >= 4
        fracs = []
        for col, val in (("x", 500), ("y", 500), ("x", 7), ("y", 991)):
            out, scanned, total = zonemap_lookup(spark, job_dir, idx, col, val)
            assert out.count() == df.filter(F.col(col) == val).count()
            fracs.append(scanned / total)
        results[mode] = sum(fracs) / len(fracs)
    # plain layout: every file spans the domain -> ~no pruning
    assert results["plain"] > 0.9
    # z-ordered layout: point lookups on EITHER dimension hit a minority
    # of files (64 z-buckets per dim across >=4 files)
    assert results["zorder"] < 0.7, results


def test_zorder_buckets_monotone_per_dimension(spark):
    """Property behind the pruning claim: holding the other dimension
    fixed, a column's quantile bucket (extracted from the z-value by
    de-interleaving) is NON-DECREASING in the column's value — so a
    range predicate on any single dimension maps to a contiguous
    bucket range, which is what makes min/max file stats prunable."""
    n, bits = 5_000, 6
    df = spark.range(n).select(
        F.col("id").alias("x"),
        (F.col("id") % 50).alias("y"),
    )
    z = eio._zorder_value(df, ["x", "y"], bits=bits)
    # de-interleave x's bits (positions 0, 2, 4, ... for column 0 of 2)
    xb = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.shiftright(z, 2 * i).bitwiseAND(F.lit(1))
        xb = xb.bitwiseOR(F.shiftleft(bit, i))
    rows = (
        df.withColumn("xb", xb)
        .groupBy("xb")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("xb")
        .collect()
    )
    assert len(rows) > 16  # quantile buckets actually spread
    for prev, cur in zip(rows, rows[1:]):
        assert cur.xb == prev.xb + 1  # no bucket gaps on uniform data
        assert cur.lo > prev.hi  # buckets are disjoint, ordered ranges
