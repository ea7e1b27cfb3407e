"""Data-quality validation, entity blocking, Z-order, and PII tests."""

from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP
from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ
from nyc_tlc_trip_data_pipelines_spark.operators import entity as EN
from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO
from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS


def test_dq_validate_mixed_verdicts(spark):
    df = spark.createDataFrame(
        [(1, 1, "A", 5.0), (1, 1, "A", 6.0), (2, 1, "N", 7.0), (3, None, "X", -1.0)],
        "k bigint, sub int, flag string, qty double",
    )
    report = {
        r.constraint: r
        for r in DQ.validate(
            df,
            [
                DQ.not_null("k"),
                DQ.not_null("sub"),
                DQ.unique("k", "sub"),
                DQ.min_value("qty", 0.0),
                DQ.accepted_values("flag", "A", "N"),
            ],
        ).collect()
    }
    assert report["not_null(k)"].passed and report["not_null(k)"].metric == 1.0
    assert not report["not_null(sub)"].passed and abs(report["not_null(sub)"].metric - 0.75) < 1e-9
    assert not report["unique(k,sub)"].passed and report["unique(k,sub)"].metric == 1.0
    assert not report["min_value(qty)>=0.0"].passed and report["min_value(qty)>=0.0"].metric == -1.0
    assert not report["accepted_values(flag) in {A,N}"].passed


def test_time_weighted_avg_exact(spark):
    # value 10 for 3s, value 20 for 1s -> twa = (30+20)/4 = 12.5
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 10.0),
            (2, "2024-01-01 00:00:03", 1, 20.0),
            (3, "2024-01-01 00:00:04", 1, 99.0),  # last: no interval
        ],
        "event_id bigint, ts string, user_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = TS.time_weighted_avg(df).collect()[0]
    assert r.n_intervals == 2 and r.total_seconds == 4.0 and r.twa == 12.5


def test_ohlc_struct_minmax(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, 5.0),
            (2, "2024-01-01 10:01:00", 1, 3.0),  # earliest -> open
            (3, "2024-01-01 10:59:00", 1, 4.0),  # latest -> close
            (4, "2024-01-01 10:30:00", 1, 9.0),  # high
        ],
        "event_id bigint, ts string, user_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = TS.ohlc(df).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n_events) == (3.0, 9.0, 3.0, 4.0, 4)


def test_blocked_fuzzy_matches(spark):
    clean = spark.createDataFrame(
        [(1, "Widget-0001"), (2, "Widget-0002")], "id bigint, name string"
    )
    dirty = spark.createDataFrame([(10, "Widgett-0001")], "id bigint, name string")
    rows = EN.blocked_fuzzy_matches(
        dirty, clean, "name", F.expr("right(name, 4)"), max_edit_distance=1, id_col="id"
    ).collect()
    assert len(rows) == 1
    assert rows[0].clean_id == 1 and rows[0].edit_distance == 1


def test_zorder_key_interleaves(spark):
    df = spark.createDataFrame([(3, 5)], "x int, y int")
    # x=0b011, y=0b101 -> z = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111 = 39
    z = df.select(LO.zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).collect()[0].z
    assert z == 39
    # locality: close (x,y) points share high z bits
    df2 = spark.createDataFrame([(10, 10), (11, 10), (200, 200)], "x int, y int")
    zs = [r.z for r in df2.select(LO.zorder_key(F.col("x"), F.col("y")).alias("z")).collect()]
    assert abs(zs[0] - zs[1]) < abs(zs[0] - zs[2])


def test_zorder_sql_matches_column_expr(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, "id int, zx int, zy int")
    got = df.select("id", LO.zorder_key(F.col("zx"), F.col("zy"), 8).alias("z"))
    via_sql = df.selectExpr("id", f"({LO.zorder_sql('zx', 'zy', 8)}) as z")
    assert got.exceptAll(via_sql).count() == 0 and via_sql.exceptAll(got).count() == 0


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [("mail bob.smith+x@corp.example.org now call 5551234567 ok 123",)],
        "text string",
    )
    out = df.select(CP.redact_pii("text").alias("r")).collect()[0].r
    assert out == "mail <EMAIL> now call <PHONE> ok 123"


def test_pagerank_star_graph(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import graph as GR

    # star: a<->b, a<->c, a<->d — hub a must outrank the leaves, and
    # leaves tie by symmetry; total mass stays <= 1 (undirected, no dangling)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "d"), ("d", "a")],
        "src string, dst string",
    )
    pr = {r.node: r.pr for r in GR.pagerank(edges, iterations=10).collect()}
    assert pr["a"] > pr["b"]
    assert abs(pr["b"] - pr["c"]) < 1e-12 and abs(pr["c"] - pr["d"]) < 1e-12
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_cohort_retention_daily(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-03 10:00:00"),
            (2, "2024-01-01 23:00:00"),
            (3, "2024-01-02 01:00:00"),
        ],
        "user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (str(r.cohort_bucket), r.bucket_offset): r.n_users
        for r in TS.cohort_retention(df, grain="day").collect()
    }
    assert got[("2024-01-01 00:00:00", 0)] == 2  # users 1 and 2 on day 0
    assert got[("2024-01-01 00:00:00", 2)] == 1  # user 1 returns day 2
    assert got[("2024-01-02 00:00:00", 0)] == 1  # user 3's own cohort


def test_mad_anomalies_flags_outlier(spark):
    vals = [(1, float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 1000]]
    df = spark.createDataFrame(vals, "user_id bigint, value double")
    r = TS.mad_anomalies(df).collect()[0]
    assert r.n_events == 8 and r.n_anomalies == 1
    assert r.median_value == 10.5


def test_cdc_apply_last_op_wins(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import sorts as O

    ops = spark.createDataFrame(
        [
            (1, 100.0, "I", 1),
            (1, 150.0, "U", 2),   # latest for key 1 -> survives with 150
            (2, 200.0, "I", 1),
            (2, 0.0, "D", 2),     # deleted
            (3, 300.0, "I", 1),   # untouched
        ],
        "k bigint, bal double, op string, seq int",
    )
    got = {r.k: r.bal for r in O.cdc_apply(ops, ["k"], "seq").collect()}
    assert got == {1: 150.0, 3: 300.0}


def test_streaming_ohlc_matches_batch_shape(spark):
    from nyc_tlc_trip_data_pipelines_spark import streaming as ST

    # window aggregation is the same expression in batch mode — verify
    # the bar selection semantics without spinning up a stream
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 01:00:00", 7, 5.0),
            (2, "2024-01-01 09:00:00", 7, 9.0),
            (3, "2024-01-02 03:00:00", 7, 2.0),
        ],
        "event_id bigint, ts string, user_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {str(r.window_start): r for r in ST.ohlc_window_agg(df).collect()}
    d1 = rows["2024-01-01 00:00:00"]
    assert (d1.open, d1.close, d1.high, d1.low, d1.n_events) == (5.0, 9.0, 9.0, 5.0, 2)
    assert rows["2024-01-02 00:00:00"].open == 2.0


def test_profile_stats_exact(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "k int, s string"
    )
    rows = {r.column: r for r in DQ.profile(df, exact_ndv=True).collect()}
    assert set(rows) == {"k", "s"}
    k, s = rows["k"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct, k.min_s, k.max_s) == (4, 1, 2, "1", "2")
    assert (s.n_rows, s.n_nulls, s.n_distinct, s.min_s, s.max_s) == (4, 1, 2, "a", "b")


def test_profile_approx_ndv_single_aggregate(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.catalog import load_table
    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ
    from nyc_tlc_trip_data_pipelines_spark.plans import node_count

    li = load_table(spark, sf_dir, "lineitem")
    out = DQ.profile(li, cols=["l_orderkey", "l_returnflag"])  # approx ndv default
    # approx path must not Expand the scan (the exact path does, x|cols|)
    assert node_count(out, "Expand") == 0
    rows = {r.column: r for r in out.collect()}
    assert rows["l_returnflag"].n_distinct >= 2


def test_zonemap_prunes_files_and_matches_full_scan(spark, tmp_path):
    """Zone-map lookup must equal the full-scan filter and read strictly
    fewer files on a range-clustered layout; a value outside every
    file's interval scans zero files."""
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    table = str(tmp_path / "clustered")
    df.repartitionByRange(8, "k").write.parquet(table)
    idx = str(tmp_path / "zm")
    n_files = LO.write_zonemap(spark, table, ["k"], idx)
    assert n_files >= 8

    hit, n_scanned, n_total = LO.zonemap_lookup(spark, table, idx, "k", 1234)
    assert n_total == n_files and 0 < n_scanned < n_total
    got = [(r.k, r.v) for r in hit.collect()]
    expect = [
        (r.k, r.v) for r in spark.read.parquet(table).filter(F.col("k") == 1234).collect()
    ]
    assert got == expect == [(1234, 2468)]

    miss, n_scanned_miss, _ = LO.zonemap_lookup(spark, table, idx, "k", 999999)
    assert n_scanned_miss == 0 and miss.count() == 0


def test_write_with_metrics_observes_during_write(spark, tmp_path):
    """Observation metrics must equal a direct aggregate, and arrive
    from the write action itself (no second scan needed)."""
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQM

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k long, v double"
    )
    path = str(tmp_path / "out")
    m = DQM.write_with_metrics(
        df,
        path,
        {
            "n": F.count(F.lit(1)),
            "nulls": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
            "total": F.sum("v"),
        },
    )
    assert (m["n"], m["nulls"], m["total"]) == (3, 1, 40.0)
    back = spark.read.parquet(path)
    assert back.count() == 3 and set(back.columns) == {"k", "v"}


def test_geohash_encode_canonical_vectors(spark):
    """geohash_encode must reproduce canonical geohashes (longitude-
    first MSB interleave, base32) and behave at the domain edges."""
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO

    df = spark.createDataFrame(
        [
            (57.64911, 10.40744, "u4pruydqq"),   # the classic test vector
            (40.758, -73.9855, "dr5ru7v2s"),     # Times Square
            (-33.8568, 151.2153, "r3gx2ux9g"),   # Sydney
            (0.0, 0.0, "s00000000"),
            (90.0, 180.0, "zzzzzzzzz"),          # clamped upper edge
            (-90.0, -180.0, "000000000"),
        ],
        "lat double, lon double, expect string",
    )
    rows = df.select(
        "expect", LO.geohash_encode(F.col("lat"), F.col("lon"), 9).alias("g")
    ).collect()
    for r in rows:
        assert r.g == r.expect, (r.expect, r.g)
    # prefix property: lower precision is a strict prefix
    short = df.select(
        "expect", LO.geohash_encode(F.col("lat"), F.col("lon"), 4).alias("g")
    ).collect()
    for r in short:
        assert r.expect.startswith(r.g)


def test_psi_drift_terms_and_one_sided_buckets(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ

    base = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "k string")
    curr = spark.createDataFrame([("a",)] * 80 + [("b",)] * 10 + [("c",)] * 10, "k string")
    got = {r.k: r for r in DQ.psi_drift(base, curr, "k", alias="k").collect()}
    import math
    expect_a = round((0.8 - 0.5) * math.log(0.8 / 0.5), 6)
    assert got["a"].psi_term == expect_a
    assert got["c"].psi_term is None          # one-sided bucket surfaces as NULL
    assert got["c"].n_base == 0 and got["c"].n_curr == 10
    assert abs(sum(r.p_curr for r in got.values()) - 1.0) < 1e-9


def test_jackknife_loo_means(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg
    from pyspark.sql import functions as F

    # groups: a = {100, 300} (cents), b = {500}; loo(a)=5.0, loo(b)=2.0
    df = spark.createDataFrame([("a", 100), ("a", 300), ("b", 500)], "g string, y long")
    got = {r.g: r.loo_mean for r in
           agg.jackknife_group_means(df, "g", F.col("y"), y_scale=100).collect()}
    assert got == {"a": 5.0, "b": 2.0}


def test_grid_radius_pairs_matches_brute_force(spark):
    import itertools
    import math
    import random

    from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 20) / 2.0, rng.randint(0, 20) / 2.0) for i in range(60)]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    r = 1.25
    got = {(a.id_a, a.id_b) for a in LO.grid_radius_pairs(df, "pid", "x", "y", r).collect()}
    brute = {
        (i, j)
        for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2)
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r
    }
    assert got == brute


def test_grid_radius_pairs_no_nested_loop(spark):
    from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO
    from nyc_tlc_trip_data_pipelines_spark.plans import plan_string

    df = spark.range(100).selectExpr("id AS pid", "CAST(id % 10 AS DOUBLE) AS x",
                                     "CAST(id % 7 AS DOUBLE) AS y")
    out = LO.grid_radius_pairs(df, "pid", "x", "y", 1.0)
    s = plan_string(out)
    assert "BroadcastNestedLoop" not in s and "CartesianProduct" not in s
