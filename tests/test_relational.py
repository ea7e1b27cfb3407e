"""Unit tests for filters/projections/casts (reference R4-R6, R9, R10).

Covers the reference edge cases from SURVEY.md §5.2: December month
rollover, tolerance crossing a month boundary, NULL-producing casts.
"""

from datetime import datetime

from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.operators.relational import (
    cast_to_schema,
    derive_year_month,
    drop_columns,
    filter_time_range,
)
from nyc_tlc_trip_data_pipelines_spark.operators.scalars import (
    first_day_of_next_month,
    ts_minus_hours,
)
from nyc_tlc_trip_data_pipelines_spark.pipeline import month_bounds


def test_half_open_time_filter(spark):
    df = spark.createDataFrame(
        [(datetime(2023, 1, 31, 23, 0),), (datetime(2023, 2, 1, 0, 0),), (datetime(2023, 2, 15, 12, 0),), (datetime(2023, 3, 1, 0, 0),)],
        "ts timestamp",
    )
    out = filter_time_range(df, "ts", "2023-02-01 00:00:00", "2023-03-01 00:00:00").collect()
    assert [r.ts for r in out] == [datetime(2023, 2, 1), datetime(2023, 2, 15, 12)]


def test_month_bounds_december_rollover():
    lo, hi = month_bounds(2023, 12, tolerance_hours=1)
    assert lo == "2023-11-30 23:00:00"
    assert hi == "2024-01-01 00:00:00"


def test_month_bounds_tolerance_crosses_month():
    lo, hi = month_bounds(2023, 3, tolerance_hours=2)
    assert lo == "2023-02-28 22:00:00"
    assert hi == "2023-04-01 00:00:00"


def test_first_day_of_next_month_rollover(spark):
    df = spark.createDataFrame([(datetime(2023, 12, 15, 10, 30),)], "ts timestamp")
    out = df.select(first_day_of_next_month("ts").alias("nxt")).collect()[0].nxt
    assert out == datetime(2024, 1, 1)


def test_ts_minus_hours_crosses_month(spark):
    df = spark.createDataFrame([(datetime(2023, 3, 1, 0, 30),)], "ts timestamp")
    out = df.select(ts_minus_hours("ts", 1).alias("t")).collect()[0].t
    assert out == datetime(2023, 2, 28, 23, 30)


def test_cast_coercion_bad_values_become_null(spark):
    # reference R4 semantics: non-ANSI cast → NULL, never an error
    df = spark.createDataFrame([("abc", "1.5"), ("42", "xyz")], "a string, b string")
    out = cast_to_schema(df, {"a": "int", "b": "double"}).collect()
    assert [(r.a, r.b) for r in out] == [(None, 1.5), (42, None)]


def test_cast_passthrough_vs_declared_schema(spark):
    from nyc_tlc_trip_data_pipelines_spark.schema import TableSchema

    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    # operator-level cast: undeclared columns pass through unchanged
    out = cast_to_schema(df, {"a": "long"})
    assert out.columns == ["a", "b", "c"]
    assert dict(out.dtypes)["a"] == "bigint"
    # declared-schema ingest (reference R4): schema is authoritative,
    # extra input columns are dropped
    ts = TableSchema(name="t", columns={"a": "long"})
    assert ts.apply_cast(df).columns == ["a"]


def test_drop_and_derive(spark):
    df = spark.createDataFrame([(1, 2, datetime(2023, 5, 4))], "a int, b int, ts timestamp")
    out = derive_year_month(drop_columns(df, ["b"]), "ts")
    row = out.collect()[0]
    assert (row.pickup_year, row.pickup_month) == (2023, 5)
    assert "b" not in out.columns


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.catalog import load_table
    from nyc_tlc_trip_data_pipelines_spark.plans import has_pushed_filters

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert has_pushed_filters(li)


def test_xml_roundtrip_escaping(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a&b<c>d")], "id long, s string")
    esc = F.replace(
        F.replace(
            F.replace(F.col("s"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    xml = df.select(F.format_string("<r><id>%d</id><s>%s</s></r>", "id", esc).alias("x"))
    got = xml.select(F.from_xml("x", "id BIGINT, s STRING").alias("r")).select("r.*").collect()
    assert got[0].id == 1 and got[0].s == "a&b<c>d"
