"""Property-based tests (hypothesis) for scalar helpers and operator
equivalences (SURVEY.md §5.2 item 4)."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_tlc_trip_data_pipelines_spark.io import prune_files_by_month
from nyc_tlc_trip_data_pipelines_spark.pipeline import month_bounds


@given(st.integers(2000, 2099), st.integers(1, 12), st.integers(0, 72))
def test_month_bounds_properties(year, month, tol):
    lo, hi = month_bounds(year, month, tolerance_hours=tol)
    lo_dt = datetime.strptime(lo, "%Y-%m-%d %H:%M:%S")
    hi_dt = datetime.strptime(hi, "%Y-%m-%d %H:%M:%S")
    month_start = datetime(year, month, 1)
    # lower bound is exactly tolerance before month start
    assert month_start - lo_dt == timedelta(hours=tol)
    # upper bound is the first instant of the next month
    assert hi_dt.day == 1 and hi_dt.hour == 0 and hi_dt.minute == 0
    assert (hi_dt.year, hi_dt.month) == (year + 1, 1) if month == 12 else (hi_dt.year, hi_dt.month) == (year, month + 1)
    assert lo_dt < hi_dt


@given(
    st.lists(st.tuples(st.integers(2020, 2030), st.integers(1, 12)), max_size=30),
    st.integers(2020, 2030),
    st.integers(1, 12),
    st.integers(2020, 2030),
    st.integers(1, 12),
)
@settings(max_examples=50)
def test_prune_files_by_month_window(months, y1, m1, y2, m2):
    files = [f"/data/yellow_tripdata_{y}-{m:02d}.parquet" for y, m in months]
    start, end = f"{y1}-{m1:02d}", f"{y2}-{m2:02d}"
    kept = prune_files_by_month(files, start, end)
    for f in files:
        ym = f.split("_")[-1].removesuffix(".parquet")
        assert (f in kept) == (start <= ym <= end)


@given(st.lists(st.text(alphabet="ab c\t\nx", max_size=12), max_size=8))
@settings(max_examples=20, deadline=None)
def test_tokenize_matches_python_split(spark, texts):
    from nyc_tlc_trip_data_pipelines_spark.operators.text import tokenize

    df = spark.createDataFrame([(t,) for t in texts] or [("",)], "text string")
    got = [r.t for r in df.select(tokenize("text").alias("t")).collect()]
    expect = [t.lower().split() for t in (texts or [""])]
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
