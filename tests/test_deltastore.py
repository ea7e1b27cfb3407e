"""deltastore: the guard runs everywhere; the Delta branches run only
where delta-spark is installed (skipif) — the self-closing-gap pattern
from objectstore's boto3 backend."""

import pytest

from nyc_tlc_trip_data_pipelines_spark import deltastore as DS

HAS_DELTA = DS.delta_available()


def test_guard_fails_loudly_without_delta(spark):
    if HAS_DELTA:
        pytest.skip("delta-spark installed; guard branch unreachable")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        DS.delta_read_version(spark, "/tmp/nowhere")
    with pytest.raises(NotImplementedError, match="versioned-manifest"):
        DS.delta_vacuum(spark, "/tmp/nowhere")


def test_builder_confs_are_pure_data():
    confs = DS.delta_builder_confs()
    assert confs["spark.sql.extensions"].startswith("io.delta")
    assert "DeltaCatalog" in confs["spark.sql.catalog.spark_catalog"]


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed")
def test_delta_append_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "dtab")
    df = spark.range(5).withColumnRenamed("id", "k")
    v0 = DS.delta_append_versioned(df, path, job_id="job-a")
    # idempotent retry: same txnAppId -> no new rows, same version
    v1 = DS.delta_append_versioned(df, path, job_id="job-a")
    assert v1 == v0
    assert DS.delta_read_version(spark, path).count() == 5
    DS.delta_append_versioned(df, path, job_id="job-b")
    assert DS.delta_read_version(spark, path).count() == 10
    assert DS.delta_read_version(spark, path, version=v0).count() == 5
