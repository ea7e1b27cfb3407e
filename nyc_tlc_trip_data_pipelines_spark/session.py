"""SparkSession factory.

Reference parity notes (citations into /root/reference):

- The reference builds its session with only S3A/Delta packaging configs and
  no master (``pasta1_etl/src/main.py:273-296``) → defaults to ``local[*]``.
- It relies on Spark 3.5 cast-to-NULL coercion at ingest
  (``pasta1_etl/src/main.py:170-172``). PySpark 4.x defaults
  ``spark.sql.ansi.enabled=true`` which would instead raise on bad casts, so
  we pin it ``false`` to reproduce reference semantics.
- It assumes GMT timestamps (``README.md:10``) → session timezone UTC, which
  also keeps parity with the tz-naive DuckDB correctness oracle.

Scale notes: AQE on (runtime coalescing, skew-join splitting), shuffle
partitions sized for the local harness via env; on a real cluster these are
overridden by submit-time conf — everything here is safe to override.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "nyc_tlc_trip_data_pipelines_spark") -> SparkSession:
    """Return a configured SparkSession (creates one if absent).

    If a session already exists (e.g. the driver harness passes one in),
    ``getOrCreate`` returns it; session-level SQL confs that matter for
    correctness are then (re)applied so semantics hold either way.
    """
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    configure_session(spark)
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the session-level confs required for correctness parity.

    Safe on an externally-created session: only touches runtime-mutable
    SQL confs (cast semantics, timezone, AQE) — never JVM-startup confs.
    """
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Parquet TIMESTAMP(NANOS) (e.g. events.ts, written by pandas/arrow as
    # ns) is unsupported by Spark's reader; read as raw long nanos and let
    # the catalog convert (catalog.NANOS_TS_COLS shim).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.sparkContext.setLogLevel("WARN")
    return spark
