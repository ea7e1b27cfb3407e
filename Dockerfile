# Single-service Spark container for the engine — the packaging analog
# of the reference's Dockerfile (python-slim + OpenJDK 17 + Spark
# download + app copy; reference `Dockerfile:1-35`), rebuilt for this
# repo: PySpark 4.x wheels bundle their own Spark distribution, so the
# tarball download and SPARK_HOME wiring are unnecessary — pip is the
# whole install.
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && apt-get clean && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir \
    "pyspark>=4.1,<5" pyarrow pandas numpy

WORKDIR /app
COPY nyc_tlc_trip_data_pipelines_spark/ /app/nyc_tlc_trip_data_pipelines_spark/
COPY __spark_entry__.py bench.py /app/
ENV PYTHONPATH=/app

# Same knobs the engine reads locally; override at `docker run`/compose.
ENV SPARK_GRAFT_CPUS=8 \
    SPARK_GRAFT_DRIVER_MEM=8g \
    SPARK_GRAFT_SF_DIR=/data/sf0.1

# Default command mirrors the reference's ETL entry (its CMD runs the
# bronze ETL main; ours runs a scan-agg smoke against the mounted data
# dir). Swap for `bench.py` or `spark-submit` on a cluster.
CMD ["python", "-c", "import os; from nyc_tlc_trip_data_pipelines_spark.session import get_spark; import __spark_entry__ as E; E.queries()['q_agg_basic'](get_spark(), os.environ['SPARK_GRAFT_SF_DIR']).show()"]
