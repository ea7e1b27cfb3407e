"""PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the capabilities of the reference
pipeline ``Rubens-Funabashi/nyc_tlc_trip_data_pipelines`` (a two-stage
PySpark + Delta medallion ETL over NYC TLC yellow-taxi data), generalized
into reusable operators and extended with large-scale training-data
pipeline operations (dedup, similarity search, multimodal columns, text
analysis).

Design rules (see SURVEY.md §7):

- Every operator is a plain function ``DataFrame -> DataFrame`` (or a thin
  builder) composable exactly like the reference chains them.
- Declarative DataFrame/SQL only — Catalyst owns physical strategy.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas_udf / applyInPandas / mapInPandas).
- Designed for 100 TB: broadcast small dims, partial aggregation, pushed
  filters, pruned columns, AQE-friendly plans; verified via
  ``plans.explain`` helpers.
"""

from nyc_tlc_trip_data_pipelines_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
