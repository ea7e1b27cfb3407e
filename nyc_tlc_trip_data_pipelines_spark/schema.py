"""Declared-schema registry (reference R4/R13 schema system).

The reference declares a fixed 19-column schema dict and casts every
column on ingest — schema-on-write with NULL-coercion
(``pasta1_etl/src/main.py:69-106,170-172``). This module generalizes that
to a registry of :class:`TableSchema` specs with a single-Project cast.

Non-ANSI cast semantics (bad values → NULL, matching Spark 3.5 defaults
the reference ran under) are pinned by the session factory
(``session.py``: ``spark.sql.ansi.enabled=false``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP: Mapping[str, T.DataType] = {
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


@dataclass(frozen=True)
class TableSchema:
    """Declared table spec: column → type name, plus partitioning.

    Mirrors the reference's ``YELLOW_TRIP_SCHEMA`` dict shape
    (``pasta1_etl/src/main.py:69-106``): ``{"columns": {...},
    "partitioning": [...]}``.
    """

    name: str
    columns: Mapping[str, str]  # column name -> spark type name
    partitioning: Sequence[str] = field(default_factory=tuple)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c, _TYPE_MAP.get(t, T.StringType()), True) for c, t in self.columns.items()]
        )

    def apply_cast(self, df: DataFrame) -> DataFrame:
        """Cast-on-ingest (R4, ``main.py:170-172``) as ONE Project node:
        every declared column cast to its declared type; extra input
        columns are dropped (declared schema is authoritative)."""
        return df.select(*[F.col(c).cast(t).alias(c) for c, t in self.columns.items()])


# The reference's bronze/gold pair (``pasta1_etl/src/main.py:69-106``),
# kept as the canonical example schema for the medallion pipeline tests.
YELLOW_TRIP_BRONZE = TableSchema(
    name="yellow_tripdata_bronze",
    columns={
        "VendorID": "byte",
        "tpep_pickup_datetime": "timestamp",
        "tpep_dropoff_datetime": "timestamp",
        "Passenger_count": "int",
        "Trip_distance": "double",
        "PULocationID": "long",
        "DOLocationID": "long",
        "RateCodeID": "double",
        "Store_and_fwd_flag": "string",
        "Payment_type": "byte",
        "Fare_amount": "double",
        "Extra": "double",
        "MTA_tax": "double",
        "Improvement_surcharge": "double",
        "Tip_amount": "double",
        "Tolls_amount": "double",
        "Total_amount": "double",
        "congestion_Surcharge": "double",
        "Airport_fee": "double",
    },
    partitioning=(),
)

YELLOW_TRIP_GOLD = TableSchema(
    name="yellow_tripdata_gold",
    columns={
        "tpep_pickup_datetime": "timestamp",
        "tpep_dropoff_datetime": "timestamp",
        "Passenger_count": "int",
        "Trip_distance": "double",
        "Total_amount": "double",
        "pickup_year": "int",
        "pickup_month": "int",
    },
    partitioning=("pickup_year", "pickup_month"),
)
