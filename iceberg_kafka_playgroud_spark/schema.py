"""Canonical schemas + fixture-table loaders.

``PURCHASE_EVENT`` is the reference's one canonical Avro record
(``kafka_publisher.py:28-84``, name ``com.example.PurchaseEvent``)
re-expressed as a Spark ``StructType``: primitives + STRUCT + MAP +
ARRAY, all nullable (the S3 sink enables null handling,
``s3-connector-config.json:36``).

The fixture tables are the driver-generated TPC-H-ish star schema at
``/root/testdata/sf*/``; loaders here are the single place the rest of
the engine goes through, so path handling / registration stays uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- canonical PurchaseEvent schema (SURVEY §1.1) -------------------------

USER_DETAILS = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("email", T.StringType()),
    ]
)

PURCHASE_EVENT = T.StructType(
    [
        # Unix epoch milliseconds (kafka_publisher.py:304)
        T.StructField("timestamp", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("user_details", USER_DETAILS),
        T.StructField("purchase_metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("previous_purchases", T.ArrayType(T.DoubleType())),
    ]
)

# Avro schema string for the same record — used by the Kafka source/sink
# round-trip (from_avro/to_avro). Field-for-field the reference's
# MESSAGE_SCHEMA (kafka_publisher.py:28-84).
PURCHASE_EVENT_AVRO = """
{
  "type": "record", "name": "PurchaseEvent", "namespace": "com.example",
  "fields": [
    {"name": "timestamp", "type": "long"},
    {"name": "user_id", "type": "string"},
    {"name": "action", "type": "string"},
    {"name": "amount", "type": "double"},
    {"name": "user_details", "type": {"type": "record", "name": "UserDetails",
      "fields": [
        {"name": "name", "type": "string"},
        {"name": "age", "type": "int"},
        {"name": "email", "type": "string"}]}},
    {"name": "purchase_metadata", "type": {"type": "map", "values": "string"}},
    {"name": "previous_purchases", "type": {"type": "array", "items": "double"}}
  ]
}
"""

# --- fixture tables (TESTDATA.md) -----------------------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one fixture table (SURVEY §2.1 S2).

    Plain ``spark.read.parquet`` so Catalyst gets full predicate
    pushdown / column pruning / partition discovery on whatever the
    caller layers on top.
    """
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {FIXTURE_TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects by default. Set at runtime (not only in our session
        # factory) so the engine also works under a caller-owned
        # SparkSession, e.g. the correctness driver's.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # parquet TIMESTAMP(NANOS) surfaced as long via
        # spark.sql.legacy.parquet.nanosAsLong; truncate ns → µs exactly
        # like DuckDB's TIMESTAMP_NS → datetime conversion does.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=FIXTURE_TABLES) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
