"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``iceberg_kafka_playgroud_spark`` (SURVEY.md §2
inventory); this module only aggregates the per-module registries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from iceberg_kafka_playgroud_spark.operators import (  # noqa: E402
    advanced,
    dedup,
    multimodal,
    relational,
    scalar_funcs,
    similarity,
    text,
)
from iceberg_kafka_playgroud_spark import catalog  # noqa: E402
from iceberg_kafka_playgroud_spark.sources import kafka_avro  # noqa: E402
from iceberg_kafka_playgroud_spark.streaming import ingest  # noqa: E402

_MODULES = [
    relational,
    scalar_funcs,
    text,
    dedup,
    similarity,
    multimodal,
    advanced,
    ingest,
    kafka_avro,
    catalog,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped
    snowflake join + aggregation (SURVEY §7 phase 1)."""
    return relational.q5_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
