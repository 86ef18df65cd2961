"""Fixture-boundary contract: the events table's ``ts`` must surface
as TimestampType with sane (year >= 2020) values at BOTH the batch and
stream entry points, whatever parquet layout the fixture ships with.

The fixture has silently changed layout between driver rounds
(TIMESTAMP(NANOS) -> TIMESTAMP_NTZ micros); the nanos-era code read the
new layout as microseconds-as-nanos and collapsed a month of events
into January 1970 without any error. These tests make the next layout
shift fail loudly in ``tests/`` instead of via stale driver greens.
"""

import datetime

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_kafka_playgroud_spark.schema import (
    load_table,
    normalize_event_ts,
    table_row_count,
)
from iceberg_kafka_playgroud_spark.streaming.ingest import events_file_stream


def test_raw_fixture_layout_is_a_known_shape(sf_dir):
    """The loader understands exactly two physical layouts; anything
    else must be added to normalize_event_ts deliberately."""
    t = pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow.field("ts").type
    assert str(t) in ("timestamp[ns]", "timestamp[us]", "int64"), (
        f"events.ts fixture layout changed to {t}; teach "
        "schema.normalize_event_ts about it"
    )


def test_batch_ts_is_timestamp_in_fixture_era(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert isinstance(e.schema["ts"].dataType, T.TimestampType)
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2020, f"batch ts collapsed to {lo} (1970 regression)"
    assert hi - lo >= datetime.timedelta(days=1), "events span < 1 day"


def test_stream_ts_matches_batch_exactly(spark, sf_dir):
    """The stream entry point must agree with the batch one row-for-row
    (same normalization on both sides of the batch/stream boundary)."""
    stream = events_file_stream(spark, sf_dir)
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    name = "fixture_contract_sink"
    q = (
        stream.select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(name)
    batch = load_table(spark, sf_dir, "events").select("event_id", "ts")
    assert streamed.count() == table_row_count(sf_dir, "events")
    assert batch.exceptAll(streamed).isEmpty()
    assert streamed.exceptAll(batch).isEmpty()


# column-name contract per fixture table — the early alarm for the
# next silent fixture change (the ts-layout shift arrived unannounced;
# a renamed/dropped column would strand dozens of oracle pairs the
# same way). Types are left to the per-table loaders: only events has
# layout normalization, everything else passes through.
EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


@pytest.mark.parametrize("name", sorted(EXPECTED_COLUMNS))
def test_fixture_table_columns_stable(spark, sf_dir, name):
    cols = load_table(spark, sf_dir, name).columns
    assert cols == EXPECTED_COLUMNS[name], (
        f"{name} fixture columns changed: {cols}; audit every oracle "
        "touching this table before trusting driver greens"
    )
    assert table_row_count(sf_dir, name) > 0


@pytest.mark.parametrize("layout", ["ntz_us", "nanos_long", "timestamp"])
def test_normalize_event_ts_handles_every_shipped_layout(spark, layout):
    base = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    epoch_us = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    if layout == "ntz_us":
        df = spark.createDataFrame(
            [(base,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
        )
    elif layout == "nanos_long":
        df = spark.range(1).select((F.lit(epoch_us) * 1000).alias("ts"))
    else:
        df = spark.sql(f"SELECT timestamp_micros({epoch_us}) AS ts")
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.first()["ts"] == base
