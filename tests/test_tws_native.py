"""Spark 4 transformWithStateInPandas (the modern arbitrary-stateful
streaming API, successor to applyInPandasWithState).

The TWS Python runner needs a working `google.protobuf` — absent in
this sandbox (ImportError: cannot import name 'descriptor'), so the
test is gated the same way as the native-Iceberg test: it SKIPS when
the dependency is missing and proves the processor against the batch
equivalent when it is present. The applyInPandasWithState twin of the
same computation (stream_stateful_user_totals) runs ungated in the
main registry.
"""

import pytest

from pyspark.sql import functions as F


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf unavailable — TWS Python runner cannot start",
)
def test_transform_with_state_running_totals(spark, sf_dir):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    from iceberg_kafka_playgroud_spark.schema import load_table
    from iceberg_kafka_playgroud_spark.streaming.ingest import (
        _run_to_memory,
        events_file_stream,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.total = handle.getValueState(
                "total", StructType([StructField("cents", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            cents = 0
            for pdf in rows:
                cents += int(pdf["cents"].sum())
            prev = self.total.get()
            new = (prev[0] if prev else 0) + cents
            self.total.update((new,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total_cents": [new]}
            )

        def close(self) -> None:
            pass

    stream = events_file_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    inp = stream.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    res = inp.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotal(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    got = (
        _run_to_memory(res, "update")
        .groupBy("user_id")
        .agg(F.max("total_cents").alias("total_cents"))
    )
    expected = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents")
        )
    )
    assert sorted(got.collect()) == sorted(expected.collect())
