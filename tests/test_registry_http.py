"""Loopback HTTP Schema Registry: the reference's register -> compat ->
fetch loop (kafka_publisher.py:101-141) over a REAL wire (127.0.0.1
stdlib http.server + urllib client). Pointing RegistryClient at a live
Confluent deployment is a base-URL change — the decision logic and the
transport are both exercised here."""

import pytest

from pyspark.sql import types as T

from iceberg_kafka_playgroud_spark.functions.registry_http import (
    RegistryClient,
    serve,
)


@pytest.fixture()
def client():
    base_url, server = serve()
    try:
        yield RegistryClient(base_url)
    finally:
        server.shutdown()
        server.server_close()


V1 = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("ts", T.LongType(), False),
    ]
)
# BACKWARD-ok evolution: adds a nullable field
V2 = T.StructType(V1.fields + [T.StructField("channel", T.StringType(), True)])
# BACKWARD violation: adds a NON-nullable field
BAD = T.StructType(V1.fields + [T.StructField("must", T.LongType(), False)])


def test_register_reuse_evolve_and_reject(client):
    assert client.subjects() == []
    v = client.register("purchase-value", V1)
    assert v == 1
    # register-or-reuse: identical schema returns the same version
    assert client.register("purchase-value", V1) == 1
    assert client.subjects() == ["purchase-value"]

    ok, msgs = client.test_compatibility("purchase-value", V2)
    assert ok and msgs == []
    bad_ok, bad_msgs = client.test_compatibility("purchase-value", BAD)
    assert not bad_ok and any("must" in m for m in bad_msgs)

    assert client.register("purchase-value", V2) == 2
    version, latest = client.latest("purchase-value")
    assert version == 2 and latest == V2

    with pytest.raises(ValueError, match="must"):
        client.register("purchase-value", BAD)


def test_unknown_subject_404(client):
    with pytest.raises(KeyError):
        client.latest("nope")


def test_schema_gated_streaming_ingest(client, spark, sf_dir, tmp_path):
    """The reference checks schema compatibility against the registry
    BEFORE producing (kafka_publisher.py:150-169); the Spark analog
    gates each foreachBatch commit on a live registry call. Three
    micro-batches, each consulting the loopback registry over HTTP;
    an incompatible evolution must abort the commit path."""
    import os

    from iceberg_kafka_playgroud_spark.schema import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").limit(300).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    client.register("events-value", schema)

    out = str(tmp_path / "out")
    consulted = []

    def sink(df, batch_id):
        ok, msgs = client.test_compatibility("events-value", df.schema)
        consulted.append(bool(ok))
        if not ok:
            raise RuntimeError(f"schema gate rejected batch: {msgs}")
        df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert consulted == [True, True, True]
    n_out = len([d for d in os.listdir(out) if d.startswith("batch=")])
    assert n_out == 3

    # an incompatible reader schema is refused by the same gate
    from pyspark.sql import types as T

    bad = T.StructType(
        schema.fields + [T.StructField("required_new", T.LongType(), False)]
    )
    ok, msgs = client.test_compatibility("events-value", bad)
    assert not ok and any("required_new" in m for m in msgs)


def test_reregister_older_version_returns_its_id(client):
    """Register-or-reuse must apply to ANY existing version, not just
    the latest: re-registering V1 after V2 exists hands back id 1
    (Confluent semantics), never a 409."""
    client.register("s", V1)
    client.register("s", V2)
    assert client.register("s", V1) == 1
